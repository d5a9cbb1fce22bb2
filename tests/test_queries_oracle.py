"""Differential tests: every SQL-expressible query in chdb_spark.queries
runs on Spark AND on the DuckDB oracle at sf0.01; results must match on
column names, row count, and order-insensitive value hash — the same gate
the driver applies (mirror-test strategy per SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from chdb_spark.queries import all_queries
from tests.conftest import assert_query_matches_oracle

_QUERIES = all_queries()
_SQL_BACKED = [name for name, q in sorted(_QUERIES.items()) if q.oracle is not None]


@pytest.mark.parametrize("name", _SQL_BACKED)
def test_query_matches_oracle(spark, oracle, name):
    assert_query_matches_oracle(spark, oracle, _QUERIES[name])


def test_driver_sample_rotation_order():
    """The driver's CORRECTNESS file samples the first 50 dict entries.
    r4 invariant (interleave so the prefix spans families) was superseded
    by the r5 directive to ROTATE (never-checked before checked), and r6
    added tier 0: queries whose MOST RECENT driver sample was red come
    before everything — a failed-then-fixed query is the only row the
    brief counts as fail, so its re-verification must not wait behind the
    never-checked backlog. Order: tier 0 (last-sample red) → tier 1
    (never checked) → tier 2 (checked green, least-recent first); each
    tier family-interleaved. With no history files (fresh clone) tier 1
    is everything, degenerating to the spans-every-family shape."""
    from chdb_spark.queries import _driver_check_history, _family

    names = list(_QUERIES)
    history = _driver_check_history()
    if not history:
        assert set(map(_family, names[:50])) == set(map(_family, names))
        return

    def tier(n):
        if n not in history:
            return 1
        return 0 if not history[n][1] else 2

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), (
        "rotation tiers out of order: last-red → never-checked → green"
    )
    # the 50-entry driver prefix must contain every last-red query and
    # spend the remainder on the never-checked backlog (while one remains)
    reds = [n for n in names if tier(n) == 0]
    assert set(reds) <= set(names[:50]), "a failed-then-fixed query missed the sample"
    k = min(50, len(reds) + sum(1 for t in tiers if t == 1))
    assert all(tier(n) <= 1 for n in names[:k])
    # tier 2 is STRICT least-recently-checked (r9: bounded staleness —
    # every green re-verifies within ceil(N/50) rounds; the old family
    # interleave let large families' old members age indefinitely)
    green_rounds = [history[n][0] for n in names if tier(n) == 2]
    assert green_rounds == sorted(green_rounds), (
        "tier-2 greens not in least-recently-checked order"
    )


def test_every_query_runs_at_smoke_sf(spark):
    """rows-only smoke for queries without an oracle (non-SQL-expressible)."""
    for name, q in _QUERIES.items():
        if q.oracle is None:
            df = q.spark(spark, "/root/testdata/sf0.001")
            assert df.count() >= 0, name


def test_table_rows_upper_bound_sources():
    """Footer-statistics helper: exact count for a single parquet file,
    summed footers for a partitioned directory, None for a missing path
    (callers fall back to runtime probes)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chdb_spark.queries import table_rows_upper_bound

    n = table_rows_upper_bound("/root/testdata/sf0.001", "events")
    f = pq.ParquetFile("/root/testdata/sf0.001/events.parquet")
    assert n == f.metadata.num_rows

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sub = os.path.join(d, "t.parquet", "part=a")
        os.makedirs(sub)
        pq.write_table(pa.table({"x": [1, 2, 3]}), os.path.join(sub, "0.parquet"))
        pq.write_table(pa.table({"x": [4]}), os.path.join(sub, "1.parquet"))
        assert table_rows_upper_bound(d, "t") == 4

    assert table_rows_upper_bound("/nonexistent/dir", "t") is None
