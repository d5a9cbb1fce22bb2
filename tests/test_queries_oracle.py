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
    by the r5 directive to ROTATE: every query the driver has never
    checked must come BEFORE every already-checked one, so each round's
    sample drains the unchecked backlog; within each tier the order stays
    family-interleaved. With no history files (fresh clone) tier 1 is
    everything, which degenerates to the old spans-every-family shape."""
    from chdb_spark.queries import _driver_check_history, _family

    names = list(_QUERIES)
    history = _driver_check_history()
    if not history:
        assert set(map(_family, names[:50])) == set(map(_family, names))
        return
    seen_checked = False
    for n in names:
        if n in history:
            seen_checked = True
        else:
            assert not seen_checked, (
                f"never-checked query {n} ordered after an already-checked one"
            )
    never = [n for n in names if n not in history]
    # the prefix must be pure backlog while a backlog remains
    k = min(50, len(never))
    assert all(n not in history for n in names[:k])


def test_every_query_runs_at_smoke_sf(spark):
    """rows-only smoke for queries without an oracle (non-SQL-expressible)."""
    for name, q in _QUERIES.items():
        if q.oracle is None:
            df = q.spark(spark, "/root/testdata/sf0.001")
            assert df.count() >= 0, name
