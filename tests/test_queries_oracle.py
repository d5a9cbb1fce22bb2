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


def test_first_50_sample_covers_every_family():
    """The driver's CORRECTNESS file samples the first 50 dict entries —
    registration order must interleave so that prefix spans every query
    family (VERDICT r4 item 5)."""
    from chdb_spark.queries import _family

    names = list(_QUERIES)
    assert set(map(_family, names[:50])) == set(map(_family, names))


def test_every_query_runs_at_smoke_sf(spark):
    """rows-only smoke for queries without an oracle (non-SQL-expressible)."""
    for name, q in _QUERIES.items():
        if q.oracle is None:
            df = q.spark(spark, "/root/testdata/sf0.001")
            assert df.count() >= 0, name
