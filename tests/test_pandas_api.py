"""Module-level pandas API (`from chdb import datastore as pd`) — the
reference's pandas_api.py surface (~40 doc examples alias the module as
``pd``). DataStore inputs stay distributed; plain-Python inputs delegate to
real pandas (the reference's own pandas-executed tier)."""

from __future__ import annotations

import os

import pandas as real_pd
import pytest

from chdb_spark import datastore as pd
from chdb_spark.datastore import DataStore


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("papi") / "t.csv"
    real_pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "x"]}).to_csv(p, index=False)
    return str(p)


def test_read_csv_and_dataframe(spark, csv_path):
    ds = pd.read_csv(csv_path)
    assert isinstance(ds, DataStore)
    assert sorted((r["a"], r["b"]) for r in ds.collect()) == [(1, "x"), (2, "y"), (3, "x")]
    d2 = pd.DataFrame({"a": [9]})
    assert isinstance(d2, DataStore) and d2.collect()[0]["a"] == 9


def test_read_parquet_column_pruning(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    real_pd.DataFrame({"a": [1], "b": [2], "c": [3]}).to_parquet(p)
    ds = pd.read_parquet(p, columns=["a", "c"])
    assert ds.columns == ["a", "c"]


def test_concat_merge_distributed(spark, csv_path):
    ds = pd.read_csv(csv_path)
    out = pd.concat([ds, pd.DataFrame({"a": [4], "b": ["z"]})])
    assert out.count() == 4
    dim = pd.DataFrame({"b": ["x", "y"], "w": [10, 20]})
    m = pd.merge(ds, dim, on="b")
    assert sorted((r["a"], r["w"]) for r in m.collect()) == [(1, 10), (2, 20), (3, 10)]
    with pytest.raises(NotImplementedError):
        pd.concat([ds, dim], axis=1)


def test_null_predicates_both_tiers(spark):
    ds = pd.DataFrame({"a": [1.0, None]})
    flags = pd.isna(ds).collect()
    assert [r["a"] for r in flags] == [False, True]
    inv = pd.notna(ds).collect()
    assert [r["a"] for r in inv] == [True, False]
    assert bool(pd.isna(float("nan"))) is True
    assert pd.isnull is pd.isna and pd.notnull is pd.notna


def test_pandas_tier_helpers():
    assert str(pd.to_datetime("2024-01-02").date()) == "2024-01-02"
    assert list(pd.to_numeric(["1", "2"])) == [1, 2]
    assert len(pd.date_range("2024-01-01", periods=3)) == 3
    assert list(pd.cut([1, 5, 9], bins=[0, 3, 10]).codes) == [0, 1, 1]
    assert list(pd.qcut([1, 2, 3, 4], 2).codes) == [0, 0, 1, 1]
    codes, uniques = pd.factorize(["b", "a", "b"])
    assert list(codes) == [0, 1, 0]
    assert pd.Series([1, 2]).sum() == 3


def test_get_dummies_and_value_counts_distributed(spark, csv_path):
    ds = pd.read_csv(csv_path)
    gd = pd.get_dummies(ds, columns=["b"])
    assert set(gd.columns) == {"a", "b_x", "b_y"}
    row = {r["a"]: (r["b_x"], r["b_y"]) for r in gd.collect()}
    assert row[1] == (1, 0) and row[2] == (0, 1)
    vc = pd.value_counts(ds.select("b")).collect()
    assert [(r["b"], r["count"]) for r in vc] == [("x", 2), ("y", 1)]


def test_read_sql_runs_ch_dialect(spark):
    ds = pd.read_sql("SELECT uniqExact(number) AS u FROM numbers(10)", spark)
    assert ds.collect()[0]["u"] == 10


def test_melt_pivot_delegate(spark):
    ds = pd.DataFrame({"k": ["a", "b"], "x": [1, 2], "y": [3, 4]})
    m = pd.melt(ds, ["k"], ["x", "y"])
    assert m.count() == 4
    pt = pd.pivot_table(ds, values="x", index="k", columns="k", aggfunc="sum")
    assert pt.count() == 2


def test_config_reachable_through_module():
    assert pd.config is not None
    pd.enable_profiling()
    pd.disable_profiling()


def test_profiler_quickstart(spark):
    # docs/PROFILING.md:14-35 quickstart shape
    from chdb_spark.config import disable_profiling, enable_profiling, get_profiler
    from chdb_spark.utils import trace

    enable_profiling()
    trace.enable_trace()
    try:
        pd.read_sql("SELECT 1 AS one", spark)
        profiler = get_profiler()
        rpt = profiler.report()
        assert "1 queries" in rpt and "SELECT 1" in rpt
        profiler.reset()
        assert profiler.records() == []
    finally:
        trace.disable_trace()
        disable_profiling()


def test_compat_mode_toggles():
    from chdb_spark import config as cfg

    assert cfg.is_performance_mode()
    cfg.use_pandas_compat()
    assert cfg.get_compat_mode() == cfg.CompatMode.PANDAS
    cfg.use_performance_mode()
    assert cfg.is_performance_mode()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cfg.set_compat_mode("nope")


def test_exception_and_accessor_exports():
    # reference datastore/__init__.py exposes the exception hierarchy and
    # accessor classes at module level
    assert issubclass(pd.QueryError, pd.DataStoreError)
    assert issubclass(pd.ImmutableError, ValueError)
    assert pd.ColumnNotFoundError and pd.UnsupportedOperationError
    assert pd.StringAccessor and pd.DateTimeAccessor and pd.JsonAccessor


def test_json_normalize_and_crosstab(spark):
    nested = [
        {"user": {"name": "Alice", "meta": {"age": 30}}, "active": True},
        {"user": {"name": "Bob", "meta": {"age": 25}}, "active": False},
    ]
    ds = pd.json_normalize(nested)
    assert set(ds.columns) == {"user.name", "user.meta.age", "active"}
    got = {r["user.name"]: r["user.meta.age"] for r in ds.collect()}
    assert got == {"Alice": 30, "Bob": 25}
    ct = pd.crosstab(["a", "a", "b"], ["x", "y", "x"])
    assert ct.loc["a", "x"] == 1 and ct.loc["a", "y"] == 1
    # ADVICE r4 regression: sep= must thread through to the flattener
    ds2 = pd.json_normalize(nested, sep="_")
    assert set(ds2.columns) == {"user_name", "user_meta_age", "active"}
