"""Mirror tests for the DataStore pandas-compat layer — the reference's
differential strategy (AGENTS.md:77-117: run the same chain on pandas and on
the engine, compare values; order compared only after an explicit sort)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chdb_spark.datastore import DataStore, from_df


@pytest.fixture()
def pdf():
    return pd.DataFrame(
        {
            "a": [1, 2, 3, 4, 5, 6],
            "b": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
            "g": ["x", "y", "x", "y", "x", "y"],
        }
    )


@pytest.fixture()
def ds(spark, pdf):
    return from_df(spark, pdf)


def _sorted_records(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(map(tuple, df[cols].itertuples(index=False, name=None)))


def assert_mirrors(ds_out: DataStore, pd_out: pd.DataFrame):
    got = _sorted_records(ds_out.to_df())
    want = _sorted_records(pd_out.reset_index(drop=True))
    assert got == want


def test_filter_select_chain(ds, pdf):
    assert_mirrors(
        ds.filter(ds["a"] > 2).select("a", "g"),
        pdf[pdf.a > 2][["a", "g"]],
    )


def test_boolean_mask_getitem(ds, pdf):
    assert_mirrors(ds[ds["b"] >= 30.0], pdf[pdf.b >= 30.0])


def test_assign_and_astype(ds, pdf):
    out = ds.assign(c=ds["a"] * 2).astype({"c": "double"})
    expect = pdf.assign(c=(pdf.a * 2).astype(float))
    assert_mirrors(out, expect)


def test_groupby_agg_dict(ds, pdf):
    out = ds.groupby("g").agg({"a": "sum", "b": ["mean", "max"]})
    expect = (
        pdf.groupby("g")
        .agg(a_sum=("a", "sum"), b_mean=("b", "mean"), b_max=("b", "max"))
        .reset_index()
    )
    assert_mirrors(out, expect)


def test_groupby_named_agg_and_size(ds, pdf):
    out = ds.groupby("g").agg(total=("b", "sum"), n=("a", "count"))
    expect = pdf.groupby("g").agg(total=("b", "sum"), n=("a", "count")).reset_index()
    assert_mirrors(out, expect)

    sizes = {r.g: r.size for r in ds.groupby("g").size().collect()}
    assert sizes == dict(pdf.groupby("g").size())


def test_groupby_transform_window(ds, pdf):
    out = ds.groupby("g").transform("sum", "b")
    expect = pdf.assign(b_sum=pdf.groupby("g").b.transform("sum"))
    assert_mirrors(out, expect)


def test_sort_head_slice(ds, pdf):
    out = ds.sort_values("b", ascending=False).head(3)
    expect = pdf.sort_values("b", ascending=False).head(3)
    assert_mirrors(out, expect)

    sliced = ds.sort_values("a")[2:5]
    assert_mirrors(sliced, pdf.sort_values("a")[2:5])


def test_drop_duplicates_keep_first(spark):
    pdf = pd.DataFrame({"k": [1, 1, 2], "v": [5, 9, 7]})
    ds = from_df(spark, pdf)
    out = ds.drop_duplicates(subset=["k"], order_by=["v"])
    expect = pdf.sort_values("v").drop_duplicates(subset=["k"], keep="first")
    assert_mirrors(out, expect)


def test_merge_with_suffixes(spark):
    left = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 3, 4], "v": [200, 300, 400]})
    out = from_df(spark, left).merge(from_df(spark, right), on="k", how="inner")
    expect = left.merge(right, on="k", how="inner", suffixes=("_x", "_y"))
    assert_mirrors(out, expect)


def test_merge_left_on_right_on(spark):
    left = pd.DataFrame({"lk": [1, 2], "v": [10, 20]})
    right = pd.DataFrame({"rk": [2, 3], "w": [200, 300]})
    out = from_df(spark, left).merge(
        from_df(spark, right), left_on="lk", right_on="rk", how="left"
    )
    expect = left.merge(right, left_on="lk", right_on="rk", how="left")
    # pandas keeps NaN for missing w; normalize to None-compatible float
    got = _sorted_records(out.to_df())
    want = _sorted_records(expect)

    def norm(rows):
        return [tuple(None if (isinstance(x, float) and pd.isna(x)) else x for x in r) for r in rows]

    assert norm(got) == norm(want)


def test_union_concat_intersect(ds, pdf):
    u = ds.union(ds)
    assert len(u) == 2 * len(pdf)
    i = ds.intersect(ds)
    assert len(i) == len(pdf)
    e = ds.except_(ds.head(2))
    assert len(e) == len(pdf) - 2


def test_value_counts_and_pivot(ds, pdf):
    vc = ds.value_counts("g")
    expect = pdf.g.value_counts().reset_index()
    expect.columns = ["g", "count"]
    assert_mirrors(vc, expect)

    pt = ds.pivot_table(index="g", columns="a", values="b", aggfunc="sum")
    assert len(pt) == 2


def test_melt_explode(spark):
    pdf = pd.DataFrame({"id": [1, 2], "x": [10, 20], "y": [100, 200]})
    out = from_df(spark, pdf).melt(["id"], ["x", "y"])
    expect = pdf.melt(id_vars=["id"], value_vars=["x", "y"])
    assert_mirrors(out, expect)

    pdf2 = pd.DataFrame({"id": [1], "arr": [[1, 2, 3]]})
    ex = from_df(spark, pdf2).explode("arr")
    assert len(ex) == 3


def test_case_when_builder(ds, pdf):
    out = ds.assign(
        bucket=ds.when(F.col("a") <= 2, "lo").when(F.col("a") <= 4, "mid").else_("hi")
    )
    expect = pdf.assign(
        bucket=pdf.a.map(lambda a: "lo" if a <= 2 else ("mid" if a <= 4 else "hi"))
    )
    assert_mirrors(out, expect)


def test_fillna_dropna_replace(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": ["x", None, "z"]})
    ds = from_df(spark, pdf)
    assert len(ds.dropna()) == 2  # only the all-null middle row drops
    filled = ds.fillna(0.0, subset=["a"]).to_df()
    assert filled.a.tolist() == [1.0, 0.0, 3.0]
    rep = ds.replace("x", "xx", subset=["b"]).to_df()
    assert "xx" in rep.b.tolist()


def test_sql_passthrough(ds):
    out = ds.sql("SELECT g, sum(a) AS s FROM __ds__ GROUP BY g")
    got = {r.g: r.s for r in out.collect()}
    assert got == {"x": 9, "y": 12}


def test_query_string(ds, pdf):
    assert_mirrors(ds.query("a > 2 and b < 60"), pdf.query("a > 2 and b < 60"))


def test_merge_asof_through_datastore(spark):
    left = pd.DataFrame(
        {"uid": [1, 1], "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00"])}
    )
    right = pd.DataFrame(
        {"uid": [1], "ts": pd.to_datetime(["2024-01-01 09:00"]), "px": [5.0]}
    )
    out = from_df(spark, left).merge_asof(from_df(spark, right), on="ts", by="uid")
    assert all(r.asof_px == 5.0 for r in out.collect())
