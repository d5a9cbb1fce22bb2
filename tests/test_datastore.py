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


# ---------------------------------------------------------------------------
# batch-3 ordered / time-series surface (explicit order_by contract)
# ---------------------------------------------------------------------------


@pytest.fixture()
def tpdf():
    return pd.DataFrame(
        {
            "t": pd.to_datetime(
                ["2024-01-01 00:05", "2024-01-01 00:20", "2024-01-01 01:10",
                 "2024-01-01 01:40", "2024-01-01 02:30", "2024-01-01 02:45"]
            ),
            "v": [1.0, 3.0, 2.0, 8.0, 5.0, 4.0],
            "g": ["x", "x", "x", "y", "y", "y"],
            "i": [1, 2, 3, 4, 5, 6],
        }
    )


def test_shift_diff_pct_change(spark, tpdf):
    ds = from_df(spark, tpdf)
    got = ds.shift("v", 1, order_by="i").to_df().sort_values("i")
    want = tpdf.assign(v_shift=tpdf["v"].shift(1))
    assert got["v_shift"].fillna(-1).tolist() == want["v_shift"].fillna(-1).tolist()

    got = ds.diff("v", order_by="i").to_df().sort_values("i")
    want_d = tpdf["v"].diff()
    assert got["v_diff"].fillna(-1).tolist() == want_d.fillna(-1).tolist()

    got = ds.pct_change("v", order_by="i").to_df().sort_values("i")
    want_p = tpdf["v"].pct_change()
    assert got["v_pct_change"].fillna(-1).round(6).tolist() == want_p.fillna(-1).round(6).tolist()


def test_cumulative_and_rank(spark, tpdf):
    ds = from_df(spark, tpdf)
    got = ds.cumsum("v", order_by="i").to_df().sort_values("i")
    assert got["v_cumsum"].tolist() == tpdf["v"].cumsum().tolist()
    got = ds.cummax("v", order_by="i", partition_by=["g"]).to_df().sort_values("i")
    assert got["v_cummax"].tolist() == tpdf.groupby("g")["v"].cummax().tolist()
    got = ds.rank("v", pct=False).to_df().sort_values("i")
    assert got["v_rank"].tolist() == tpdf["v"].rank(method="min").astype(int).tolist()


def test_rolling_expanding(spark, tpdf):
    ds = from_df(spark, tpdf)
    got = ds.rolling(2, "v", "mean", order_by="i").to_df().sort_values("i")
    want = tpdf["v"].rolling(2).mean()
    assert got["v_rolling_mean"].fillna(-1).tolist() == want.fillna(-1).tolist()

    got = ds.rolling(3, "v", "sum", order_by="i", min_periods=1).to_df().sort_values("i")
    want = tpdf["v"].rolling(3, min_periods=1).sum()
    assert got["v_rolling_sum"].tolist() == want.tolist()

    got = ds.expanding("v", "sum", order_by="i").to_df().sort_values("i")
    assert got["v_expanding_sum"].tolist() == tpdf["v"].expanding().sum().tolist()


def test_ewm_matches_pandas(spark, tpdf):
    ds = from_df(spark, tpdf)
    got = ds.ewm("v", alpha=0.5, order_by="i").to_df().sort_values("i")
    want = tpdf["v"].ewm(alpha=0.5, adjust=True).mean()
    assert got["v_ewm"].round(9).tolist() == want.round(9).tolist()


def test_resample_hourly(spark, tpdf):
    ds = from_df(spark, tpdf)
    got = ds.resample("t", "1 hour", {"v": "sum"}).to_df().sort_values("t").reset_index(drop=True)
    want = tpdf.resample("1h", on="t")["v"].sum().reset_index(name="v_sum")
    assert got["v_sum"].tolist() == want["v_sum"].tolist()


def test_interpolate_linear_and_ffill(spark):
    pdf = pd.DataFrame({"i": [1, 2, 3, 4, 5, 6], "v": [1.0, None, None, 7.0, None, 10.0]})
    ds = from_df(spark, pdf)
    got = ds.interpolate("v", order_by="i", method="linear").to_df().sort_values("i")
    want = pdf["v"].interpolate(method="linear")
    assert got["v"].round(9).tolist() == want.round(9).tolist()

    got = ds.interpolate("v", order_by="i", method="ffill").to_df().sort_values("i")
    want = pdf["v"].ffill()
    assert got["v"].fillna(-1).tolist() == want.fillna(-1).tolist()


def test_duplicated_flags(spark):
    pdf = pd.DataFrame({"k": ["a", "a", "b", "b", "b", "c"], "i": [1, 2, 3, 4, 5, 6]})
    ds = from_df(spark, pdf)
    got = ds.duplicated(subset=["k"], order_by="i").to_df().sort_values("i")
    assert got["duplicated"].tolist() == pdf.duplicated(subset=["k"]).tolist()
    got = ds.duplicated(subset=["k"], keep="last", order_by="i").to_df().sort_values("i")
    assert got["duplicated"].tolist() == pdf.duplicated(subset=["k"], keep="last").tolist()
    got = ds.duplicated(subset=["k"], keep=False, order_by="i").to_df().sort_values("i")
    assert got["duplicated"].tolist() == pdf.duplicated(subset=["k"], keep=False).tolist()


def test_groupby_filter(spark, tpdf):
    ds = from_df(spark, tpdf)
    got = ds.groupby("g").filter("sum", "v", lambda s: s > 10).to_df()
    want = tpdf.groupby("g").filter(lambda d: d["v"].sum() > 10)
    assert sorted(got["i"].tolist()) == sorted(want["i"].tolist())


def test_factorize_matches_pandas_codes(spark):
    pdf = pd.DataFrame({"k": ["b", "a", "c", "a", "b"], "i": [1, 2, 3, 4, 5]})
    ds = from_df(spark, pdf)
    got = ds.factorize("k").to_df().sort_values("i")
    # our codes are sorted-order dense codes; same equivalence classes as
    # pandas factorize, deterministic mapping a->0 b->1 c->2
    assert got["k_code"].tolist() == [1, 0, 2, 0, 1]


def test_unstack_long_to_wide(spark):
    pdf = pd.DataFrame(
        {"g": ["x", "x", "y", "y"], "k": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]}
    )
    ds = from_df(spark, pdf)
    got = ds.unstack("g", "k", "v", "sum").to_df().sort_values("g").reset_index(drop=True)
    assert got["a"].tolist() == [1, 3] and got["b"].tolist() == [2, 4]


def test_transpose_small_frame(spark):
    pdf = pd.DataFrame({"a": [1, 2], "b": [3, 4]})
    ds = from_df(spark, pdf)
    t = ds.transpose()
    assert list(t.index) == ["a", "b"]


def test_merge_ordered_ffill(spark):
    left = from_df(spark, pd.DataFrame({"k": [1, 3, 5], "l": [10.0, 30.0, 50.0]}))
    right = from_df(spark, pd.DataFrame({"k": [2, 3, 6], "r": [0.2, 0.3, 0.6]}))
    got = (
        left.merge_ordered(right, on="k", fill_method="ffill")
        .to_df()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3, 5, 6]
    assert got["l"].tolist() == [10.0, 10.0, 30.0, 50.0, 50.0]
    assert got["r"].fillna(-1).tolist() == [-1.0, 0.2, 0.3, 0.3, 0.6]


def test_insert_into_select_from_pattern(spark, tmp_path):
    """Reference writing pattern (api-reference.md:260-268):
    target.insert_into(cols).select_from(source.filter(...)).execute()."""
    import pandas as pd

    from chdb_spark.datastore import DataStore, from_df

    src = from_df(
        spark,
        pd.DataFrame({"col1": [1, 2, 3], "col2": ["a", "b", "c"], "value": [50, 150, 250]}),
    )
    out = str(tmp_path / "output.parquet")
    target = DataStore("file", path=out, format="Parquet")
    target.insert_into("col1", "col2").select_from(
        src.select("col1", "col2", "value").filter(src["value"] > 100)
    ).execute()
    back = spark.read.parquet(out)
    assert sorted(r.col1 for r in back.collect()) == [2, 3]
    assert back.columns == ["col1", "col2"]

    # misuse errors
    with pytest.raises(ValueError):
        src.insert_into("col1")
    with pytest.raises(ValueError):
        DataStore("file", path=out).insert_into("c").execute()
    with pytest.raises(ValueError):
        DataStore("socket", path=out)


def test_config_shim_and_classmethod_factories(spark, tmp_path):
    from chdb_spark import config
    from chdb_spark.datastore import DataStore

    config.use_chdb(); assert config.engine_mode == "sql"
    config.prefer_pandas(); assert config.engine_mode == "prefer_pandas"
    config.enable_debug(); assert config.debug is True
    config.disable_debug()

    import pandas as pd

    p = str(tmp_path / "f.parquet")
    pd.DataFrame({"a": [1]}).to_parquet(p)
    ds = DataStore.from_file(p, spark=spark)
    assert ds.to_df()["a"].iloc[0] == 1
    # JDBC factory reaches the JDBC reader (driver absent -> its clear error)
    with pytest.raises(Exception) as ei:
        DataStore.from_mysql("h:3306", "db", "t", spark=spark).to_df()
    assert "jdbc" in str(ei.value).lower() or "driver" in str(ei.value).lower()


def test_connector_factory_family(spark, tmp_path):
    """Every DataStore.from_* form in the reference's connectors.md resolves
    to the right reader; in-container-runnable ones run end-to-end."""
    import pandas as pd

    from chdb_spark.datastore import DataStore

    # numbers / random: generator sources
    assert DataStore.from_numbers(5, spark=spark).to_df().shape[0] == 5
    r = DataStore.from_random({"x": "Float64", "n": "UInt32"}, 7, spark=spark).to_df()
    assert r.shape == (7, 2)

    # sqlite e2e
    import sqlite3

    db = str(tmp_path / "c.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (a INTEGER)")
    con.execute("INSERT INTO t VALUES (9)")
    con.commit(); con.close()
    assert DataStore.from_sqlite(db, "t", spark=spark).to_df()["a"].iloc[0] == 9

    # uri dispatch on a local file
    p = str(tmp_path / "u.parquet")
    pd.DataFrame({"a": [4]}).to_parquet(p)
    assert DataStore.uri(p, spark=spark).to_df()["a"].iloc[0] == 4
    assert DataStore.from_hdfs(f"file://{p}", spark=spark).to_df()["a"].iloc[0] == 4

    # gated connectors reach their reader (clear reader errors, not AttributeError)
    for ctor in (
        lambda: DataStore.from_clickhouse("ch:9000", "logs", "t", spark=spark).to_df(),
        lambda: DataStore.from_delta(str(tmp_path / "nope"), spark=spark),
    ):
        try:
            ctor()
            raise AssertionError("expected a reader error")
        except AssertionError:
            raise
        except Exception:
            pass  # jar/server-gated: any reader-level failure is the contract


def test_reference_limitations_resolved_here(spark):
    """The reference's limitations tracker
    (datastore/tests/test_chdb_limitations_tracker.py) documents engine
    edge cases — categorical/timedelta ingestion, Nullable-Int64
    comparisons, UTF-8 content. All four just work on the Arrow ingest
    path here; this test pins that they stay working."""
    import pandas as pd

    from chdb_spark.datastore import DataStore

    assert DataStore(
        pd.DataFrame({"c": pd.Categorical(["a", "b", "a"])})
    ).to_df()["c"].tolist() == ["a", "b", "a"]

    tds = DataStore(
        pd.DataFrame({"td": pd.to_timedelta(["1 days", "2 days"])})
    ).to_df()["td"]
    assert tds.iloc[1] == pd.Timedelta(days=2)

    ds = DataStore(pd.DataFrame({"v": pd.array([1, pd.NA, 3], dtype="Int64")}))
    assert len(ds.filter("v > 1").to_df()) == 1

    assert DataStore(pd.DataFrame({"s": ["café", "汉字"]})).filter(
        "s = 'café'"
    ).to_df()["s"].tolist() == ["café"]


def test_datastore_sql_accepts_ch_dialect(spark):
    import pandas as pd

    from chdb_spark.datastore import from_df

    ds = from_df(spark, pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "x"]}))
    out = ds.sql(
        "SELECT b, uniqExact(a) AS u, countIf(a > 1) AS c "
        "FROM __ds__ GROUP BY b ORDER BY b"
    ).to_df()
    assert out.to_dict("records") == [
        {"b": "x", "u": 2, "c": 1},
        {"b": "y", "u": 1, "c": 1},
    ]
    assert ds.run_sql("SELECT count() AS n FROM __ds__").to_df()["n"].iloc[0] == 3


def test_elementwise_math_mirror_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [-2.0, 3.5, None], "b": [1, -4, 9], "s": ["x", "y", "z"]})
    ds = DataStore(spark.createDataFrame(pdf))
    out = ds.abs().to_df().sort_values("b").reset_index(drop=True)
    exp = pdf.copy()
    exp[["a", "b"]] = exp[["a", "b"]].abs()
    assert out["b"].tolist() == sorted(exp["b"].tolist())
    clipped = ds.clip(lower=0, upper=4).to_df()
    assert set(clipped["b"]) == {0, 1, 4}
    rounded = DataStore(spark.createDataFrame(pd.DataFrame({"x": [1.26, 2.74]}))).round(1)
    assert sorted(r["x"] for r in rounded.collect()) == [1.3, 2.7]


def test_summary_methods_mirror_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1.0, 2.0, 2.0, 4.0], "b": [10.0, 20.0, 20.0, 40.0]})
    ds = DataStore(spark.createDataFrame(pdf))
    assert ds.nunique()["a"] == 3
    assert ds.quantile(0.5)["a"] == pdf["a"].quantile(0.5)
    assert ds.mode()["a"][0] == 2.0
    c = ds.corr()
    assert abs(c.loc["a", "b"] - pdf.corr().loc["a", "b"]) < 1e-9
    cv = ds.cov()
    assert abs(cv.loc["a", "b"] - pdf.cov().loc["a", "b"]) < 1e-9


def test_eval_pipe_apply_index(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1, 2], "b": [10, 20]})
    ds = DataStore(spark.createDataFrame(pdf))
    out = ds.eval("c = a + b")
    assert sorted(r["c"] for r in out.collect()) == [11, 22]
    vals = ds.eval("a + b")
    assert sorted(r[0] for r in vals.collect()) == [11, 22]
    assert ds.pipe(lambda d: d.count()) == 2
    s = ds.apply(lambda col: col.sum())
    assert s["a"] == 3 and s["b"] == 30
    withidx = ds.set_index("a").reset_index()
    assert "a" in withidx.columns
    fresh = ds.reset_index()
    assert fresh.columns[0] == "index"
    assert sorted(r["index"] for r in fresh.collect()) == [0, 1]


def test_frame_reductions_mirror_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0, 10.0], "b": [2.0, 4.0, 6.0, 8.0, 1.0]})
    ds = DataStore(spark.createDataFrame(pdf))
    for name in ["sum", "mean", "std", "var", "median", "skew", "kurt", "prod"]:
        got = getattr(ds, name)()
        exp = getattr(pdf, name)()
        for c in ["a", "b"]:
            assert abs(got[c] - exp[c]) < 1e-9, (name, c, got[c], exp[c])
    assert ds.min()["a"] == 1.0 and ds.max()["b"] == 8.0


def test_bool_and_iteration_and_exports(spark):
    import pandas as pd

    pdf = pd.DataFrame({"f": [True, True, False], "g": [True, True, True]})
    ds = DataStore(spark.createDataFrame(pdf))
    assert ds.all().to_dict() == {"f": False, "g": True}
    assert ds.any().to_dict() == {"f": True, "g": True}

    nums = DataStore(spark.createDataFrame(pd.DataFrame({"x": [1, 2], "y": [3, 4]})))
    rows = list(nums.iterrows())
    assert rows[0][0] == 0 and set(rows[0][1].index) == {"x", "y"}
    tups = list(nums.itertuples())
    assert tups[0].Index == 0 and tups[0].x in (1, 2)
    cols = dict(nums.items())
    assert sorted(cols) == ["x", "y"]
    assert "x,y" in nums.to_csv()
    d = nums.to_dict("list")
    assert sorted(d) == ["x", "y"]
    assert nums.to_numpy().shape == (2, 2)


def test_cumprod_and_sort_index(spark):
    import pandas as pd

    pdf = pd.DataFrame({"i": [0, 1, 2, 3], "v": [2.0, -3.0, 0.0, 4.0]})
    ds = DataStore(spark.createDataFrame(pdf))
    out = {r["i"]: r["v_cumprod"] for r in ds.cumprod("v", order_by="i").collect()}
    exp = pdf.sort_values("i")["v"].cumprod().tolist()
    for i, e in enumerate(exp):
        assert abs(out[i] - e) < 1e-9, (i, out[i], e)
    si = ds.set_index("i").sort_index(ascending=False)
    assert [r["i"] for r in si.collect()] == [3, 2, 1, 0]
    one = DataStore(spark.createDataFrame(pd.DataFrame({"x": [7, 8]})))
    assert list(one.squeeze()) == [7, 8]


def test_pandas_compat_sinks(spark, tmp_path):
    """to_feather/to_html round-trip; to_markdown/to_excel are engine-gated
    exactly like pandas (reference pandas_compat.py:2019-2173)."""
    import pandas as pd

    ds = DataStore(
        spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    )
    # feather: pyarrow-backed, real round-trip
    fp = str(tmp_path / "out.feather")
    ds.to_feather(fp)
    back = pd.read_feather(fp)
    assert back.sort_values("a").a.tolist() == [1, 2, 3]
    assert back.b.tolist()[0] in ("x", "y", "z")
    # html: string render contains cells
    html = ds.to_html()
    assert "<table" in html and ">x<" in html
    buf = str(tmp_path / "t.html")
    ds.to_html(buf)
    assert "<table" in open(buf).read()
    # markdown / excel: need tabulate / openpyxl — same gate as pandas
    try:
        import tabulate  # noqa: F401

        assert "| a" in ds.to_markdown() or "a |" in ds.to_markdown()
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(ImportError):
            ds.to_markdown()
    try:
        import openpyxl  # noqa: F401

        xp = str(tmp_path / "o.xlsx")
        ds.to_excel(xp)
        assert pd.read_excel(xp).a.tolist() == [1, 2, 3]
    except ImportError:
        import pytest as _pytest

        with _pytest.raises((ImportError, ModuleNotFoundError)):
            ds.to_excel(str(tmp_path / "o.xlsx"))


def test_pandas_compat_delegation_tail(spark):
    """The reference implements its pandas-compat tail by materializing and
    delegating (pandas_compat.py:2513 add, :2782 ffill, :588 iloc...);
    pandas_compat_ext mirrors that. Spot-check every category against
    pandas ground truth on the same frame."""
    import pandas as pd
    from pandas.testing import assert_frame_equal

    from chdb_spark.datastore import DataStore

    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": [4, 5, 6]})
    ds = DataStore(pdf.copy())

    # arithmetic + comparison (scalar and frame other, DataStore unwrap)
    assert_frame_equal(ds.add(1).to_df(), pdf.add(1))
    assert_frame_equal(ds.radd(1).to_df(), pdf.radd(1))
    assert_frame_equal(ds.mul(2).to_df(), pdf.mul(2))
    assert_frame_equal(ds.le(3).to_df(), pdf.le(3))
    assert_frame_equal(ds.add(ds).to_df(), pdf.add(pdf))
    # missing data
    assert ds.ffill().to_df()["a"].tolist() == [1.0, 1.0, 3.0]
    assert ds.bfill().to_df()["a"].tolist() == [1.0, 3.0, 3.0]
    assert ds.isnull().to_df()["a"].tolist() == [False, True, False]
    # reductions / index ops (Series pass-through, reference _wrap_result)
    assert dict(ds.idxmax()) == {"a": 2, "b": 2}
    assert ds.first_valid_index() == 0
    # label gymnastics
    assert ds.take([2, 0]).to_df()["b"].tolist() == [6, 4]
    assert list(ds.keys()) == ["a", "b"]
    assert ds.get("b").tolist() == [4, 5, 6]
    # properties
    assert ds.ndim == 2 and not ds.empty
    assert ds.values.shape == (3, 2)
    assert list(ds.iloc[1])[1] == 5
    # pandas-2-removed members the reference still exposes
    assert len(ds.append(ds).to_df()) == 6
    assert abs(ds.mad()["b"] - pdf["b"].sub(pdf["b"].mean()).abs().mean()) < 1e-12
    assert [k for k, _ in ds.iteritems()] == ["a", "b"]
    # constructors
    assert DataStore.from_dict({"x": [1, 2]}).to_df()["x"].tolist() == [1, 2]
    assert DataStore.from_records([(1, "u")]).to_df().shape == (1, 2)
    # a meaningful result index folds back into columns (SURVEY §1.4 note)
    piv = DataStore(
        pd.DataFrame({"r": ["x", "x", "y"], "c": ["p", "q", "p"], "v": [1, 2, 3]})
    ).pivot(index="r", columns="c", values="v")
    assert "r" in piv.to_df().columns
    # the Spark-style alias is NOT shadowed: where == filter
    assert ds.where("b >= 5").count() == 2


def test_sql_short_form(spark):
    """reference core.py:6628 — .sql() short form auto-expands a bare
    condition/clause fragment to SELECT * FROM __df__ …"""
    from chdb_spark.datastore import DataStore

    d = DataStore({"value": [50, 150, 350], "name": ["c", "b", "a"]})
    assert [tuple(r) for r in d.sql("value > 100 ORDER BY name LIMIT 1").collect()] == [
        (350, "a")
    ]
    assert [r.name for r in d.sql("ORDER BY name").collect()] == ["a", "b", "c"]
    assert d.sql("SELECT count(*) AS n FROM __df__").collect()[0].n == 3
    assert d.sql("SELECT max(value) AS m FROM __ds__").collect()[0].m == 350


def test_insert_into_lakehouse_targets(spark, tmp_path):
    """insert_into/select_from dispatches deltaLake/iceberg target kinds
    to the jar-free writers (appending, CH semantics); file targets keep
    the auto-dispatch sink; unsupported kinds fail loudly."""
    import pytest as _pytest

    from chdb_spark.datastore import DataStore
    from chdb_spark.sources.delta_py import read_delta_py
    from chdb_spark.sources.iceberg_py import read_iceberg_py

    src = DataStore(spark.range(5).selectExpr("id", "id * 3 AS v"))
    dl = str(tmp_path / "dl")
    t = DataStore("deltalake", path=dl)
    t.insert_into("id").select_from(src).execute()
    t.insert_into("id").select_from(src).execute()
    assert read_delta_py(spark, dl).count() == 10

    ic = str(tmp_path / "ic")
    DataStore("iceberg", path=ic).insert_into("id", "v").select_from(src).execute()
    assert {r.v for r in read_iceberg_py(spark, ic).collect()} == {0, 3, 6, 9, 12}

    with _pytest.raises(NotImplementedError, match="runtime jars"):
        DataStore("s3", url="s3://b/k").insert_into("id").select_from(src).execute()


def test_insert_into_url_target(spark):
    """url-kind targets route to write_url (ADVICE r9: the builder lane
    rejected url while the SQL lane's INSERT INTO FUNCTION url(...)
    accepted it — the two INSERT surfaces must agree). Per-partition
    POSTs against a real localhost endpoint."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from chdb_spark.datastore import DataStore

    chunks: list[bytes] = []
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            with lock:
                chunks.append(body)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/ingest"
        src = DataStore(spark.range(6).selectExpr("id AS n"))
        DataStore("url", url=url, format="JSONEachRow").insert_into(
            "n"
        ).select_from(src).execute()
        rows = []
        for body in chunks:
            rows += [_json.loads(ln) for ln in body.decode().splitlines() if ln]
        assert sorted(r["n"] for r in rows) == list(range(6))
    finally:
        srv.shutdown()


def test_insert_into_file_appends(spark, tmp_path):
    """insert_into APPENDS on file targets too (CH INSERT semantics,
    matching the SQL lane) — two batches accumulate instead of the
    second silently erasing the first (r9 review finding)."""
    from chdb_spark.datastore import DataStore

    p = str(tmp_path / "acc")
    src = DataStore(spark.range(3).selectExpr("id"))
    t = DataStore("file", path=p, format="Parquet")
    t.insert_into("id").select_from(src).execute()
    t.insert_into("id").select_from(src).execute()
    assert spark.read.parquet(p).count() == 6


def test_insert_into_ch_format_names_match_sql_lane(spark, tmp_path):
    """insert_into resolves CH format names through the same _TF_FORMATS
    mapping as the SQL lane (ADVICE r10): 'CSVWithNames' writes a header
    row, plain 'CSV' is HEADERLESS — previously the raw name went to the
    Spark writer and failed outright for every CH-specific name."""
    import glob
    import os

    from chdb_spark.datastore import DataStore

    src = DataStore(spark.range(2).selectExpr("id", "id * 2 AS v"))

    def _lines(d):
        out = []
        for fp in glob.glob(os.path.join(d, "part-*")):
            with open(fp) as f:
                out += [ln.strip() for ln in f if ln.strip()]
        return out

    withnames = str(tmp_path / "wn")
    DataStore("file", path=withnames, format="CSVWithNames").insert_into(
        "id", "v"
    ).select_from(src).execute()
    lines = _lines(withnames)
    # every part file carries the header (Spark CSV header-per-file);
    # the data rows ride alongside
    assert "id,v" in lines
    assert sorted(ln for ln in lines if ln != "id,v") == ["0,0", "1,2"]

    headerless = str(tmp_path / "hl")
    DataStore("file", path=headerless, format="CSV").insert_into(
        "id", "v"
    ).select_from(src).execute()
    lines = _lines(headerless)
    assert "id,v" not in lines and sorted(lines) == ["0,0", "1,2"]


def test_to_iceberg_bare_identifier_not_hijacked_by_cwd_dir(spark, tmp_path, monkeypatch):
    """A bare catalog identifier must route to the connector even when a
    same-named directory exists in the driver's cwd (r9 review finding);
    only explicit path-likes take the jar-free writer."""
    import os

    from chdb_spark.datastore import DataStore

    monkeypatch.chdir(tmp_path)
    os.makedirs("sales", exist_ok=True)
    ds = DataStore(spark.range(2).selectExpr("id"))
    with pytest.raises(Exception):  # no iceberg catalog in this env
        ds.to_iceberg("sales")
    assert not os.path.isdir(os.path.join("sales", "metadata"))
    # explicit relative path still takes the jar-free writer
    ds.to_iceberg(os.path.join(".", "sales"))
    assert os.path.isdir(os.path.join("sales", "metadata"))
