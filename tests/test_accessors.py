"""Accessor-namespace tests (SURVEY §2.8; reference datastore/accessors/) —
.str/.dt/.arr/.json/.url/.ip/.geo over real tables, verified by value."""

from __future__ import annotations

import pytest
from pyspark.sql import Column

from chdb_spark.datastore import DataStore, from_file
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def docs(spark):
    return DataStore(spark.read.parquet(f"{SF_CORRECT}/documents.parquet"))


@pytest.fixture(scope="module")
def events(spark):
    from chdb_spark.session import read_table

    return DataStore(read_table(spark, f"{SF_CORRECT}/events.parquet"))


def test_columnexpr_is_a_column(docs):
    c = docs["text"]
    assert isinstance(c, Column)
    # normal Column ops still work on the wrapper
    assert docs.df.select((c.isNotNull()).alias("x")).first().x is True


def test_str_accessor(docs):
    row = (
        docs.df.select(
            docs["lang"].str.upper().alias("u"),
            docs["lang"].str.len().alias("n"),
            docs["text"].str.startswith("a").alias("sw"),
            docs["text"].str.split(" ")[0].alias("first_tok"),
            docs["text"].str[:3].alias("pre"),
        )
        .first()
    )
    assert row.u == row.u.upper() and row.n >= 2
    assert row.pre == row.first_tok[:3] or len(row.pre) == 3


def test_str_slicing_matches_python(spark):
    ds = DataStore(spark.createDataFrame([("abcdefg",)], "s string"))
    out = ds.df.select(
        ds["s"].str[:3].alias("a"),
        ds["s"].str[2:5].alias("b"),
        ds["s"].str[4:].alias("c"),
    ).first()
    assert (out.a, out.b, out.c) == ("abc", "cde", "efg")


def test_dt_accessor_properties(events):
    row = events.df.select(
        events["ts"].dt.year.alias("y"),
        events["ts"].dt.month.alias("m"),
        events["ts"].dt.day.alias("d"),
        events["ts"].dt.hour.alias("h"),
        events["ts"].dt.quarter.alias("q"),
        events["ts"].dt.dayofweek.alias("dow"),
        events["ts"].alias("ts"),
    ).first()
    assert row.y == row.ts.year and row.m == row.ts.month and row.d == row.ts.day
    assert row.h == row.ts.hour and row.q == (row.ts.month - 1) // 3 + 1


def test_dt_strftime(events):
    row = events.df.select(
        events["ts"].dt.strftime("%Y-%m-%d").alias("s"), events["ts"].alias("ts")
    ).first()
    assert row.s == row.ts.strftime("%Y-%m-%d")


def test_arr_accessor(spark):
    ds = DataStore(spark.createDataFrame([([3, 1, 2],)], "a array<int>"))
    row = ds.df.select(
        ds["a"].arr.sum().alias("s"),
        ds["a"].arr.sort().alias("srt"),
        ds["a"].arr.len().alias("n"),
        ds["a"].arr[0].alias("first"),
        ds["a"].arr.contains(2).alias("has2"),
    ).first()
    assert (row.s, list(row.srt), row.n, row.first, row.has2) == (6, [1, 2, 3], 3, 3, True)


def test_json_accessor(events):
    row = events.df.select(
        events["props"].json.extract_int("k").alias("k"),
        events["props"].json.has("k").alias("has"),
        events["props"].json.is_valid().alias("ok"),
    ).first()
    assert row.has and row.ok and isinstance(row.k, int)


def test_url_accessor(spark):
    ds = DataStore(
        spark.createDataFrame(
            [("https://example.com/a/b?x=1&y=2#frag",)], "u string"
        )
    )
    row = ds.df.select(
        ds["u"].url.host().alias("h"),
        ds["u"].url.param("y").alias("y"),
        ds["u"].url.query().alias("q"),
    ).first()
    assert row.h == "example.com" and row.y == "2" and row.q == "x=1&y=2"


def test_ip_accessor(spark):
    ds = DataStore(spark.createDataFrame([(3232235777,)], "n long"))
    row = ds.df.select(ds["n"].ip.to_string().alias("s")).first()
    assert row.s == "192.168.1.1"
    ds2 = DataStore(spark.createDataFrame([("192.168.1.1",)], "s string"))
    row2 = ds2.df.select(
        ds2["s"].ip.to_num().alias("n"), ds2["s"].ip.is_ipv4().alias("ok")
    ).first()
    assert row2.n == 3232235777 and row2.ok


def test_geo_accessor_vectors(spark):
    ds = DataStore(
        spark.createDataFrame(
            [([1.0, 0.0], [0.0, 1.0])], "a array<double>, b array<double>"
        )
    )
    row = ds.df.select(
        ds["a"].geo.dot(ds["b"]).alias("dot"),
        ds["a"].geo.l2_norm().alias("n"),
        ds["a"].geo.cosine_distance(ds["b"]).alias("cd"),
    ).first()
    assert row.dot == 0.0 and row.n == 1.0 and abs(row.cd - 1.0) < 1e-9


def test_unknown_accessor_method_raises(docs):
    with pytest.raises(AttributeError):
        docs["text"].str.definitely_not_a_function()


def test_accessor_chain_in_datastore_pipeline(docs):
    out = (
        docs.assign(up=docs["lang"].str.upper())
        .filter(docs["n_chars"] > 100)
        .groupby("up")
        .agg({"n_chars": "mean"})
    )
    assert out.count() > 0


def test_dt_normalize_tz_and_datastore_utils(spark):
    import pandas as pd

    from chdb_spark.datastore import from_df

    ds = from_df(
        spark,
        pd.DataFrame(
            {"t": pd.to_datetime(["2024-01-02 03:04:05"]), "v": [1.0]}
        ),
    )
    out = ds.assign(
        norm=ds["t"].dt.normalize(),
        loc=ds["t"].dt.tz_localize("America/New_York"),
        conv=ds["t"].dt.tz_convert("America/New_York"),
    ).to_df()
    assert str(out["norm"].iloc[0]) == "2024-01-02 00:00:00"
    assert str(out["loc"].iloc[0]) == "2024-01-02 08:04:05"   # EST -> UTC
    assert str(out["conv"].iloc[0]) == "2024-01-01 22:04:05"  # UTC -> EST

    # to_sql / info / equals
    assert "t#" in ds.to_sql()  # plan text names the columns
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ds.info()
    assert "rows: 1" in buf.getvalue() and "t: timestamp" in buf.getvalue()
    assert ds.equals(ds) is True
    assert ds.equals(ds.assign(v=ds["v"] + 1)) is False
