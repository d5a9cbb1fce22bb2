"""create_table_function / get_adapter / register_function parity
(reference datastore/table_functions.py:1197-1260, adapters.py:53-330,
function_registry.py:212) plus the module-level pandas-API tail."""

from __future__ import annotations

import pytest

import chdb_spark.datastore as ds
from chdb_spark.exceptions import DataStoreError


def test_table_function_to_sql_shapes():
    cases = [
        (("file",), {"path": "d.csv", "format": "CSV"}, "file('d.csv', 'CSV')"),
        (("url",), {"url": "http://h/x.json", "format": "JSONEachRow"},
         "url('http://h/x.json', 'JSONEachRow')"),
        (("s3",), {"url": "s3://b/k", "access_key_id": "a",
                   "secret_access_key": "s", "format": "Parquet"},
         "s3('s3://b/k', 'a', 's', 'Parquet')"),
        (("mysql",), {"host": "h:3306", "database": "d", "table": "t",
                      "user": "u", "password": "p"},
         "mysql('h:3306', 'd', 't', 'u', 'p')"),
        (("remote",), {"host": "h", "database": "d", "table": "t",
                       "user": "u", "password": "p"},
         "remote('h', 'd', 't', 'u', 'p')"),
        (("remotesecure",), {"host": "h", "database": "d", "table": "t",
                             "user": "u", "password": "p"},
         "remoteSecure('h', 'd', 't', 'u', 'p')"),
        (("numbers",), {"count": 7}, "numbers(7)"),
        (("sqlite",), {"database": "f.db", "table": "t"},
         "sqlite('f.db', 't')"),
    ]
    for (kind,), params, want in cases:
        assert ds.create_table_function(kind, **params).to_sql() == want
    with pytest.raises(DataStoreError):
        ds.create_table_function("carrier-pigeon", path="x")


def test_table_function_read_file_and_numbers(spark, tmp_path):
    import pandas as pd

    p = tmp_path / "t.csv"
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_csv(p, index=False)
    # CH convention: CSVWithNames reads the header; bare CSV is headerless
    tf = ds.create_table_function("file", path=str(p), format="CSVWithNames")
    out = tf.read(spark)
    assert out.count() == 2 and set(out.columns) == {"a", "b"}
    raw = tmp_path / "r.csv"
    raw.write_text("1,x\n2,y\n")
    headerless = ds.create_table_function("file", path=str(raw), format="CSV")
    assert headerless.read(spark).count() == 2
    assert ds.create_table_function("numbers", count=5).read(spark).count() == 5


def test_table_function_sql_text_executes_through_dialect(spark, tmp_path):
    """to_sql() output is the same text the CH-dialect layer accepts."""
    import pandas as pd

    from chdb_spark import session as chs

    p = tmp_path / "t.parquet"
    pd.DataFrame({"a": [1, 2, 3]}).to_parquet(p)
    tf = ds.create_table_function("file", path=str(p), format="Parquet")
    res = chs.query(spark, f"SELECT count(*) AS n FROM {tf.to_sql()}", "Pandas")
    assert int(res["n"][0]) == 3


def test_get_adapter_sql_and_fake_listing():
    ad = ds.get_adapter("postgres", host="h:5432", user="u")
    assert ad.get_table_function_name() == "postgresql"
    assert "pg_database" in ad.list_databases_sql()

    # ClickHouse adapter executes through an injected http factory
    def http_factory():
        def post(sql: str) -> bytes:
            if sql.startswith("SHOW DATABASES"):
                return b"default\nsystem"
            if sql.startswith("SHOW TABLES"):
                return b"t1\nt2"
            raise AssertionError(sql)

        return post

    ch = ds.get_adapter("clickhouse", host="h:8123", http_factory=http_factory)
    assert ch.list_databases() == ["default", "system"]
    assert ch.list_tables("default") == ["t1", "t2"]
    assert ds.get_adapter("remotesecure", host="h").kwargs["secure"] is True
    with pytest.raises(DataStoreError):
        ds.get_adapter("redis", host="h")


def test_register_function_reference_signature(spark):
    from chdb_spark.functions.registry import get, register_function

    @register_function(name="triple_it", clickhouse_name="tripleIt",
                       aliases=["x3"], category="MATH")
    def _build(c):
        return c * 3

    assert get("triple_it") is _build and get("tripleIt") is _build
    from pyspark.sql import functions as F

    row = spark.range(1).select(get("x3")(F.lit(4)).alias("v")).first()
    assert row.v == 12


def test_function_config_ledger():
    from chdb_spark.functions.registry import (
        function_config,
        reset_function_config,
    )

    reset_function_config()
    assert function_config.get_engine("upper") == "spark"
    function_config.use_pandas("upper", "lower")
    assert function_config.get_engine("upper") == "pandas"
    function_config.prefer_pandas()
    assert function_config.get_engine("anything") == "pandas"
    reset_function_config()
    assert function_config.get_engine("upper") == "spark"


def test_module_level_pandas_tail(tmp_path):
    import pandas as pd

    from chdb_spark import pandas_api as papi

    # read_pickle round-trip (driver-side delegation)
    pdf = pd.DataFrame({"a": [1, 2]})
    p = tmp_path / "f.pkl"
    pdf.to_pickle(p)
    assert papi.read_pickle(str(p)).to_df()["a"].tolist() == [1, 2]
    # options passthrough
    papi.set_option("display.max_rows", 7)
    assert papi.get_option("display.max_rows") == 7
    papi.reset_option("display.max_rows")
    # wide_to_long keeps data (index folded back into columns)
    wide = pd.DataFrame({"id": [1, 2], "v1": [10, 20], "v2": [30, 40]})
    long = papi.wide_to_long(wide, ["v"], i="id", j="k").to_df()
    assert len(long) == 4 and {"id", "k", "v"} <= set(long.columns)
    # misc passthroughs
    assert len(papi.interval_range(start=0, end=4)) == 4
    assert papi.array([1, 2]).tolist() == [1, 2]


def test_datastore_source_form_reference_examples(spark, tmp_path):
    """reference examples/example_table_functions.py: DataStore('file',
    path=..., format=...) is a READABLE lazy source with
    with_format_settings/connect/execute, while staying a write target
    for insert_into/select_from."""
    csv = tmp_path / "sales.csv"
    csv.write_text("product,revenue\nLaptop,1200\nMouse,25\nMonitor,5100\n")
    d = ds.DataStore("file", path=str(csv), format="CSVWithNames")
    d = d.with_format_settings(
        format_csv_delimiter=",", input_format_csv_trim_whitespaces=1
    )
    out = d.select("*").filter("revenue > 1000").limit(10).to_dict()
    assert set(out["product"].values()) == {"Laptop", "Monitor"}
    res = d.select("product", "revenue").filter("revenue > 5000").execute()
    assert res.rows == [("Monitor", 5100)] and res.row_count == 1
    assert d.connect() is d
    # delimiter setting maps onto the reader
    psv = tmp_path / "p.csv"
    psv.write_text("a|b\n1|x\n2|y\n")
    d2 = ds.DataStore("file", path=str(psv), format="CSVWithNames")
    d2 = d2.with_format_settings(format_csv_delimiter="|")
    assert d2.columns == ["a", "b"] and d2.count() == 2
    # write-target role unchanged
    t = ds.DataStore("file", path=str(tmp_path / "out.parquet"), format="Parquet")
    t.insert_into("product").select_from(d.select("product")).execute()
    assert (tmp_path / "out.parquet").exists()
    import pytest as _pt

    with _pt.raises(ValueError):
        ds.DataStore("carrier-pigeon", path="x")
