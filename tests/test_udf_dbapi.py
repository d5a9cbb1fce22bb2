"""Tests for the UDF surface (SURVEY §2.10) and the DB-API 2.0 driver
(SURVEY §2.11) — mirrors reference examples/udf.py and examples/dbapi.py."""

from __future__ import annotations

import datetime

import pytest

from tests.conftest import SF_CORRECT

from chdb_spark import dbapi
from chdb_spark.session import databases, register_tables, tables, use_database
from chdb_spark.udf import (
    ExceptionHandling,
    NullHandling,
    ch_type_to_spark,
    chdb_udf,
    create_function,
    drop_function,
    load_udf_path,
)


# ---------------------------------------------------------------- UDF types
@pytest.mark.parametrize(
    "ch,spark_t",
    [
        ("String", "string"),
        ("UInt64", "decimal(20,0)"),
        ("UInt32", "bigint"),
        ("Int8", "tinyint"),
        ("Float64", "double"),
        ("Decimal(10,2)", "decimal(10,2)"),
        ("Decimal64(4)", "decimal(18,4)"),
        ("Array(String)", "array<string>"),
        ("Array(Nullable(Int32))", "array<int>"),
        ("Map(String, UInt8)", "map<string,smallint>"),
        ("Nullable(Float32)", "float"),
        ("DateTime64(3)", "timestamp"),
        ("FixedString(16)", "string"),
        ("LowCardinality(String)", "string"),
        ("Bool", "boolean"),
    ],
)
def test_ch_type_mapping(ch, spark_t):
    assert ch_type_to_spark(ch) == spark_t


def test_ch_type_unknown_raises():
    with pytest.raises(ValueError):
        ch_type_to_spark("AggregateFunction(sum, UInt64)")


# ------------------------------------------------------------- UDF behavior
def test_udf_local_call_and_sql(spark):
    # Mirrors reference examples/udf.py: sum_udf(12, 22) == 34.
    @chdb_udf()
    def sum_udf_t(lhs, rhs):
        return int(lhs) + int(rhs)

    assert sum_udf_t("12", "22") == 34  # local test path (docs/udf.rst)

    create_function(spark, sum_udf_t)
    row = spark.sql("SELECT sum_udf_t(12, 22) AS s").first()
    # default return type is String, like the reference
    assert row.s == "34"
    drop_function(spark, "sum_udf_t")


def test_udf_typed_return_over_table(spark):
    @chdb_udf(return_type="Float64")
    def price_with_tax_t(price, rate):
        return float(price) * (1.0 + float(rate))

    create_function(spark, price_with_tax_t)
    register_tables(spark, SF_CORRECT, tables=("lineitem",))
    df = spark.sql(
        "SELECT price_with_tax_t(l_extendedprice, l_tax) AS p, "
        "       l_extendedprice * (1 + l_tax) AS expect "
        "FROM lineitem LIMIT 50"
    )
    assert df.schema["p"].dataType.typeName() == "double"
    for r in df.collect():
        assert abs(r.p - float(r.expect)) < 1e-6
    drop_function(spark, "price_with_tax_t")


def test_udf_null_propagation_and_exception_null(spark):
    @chdb_udf(return_type="Int64")
    def parse_int_t(s):
        return int(s)

    @chdb_udf(
        return_type="Int64",
        exception_handling=ExceptionHandling.NULL,
        null_handling=NullHandling.CALL,
    )
    def parse_int_soft_t(s):
        return int(s) if s is not None else -1

    create_function(spark, parse_int_t)
    create_function(spark, parse_int_soft_t)

    # NULL propagates without calling the body (default NullHandling).
    row = spark.sql("SELECT parse_int_t(NULL) AS v").first()
    assert row.v is None
    # CALL hands None to the body.
    row = spark.sql("SELECT parse_int_soft_t(NULL) AS v").first()
    assert row.v == -1
    # Bad input: soft variant nulls, strict variant raises.
    row = spark.sql("SELECT parse_int_soft_t('xyz') AS v").first()
    assert row.v is None
    with pytest.raises(Exception):
        spark.sql("SELECT parse_int_t('xyz') AS v").first()
    drop_function(spark, "parse_int_t")
    drop_function(spark, "parse_int_soft_t")


def test_udf_column_api(spark):
    from pyspark.sql import functions as F

    @chdb_udf(return_type="UInt32")
    def strlen_t(s):
        return len(s)

    create_function(spark, strlen_t)
    df = spark.createDataFrame([("abc",), ("de",)], "s string")
    out = df.select(strlen_t.column(F.col("s")).alias("n")).collect()
    assert [r.n for r in out] == [3, 2]
    drop_function(spark, "strlen_t")


def test_load_udf_path(spark, tmp_path):
    (tmp_path / "my_udfs.py").write_text(
        "from chdb_spark.udf import chdb_udf\n"
        "@chdb_udf(return_type='String')\n"
        "def shout_t(s):\n"
        "    return s.upper() + '!'\n"
    )
    names = load_udf_path(spark, str(tmp_path))
    assert "shout_t" in names
    assert spark.sql("SELECT shout_t('hey') AS v").first().v == "HEY!"
    drop_function(spark, "shout_t")


# ------------------------------------------------------------------ DB-API
def test_dbapi_module_attrs():
    assert dbapi.apilevel == "2.0"
    assert dbapi.paramstyle == "format"
    assert dbapi.get_client_info()
    # exception hierarchy per PEP 249
    assert issubclass(dbapi.ProgrammingError, dbapi.DatabaseError)
    assert issubclass(dbapi.DatabaseError, dbapi.Error)
    # type objects compare against type_code strings
    assert "bigint" == dbapi.NUMBER
    assert "timestamp" == dbapi.DATETIME
    assert "string" == dbapi.STRING


def test_dbapi_basic_roundtrip(spark):
    conn = dbapi.connect(spark=spark)
    cur = conn.cursor()
    cur.execute("SELECT version() AS v")  # reference examples/dbapi.py:9
    assert cur.description[0][0] == "v"
    assert cur.fetchone() is not None
    assert cur.fetchone() is None
    cur.close()
    conn.close()
    with pytest.raises(dbapi.InterfaceError):
        conn.cursor()


def test_dbapi_params_fetch_iteration(spark):
    conn = dbapi.connect(sf_dir=SF_CORRECT, spark=spark)
    with conn.cursor() as cur:
        n = cur.execute(
            "SELECT o_orderpriority, count(*) AS c FROM orders "
            "WHERE o_orderdate >= %s GROUP BY o_orderpriority ORDER BY c DESC",
            (datetime.date(1995, 1, 1),),
        )
        assert n == cur.rowcount == len(cur.fetchall())
        cur.execute("SELECT l_orderkey FROM lineitem ORDER BY l_orderkey LIMIT 10")
        first_three = cur.fetchmany(3)
        assert len(first_three) == 3
        rest = list(cur)
        assert len(rest) == 7

    # pyformat-style named params
    with conn.cursor() as cur:
        cur.execute(
            "SELECT count(*) AS c FROM orders WHERE o_orderstatus = %(st)s",
            {"st": "F"},
        )
        assert cur.fetchone()[0] > 0


def test_dbapi_dictcursor_and_stream(spark):
    conn = dbapi.connect(sf_dir=SF_CORRECT, spark=spark, cursorclass=dbapi.DictCursor)
    cur = conn.cursor()
    cur.execute("SELECT r_name FROM region ORDER BY r_name LIMIT 2")
    rows = cur.fetchall()
    assert isinstance(rows[0], dict) and "r_name" in rows[0]
    # constant-memory streaming path
    it = cur.stream("SELECT n_name FROM nation ORDER BY n_name")
    assert len(list(it)) == 25


def test_dbapi_errors(spark):
    conn = dbapi.connect(spark=spark)
    cur = conn.cursor()
    with pytest.raises(dbapi.ProgrammingError):
        cur.fetchone()  # before execute
    with pytest.raises(dbapi.Error):
        cur.execute("SELEKT nonsense")
    with pytest.raises(dbapi.NotSupportedError):
        conn.rollback()


def test_dbapi_escaping():
    assert dbapi.escape_item(None) == "NULL"
    assert dbapi.escape_item(True) == "TRUE"
    assert dbapi.escape_item(3.5) == "3.5"
    assert dbapi.escape_item("o'hara") == "'o\\'hara'"
    assert dbapi.escape_item(datetime.date(2020, 1, 2)) == "DATE '2020-01-02'"
    assert dbapi.escape_item(b"\x01\xff") == "X'01ff'"
    assert dbapi.escape_item([1, 2]) == "ARRAY(1, 2)"


# ------------------------------------------------------------------ catalog
def test_catalog_helpers(spark):
    assert "default" in databases(spark)
    register_tables(spark, SF_CORRECT, tables=("region",))
    assert "region" in tables(spark)
    use_database(spark, "cat_test_db")
    assert spark.catalog.currentDatabase() == "cat_test_db"
    use_database(spark, "default")


def test_chdb_udtf_sql_and_lateral(spark):
    from chdb_spark.udf import chdb_udtf

    @chdb_udtf({"word": "String", "n": "UInt32"})
    class SplitWordsT:
        def eval(self, text: str):
            for w in (text or "").split():
                yield (w, len(w))

    SplitWordsT.register(spark)
    rows = spark.sql("SELECT * FROM split_words_t('a bb ccc')").collect()
    assert [(r.word, r.n) for r in rows] == [("a", 1), ("bb", 2), ("ccc", 3)]
    # lateral join over a table
    spark.createDataFrame([("x y",), ("z",)], "s string").createOrReplaceTempView("udtf_src")
    out = spark.sql(
        "SELECT s, word FROM udtf_src, LATERAL split_words_t(s)"
    ).collect()
    assert len(out) == 3


def test_chdb_udtf_ddl_schema(spark):
    from chdb_spark.udf import chdb_udtf

    @chdb_udtf("v int", name="range_squares_t")
    class RangeSquares:
        def eval(self, n: int):
            for i in range(n):
                yield (i * i,)

    RangeSquares.register(spark)
    rows = spark.sql("SELECT v FROM range_squares_t(4)").collect()
    assert [r.v for r in rows] == [0, 1, 4, 9]


def test_chdb_udaf_grouped_agg(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from chdb_spark.udf import chdb_udaf

    @chdb_udaf(return_type="Float64")
    def geo_mean_t(v):
        arr = v[v > 0]
        return float(np.exp(np.log(arr).mean())) if len(arr) else 0.0

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 4.0), ("b", 9.0)], "k string, v double"
    )
    out = {
        r.k: r.g
        for r in df.groupBy("k").agg(geo_mean_t.column(F.col("v")).alias("g")).collect()
    }
    assert abs(out["a"] - 2.0) < 1e-9 and abs(out["b"] - 9.0) < 1e-9
    # SQL registration path
    geo_mean_t.register(spark)
    df.createOrReplaceTempView("udaf_src")
    rows = spark.sql(
        "SELECT k, geo_mean_t(v) AS g FROM udaf_src GROUP BY k ORDER BY k"
    ).collect()
    assert abs(rows[0].g - 2.0) < 1e-9


def test_cursor_clickhouse_placeholder_params(spark):
    """dict args bind {name:Type} placeholders (typed, injection-safe) in
    addition to the pyformat %(name)s style."""
    from chdb_spark import dbapi

    conn = dbapi.connect(spark=spark)
    cur = conn.cursor()
    cur.execute("SELECT {n:Int64} * 2 AS x, {s:String} AS s", {"n": 21, "s": "o'k"})
    assert cur.fetchone() == (42, "o'k")
    cur.execute("SELECT %(a)s AS a", {"a": 7})  # pyformat still works
    assert cur.fetchone() == (7,)


def test_connection_query_and_session_alias(spark):
    """Reference drop-in shapes: conn.query(sql, fmt) and
    chdb_spark.session.Session(path)."""
    from chdb_spark import dbapi
    from chdb_spark import session as session_mod

    conn = dbapi.connect(spark=spark)
    assert conn.query("SELECT 3 AS x") == "3\n"  # CSV default, like chdb
    assert conn.query("SELECT 3 AS x", "JSONEachRow") == '{"x": 3}\n'

    from chdb_spark.stateful import Session

    assert session_mod.Session is Session


def test_dbapi_accepts_clickhouse_dialect(spark):
    """The reference's own DB-API example (README.md:228): CH SQL through
    the cursor — system.numbers + toString."""
    from chdb_spark import dbapi

    conn = dbapi.connect(spark=spark)
    cur = conn.cursor()
    cur.execute("SELECT number, toString(number) AS str FROM system.numbers LIMIT 3")
    got = cur.fetchall()
    assert [r[0] for r in got] == [0, 1, 2]
    assert [r[1] for r in got] == ["0", "1", "2"]
    cur.execute("SELECT uniqExact(number) AS u FROM numbers(50)")
    assert cur.fetchone()[0] == 50
    cur.close(); conn.close()


def test_connect_reference_shape_memory(spark):
    import chdb_spark as chdb

    conn = chdb.connect(":memory:")
    try:
        assert str(conn.query("SELECT 1 AS x", "CSV")) == "1\n"
        cur = conn.cursor()
        cur.execute("SELECT toString(number) AS s FROM system.numbers LIMIT 3")
        assert cur.fetchall() == [("0",), ("1",), ("2",)]
        chunks = [bytes(c) for c in conn.send_query("SELECT 5 AS v", format="CSV")]
        assert b"".join(chunks) == b"5\n"
    finally:
        conn.close()


def test_connect_reference_shape_file_persists(tmp_path):
    import chdb_spark as chdb

    p = str(tmp_path / "conndb")
    c1 = chdb.connect(p)
    try:
        c1.query("CREATE TABLE ct (a Int64) ENGINE = MergeTree ORDER BY a")
        c1.query("INSERT INTO ct VALUES (7)")
        cur = c1.cursor()
        cur.execute("SELECT a + 1 FROM ct")
        assert cur.fetchall() == [(8,)]
    finally:
        c1.close()
    c2 = chdb.connect(p)
    try:
        assert str(c2.query("SELECT a FROM ct", "CSV")).strip() == "7"
    finally:
        c2.close()


def test_state_module_connect(spark):
    from chdb_spark.state import Connection, connect

    conn = connect(":memory:")
    try:
        assert isinstance(conn, Connection)
        assert str(conn.query("SELECT 3 AS v", "CSV")).strip() == "3"
    finally:
        conn.close()


def test_udf_rst_json_and_math_examples(spark):
    """docs/udf.rst:103-200 — JSON-parsing and math UDF examples verbatim
    (imports inside the body, string in/out contract, typed returns)."""
    import math

    from chdb_spark.udf import chdb_udf, create_function

    @chdb_udf()
    def parse_json_field(json_str, field_path):
        import json

        try:
            data = json.loads(json_str)
            fields = field_path.split(".")
            current = data
            for field in fields:
                if isinstance(current, dict) and field in current:
                    current = current[field]
                else:
                    return ""
            return str(current)
        except Exception:
            return ""

    @chdb_udf(return_type="Float64")
    def haversine_distance(lat1, lon1, lat2, lon2):
        import math

        lat1, lon1, lat2, lon2 = map(
            math.radians, [float(lat1), float(lon1), float(lat2), float(lon2)]
        )
        dlat = lat2 - lat1
        dlon = lon2 - lon1
        a = math.sin(dlat / 2) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin(dlon / 2) ** 2
        return 2 * math.asin(math.sqrt(a)) * 6371

    create_function(spark, parse_json_field)
    create_function(spark, haversine_distance)
    row = spark.sql(
        """
        SELECT parse_json_field('{"user": {"profile": {"name": "Ada"}}}',
                                'user.profile.name') AS name,
               haversine_distance(52.52, 13.405, 48.8566, 2.3522) AS km
        """
    ).first()
    assert row["name"] == "Ada"
    assert abs(float(row["km"]) - 878) < 10  # Berlin→Paris ≈ 878 km
