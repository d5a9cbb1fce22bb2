"""Output-format strings (chdb_spark.formats) + {key:Type} query params
(chdb_spark.params) — the reference's chdb.query(sql, output_format, params)
surface (reference chdb/__init__.py:145-217)."""

from __future__ import annotations

import datetime
import json

import pytest

from chdb_spark import session as chs
from chdb_spark.formats import FORMAT_ALIASES, format_result, supported_formats
from chdb_spark.params import bind_params
from chdb_spark.stateful import Session


@pytest.fixture(scope="module")
def df(spark):
    return spark.sql(
        "SELECT * FROM VALUES "
        "(1, 'alpha', 1.5, DATE '2024-01-02', TIMESTAMP '2024-01-02 03:04:05', true), "
        "(2, 'be\"ta', 2.0, DATE '2024-02-03', TIMESTAMP '2024-02-03 04:05:06', false), "
        "(3, NULL, CAST(NULL AS DOUBLE), NULL, NULL, NULL) "
        "AS t(id, name, score, d, ts, flag)"
    )


# ---------------------------------------------------------------------------
# text formats
# ---------------------------------------------------------------------------


def test_csv_family(df):
    csv = format_result(df, "CSV")
    lines = csv.splitlines()
    assert lines[0] == '1,"alpha",1.5,"2024-01-02","2024-01-02 03:04:05",true'
    assert '"be""ta"' in lines[1]
    assert lines[2] == "3,\\N,\\N,\\N,\\N,\\N"

    withnames = format_result(df, "CSVWithNames")
    assert withnames.splitlines()[0] == '"id","name","score","d","ts","flag"'
    assert withnames.splitlines()[1:] == lines

    wnt = format_result(df, "CSVWithNamesAndTypes").splitlines()
    assert "Int32" in wnt[1] and "Nullable(String)" in wnt[1]


def test_tsv_family(spark):
    df = spark.sql("SELECT 'a\\tb' AS s, 10 AS n")
    tsv = format_result(df, "TSV")
    assert tsv == "a\\tb\t10\n"  # tab inside value is escaped
    named = format_result(df, "TabSeparatedWithNames")
    assert named.splitlines()[0] == "s\tn"
    raw = format_result(df, "TabSeparatedRaw")
    assert raw == "a\tb\t10\n"  # raw: no escaping


def test_pretty_formats(df):
    pretty = format_result(df, "Pretty")
    assert pretty.startswith("┏")
    assert "┃ id" in pretty.splitlines()[1]
    assert pretty.rstrip().endswith("┘")

    compact = format_result(df, "PrettyCompact")
    assert compact.startswith("┌─id")
    assert "│" in compact

    space = format_result(df, "PrettySpace")
    assert "id" in space.splitlines()[0] and "│" not in space


def test_json_formats(df):
    doc = json.loads(format_result(df, "JSON"))
    assert doc["rows"] == 3
    assert doc["meta"][0] == {"name": "id", "type": "Int32"}
    assert doc["data"][0]["name"] == "alpha"
    assert doc["data"][2]["name"] is None

    ejr = format_result(df, "JSONEachRow").splitlines()
    assert len(ejr) == 3
    assert json.loads(ejr[0])["id"] == 1

    compact = json.loads(format_result(df, "JSONCompact"))
    assert compact["data"][0][0] == 1 and isinstance(compact["data"][0], list)

    cols = json.loads(format_result(df, "JSONColumns"))
    assert cols["id"] == [1, 2, 3]

    # NDJSON / JSONLines are aliases of JSONEachRow
    assert format_result(df, "NDJSON") == format_result(df, "JSONEachRow")


def test_values_vertical_markdown(df):
    vals = format_result(df, "Values")
    assert vals.startswith("(1,'alpha',1.5,'2024-01-02'")
    assert "NULL" in vals

    vert = format_result(df, "Vertical")
    assert vert.startswith("Row 1:")
    assert "name: alpha" in vert.replace("  ", " ").replace(" name", "name")

    md = format_result(df, "Markdown")
    assert md.splitlines()[0].startswith("| id")
    assert set(md.splitlines()[1]) <= set("|-: ")


def test_null_format_executes_but_empty(df):
    assert format_result(df, "Null") == ""


def test_extended_text_formats(df):
    tskv = format_result(df, "TSKV").splitlines()
    assert tskv[0].startswith("id=1\tname=alpha")
    assert "name=\\N" in tskv[2]

    obj = json.loads(format_result(df, "JSONObjectEachRow"))
    assert obj["row_1"]["id"] == 1 and len(obj) == 3

    cc = json.loads(format_result(df, "JSONCompactColumns"))
    assert cc[0] == [1, 2, 3]  # column-major

    se = format_result(df, "JSONStringsEachRow").splitlines()
    assert json.loads(se[0])["score"] == "1.5"  # every value stringified

    xml = format_result(df, "XML")
    assert "<name>alpha</name>" in xml and "<rows>3</rows>" in xml

    ins = format_result(df, "SQLInsert")
    assert ins.startswith("INSERT INTO table (id, name, score")
    assert "NULL" in ins


def test_rowbinary_roundtrip(spark):
    """RowBinary: decode the bytes back and compare — real binary layout
    (null flag + little-endian fixed types + varint strings)."""
    import struct

    df2 = spark.sql("SELECT * FROM VALUES (1, 'ab', 2.5), (2, NULL, CAST(NULL AS DOUBLE)) AS t(i, s, d)")
    raw = format_result(df2, "RowBinary")
    pos = 0

    def read_cell(fmt=None, is_str=False):
        nonlocal pos
        null = raw[pos]; pos += 1
        if null:
            return None
        if is_str:
            ln = raw[pos]; pos += 1  # values < 128: single varint byte
            s = raw[pos : pos + ln].decode(); pos += ln
            return s
        size = struct.calcsize(fmt)
        v = struct.unpack_from(fmt, raw, pos)[0]; pos += size
        return v

    assert read_cell("<i") == 1
    assert read_cell(is_str=True) == "ab"
    assert read_cell("<d") == 2.5
    assert read_cell("<i") == 2
    assert read_cell(is_str=True) is None
    assert read_cell("<d") is None
    assert pos == len(raw)

    named = format_result(df2, "RowBinaryWithNamesAndTypes")
    assert named[0] == 3  # varint column count
    assert b"Int32" in named and b"Nullable(String)" in named


def test_rowbinary_date_timestamp_match_declared_types(spark):
    """Date32/DateTime64(6) wire widths must agree with the declared header
    types: int32 days and int64 microsecond ticks (a decoder following the
    header would desync otherwise)."""
    import struct
    from datetime import date as _date

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.sql(
            "SELECT DATE'1969-12-25' AS d, TIMESTAMP'2024-03-01 12:30:45.123456' AS ts"
        )
        raw = format_result(df, "RowBinaryWithNamesAndTypes")
        assert b"Date32" in raw and b"DateTime64(6)" in raw
        # body = last (1+4) + (1+8) bytes: null flag + int32, null flag + int64
        body = raw[-(5 + 9):]
        assert body[0] == 0
        days = struct.unpack_from("<i", body, 1)[0]
        assert days == (_date(1969, 12, 25) - _date(1970, 1, 1)).days  # negative
        assert body[5] == 0
        micros = struct.unpack_from("<q", body, 6)[0]
        assert micros == 1709296245123456
    finally:
        spark.conf.unset("spark.sql.session.timeZone")


# ---------------------------------------------------------------------------
# binary + python formats
# ---------------------------------------------------------------------------


def test_arrow_and_parquet_bytes(df):
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    raw = format_result(df, "Arrow")
    tbl = pa.ipc.open_file(io.BytesIO(raw)).read_all()
    assert tbl.num_rows == 3

    stream = format_result(df, "ArrowStream")
    tbl2 = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    assert tbl2.num_rows == 3

    pqa = format_result(df, "Parquet")
    tbl3 = pq.read_table(io.BytesIO(pqa))
    assert tbl3.num_rows == 3 and "name" in tbl3.column_names


def test_python_formats(df):
    assert format_result(df, "DataFrame") is df
    pdf = format_result(df, "Pandas")
    assert len(pdf) == 3
    at = format_result(df, "ArrowTable")
    assert at.num_rows == 3


def test_unknown_format_raises(df):
    with pytest.raises(ValueError, match="unknown output format"):
        format_result(df, "NoSuchFormat")
    assert "pretty" in supported_formats()
    assert FORMAT_ALIASES["debug"] == "csv"  # Debug renders as CSV (reference)


def test_module_level_query_formats(spark):
    out = chs.query(spark, "SELECT 2 AS two", "CSVWithNames")
    assert out == '"two"\n2\n'
    lazy = chs.query(spark, "SELECT 2 AS two")
    assert lazy.first().two == 2


def test_reference_shape_query(spark, tmp_path):
    """chdb.query('SELECT ...', 'Pretty') — sql-first, implicit session,
    CSV default, path= routes through a stateful Session."""
    assert chs.query("SELECT 1 AS a, 'x' AS b") == '1,"x"\n'  # CSV default
    pretty = chs.query("SELECT 7 AS n", "Pretty")
    assert pretty.startswith("┏") and "7" in pretty
    # path= persists DDL across calls, like chdb.query(path=...)
    p = str(tmp_path / "qsess")
    chs.query("CREATE TABLE kv AS SELECT 1 AS k, 'v' AS v", "CSV", path=p)
    assert chs.query("SELECT v FROM kv", "CSV", path=p) == '"v"\n'


# ---------------------------------------------------------------------------
# {key:Type} parameter binding
# ---------------------------------------------------------------------------


def test_format_suffix_clause(spark):
    """ClickHouse dialect: `SELECT ... FORMAT JSONEachRow` inside the SQL."""
    out = chs.query(spark, "SELECT 5 AS n FORMAT JSONEachRow")
    assert json.loads(out) == {"n": 5}
    # unknown trailing word is NOT treated as a format clause
    lazy = chs.query(spark, "SELECT 'x' AS format_nothing")
    assert lazy.first()[0] == "x"
    from chdb_spark.formats import split_format_suffix

    assert split_format_suffix("SELECT date_format(now(), 'y') AS d") == (
        "SELECT date_format(now(), 'y') AS d", None,
    )
    assert split_format_suffix("SELECT 1 FORMAT Pretty;") == ("SELECT 1", "Pretty")
    with Session(spark=spark) as sess:  # stateful surface honors it too
        assert sess.query("SELECT 1 AS a FORMAT CSV") == "1\n"


def test_bind_basic_types():
    assert bind_params("SELECT {n:UInt32} AS n", {"n": 41}) == "SELECT 41 AS n"
    assert (
        bind_params("SELECT {s:String} AS s", {"s": "it's"})
        == "SELECT 'it\\'s' AS s"
    )
    assert (
        bind_params("SELECT {d:Date} AS d", {"d": datetime.date(2024, 5, 6)})
        == "SELECT DATE '2024-05-06' AS d"
    )
    assert (
        bind_params("SELECT {t:DateTime} AS t", {"t": "2024-05-06 07:08:09"})
        == "SELECT TIMESTAMP '2024-05-06 07:08:09' AS t"
    )
    assert bind_params("SELECT {f:Float64}", {"f": 1.5}) == "SELECT 1.5"
    assert bind_params("SELECT {b:Bool}", {"b": True}) == "SELECT true"


def test_bind_nullable_array_identifier():
    assert bind_params("SELECT {x:Nullable(Int64)}", {"x": None}) == "SELECT NULL"
    assert (
        bind_params("SELECT {a:Array(Int32)}", {"a": [1, 2, 3]})
        == "SELECT array(1, 2, 3)"
    )
    assert (
        bind_params("SELECT * FROM {t:Identifier}", {"t": "lineitem"})
        == "SELECT * FROM `lineitem`"
    )
    with pytest.raises(ValueError):
        bind_params("SELECT * FROM {t:Identifier}", {"t": "x; DROP TABLE y"})


def test_bind_injection_safe():
    # a malicious string value stays inside its literal
    sql = bind_params("SELECT {s:String} AS s", {"s": "'; DROP TABLE users; --"})
    assert sql == "SELECT '\\'; DROP TABLE users; --' AS s"


def test_bind_decimal_validates():
    # valid numerics render as exact decimal text
    assert bind_params("SELECT {d:Decimal(10,2)}", {"d": "12.34"}) == "SELECT 12.34"
    assert bind_params("SELECT {d:Decimal(10,2)}", {"d": 7}) == "SELECT 7"
    from decimal import Decimal as D

    assert (
        bind_params("SELECT {d:Decimal(38,10)}", {"d": D("1.0000000001")})
        == "SELECT 1.0000000001"
    )
    # non-numeric input must raise, never splice raw text into the SQL
    import decimal

    with pytest.raises((decimal.InvalidOperation, ValueError)):
        bind_params("SELECT {d:Decimal(10,2)}", {"d": "1; DROP TABLE users"})
    with pytest.raises((decimal.InvalidOperation, ValueError)):
        bind_params("SELECT {d:Decimal(10,2)}", {"d": "nan"})


def test_bind_errors():
    with pytest.raises(KeyError):
        bind_params("SELECT {a:Int32}", {"b": 1})
    with pytest.raises(KeyError):
        bind_params("SELECT {a:Int32}", None)
    # no placeholders + no params = passthrough
    assert bind_params("SELECT 1", None) == "SELECT 1"


def test_query_with_params_end_to_end(spark):
    out = chs.query(
        spark,
        "SELECT {n:UInt32} * 2 AS x, {s:String} AS s",
        "JSONEachRow",
        params={"n": 21, "s": "ok"},
    )
    assert json.loads(out) == {"x": 42, "s": "ok"}


def test_stateful_session_params(spark):
    from chdb_spark.stateful import Session

    with Session(spark=spark) as sess:
        got = sess.query(
            "SELECT {v:Int64} + 1 AS r", fmt="Pandas", params={"v": 9}
        )
        assert int(got["r"].iloc[0]) == 10


# ---------------------------------------------------------------------------
# property-based: binding is injection-proof and value-exact
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(_texts)
def test_string_param_roundtrips_exactly(spark, s):
    """Any unicode string (quotes, backslashes, braces, newlines) bound via
    {v:String} must come back byte-identical — the literal can never be
    escaped out of, and the binder must not mangle content."""
    pdf = chs.query(spark, "SELECT {v:String} AS v", "Pandas", params={"v": s})
    assert pdf["v"].iloc[0] == s


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_int_param_roundtrips(spark, n):
    pdf = chs.query(spark, "SELECT {v:Int64} AS v", "Pandas", params={"v": n})
    assert int(pdf["v"].iloc[0]) == n


def test_chdb_error_on_reference_shape(spark):
    """Reference error contract: sql-first query failures raise ChdbError;
    Spark-shape calls keep Spark's typed exceptions."""
    from chdb_spark import ChdbError

    with pytest.raises(ChdbError):
        chs.query("SELECT * FROM no_such_table_xyz")
    with pytest.raises(Exception) as ei:
        chs.query(spark, "SELECT * FROM no_such_table_xyz")
    assert not isinstance(ei.value, ChdbError)  # Spark shape: native error


def test_query_options_and_debug_format(spark):
    # reference signature parity: options= accepted (udf_path honored,
    # engine-startup keys no-ops), Debug renders as CSV
    out = chs.query(spark, "SELECT 1 AS x", "Debug", options={"verbose": ""})
    assert out.strip() == "1"
    out = chs.query(
        spark, "SELECT 2 AS x", "CSV", options={"max_threads": 4, "progress": "off"}
    )
    assert out.strip() == "2"


def test_progress_callback_and_nl_gating(spark, monkeypatch):
    seen = []
    out = chs.query(
        spark,
        "SELECT number FROM numbers(1000)",
        "CSV",
        progress_callback=lambda p: seen.append(p),
    )
    assert out.count("\n") == 1000
    assert len(seen) == 1 and seen[0].read_rows == 1000 and seen[0].elapsed >= 0

    # AI-assisted SQL: clear gate error without an LLM key
    from chdb_spark import nl

    for var in nl._KEY_VARS:
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(RuntimeError, match="LLM API key"):
        nl.generate_sql("top 10 countries")
    with pytest.raises(RuntimeError, match="LLM API key"):
        nl.ask("what are the top products?", data="sales.parquet")
    # fence stripping is pure and testable offline
    assert nl._strip_fences("```sql\nSELECT 1\n```") == "SELECT 1"


def test_settings_json_quote_toggle(spark):
    """SETTINGS output_format_json_quote_64bit_integers is honored — the
    reference's query-level setting rides on the SQL text."""
    q = "SELECT CAST(5 AS BIGINT) AS v"
    assert json.loads(chs.query(spark, q + " FORMAT JSONEachRow")) == {"v": "5"}
    out = chs.query(
        spark,
        q + " SETTINGS output_format_json_quote_64bit_integers=0 FORMAT JSONEachRow",
    )
    assert json.loads(out) == {"v": 5}


def test_settings_csv_delimiter_and_null(spark):
    out = chs.query(
        spark,
        "SELECT 1 AS a, CAST(NULL AS INT) AS b, 3 AS c "
        "SETTINGS format_csv_delimiter=';', format_csv_null_representation='NULL' "
        "FORMAT CSV",
    )
    assert out.strip() == "1;NULL;3"
    # defaults unchanged
    out = chs.query(spark, "SELECT 1 AS a, CAST(NULL AS INT) AS b FORMAT CSV")
    assert out.strip() == "1,\\N"
