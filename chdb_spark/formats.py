"""SQL output formats — the ``output_format`` axis of ``chdb.query``.

The reference accepts 60+ ClickHouse format names and has the engine render
the result as text/bytes in that format (reference chdb/__init__.py:145-217:
everything that is not DataFrame/ArrowTable is passed to the engine as an
output format string; docs/ examples lean on ``"Pretty"``, ``"CSV"``,
``"JSONEachRow"``). Here the engine is Spark, so rendering happens on the
*collected* result: ``df.toPandas()`` (Arrow transfer) then pure-Python
string building.

Scale posture: a format string is a *driver-side presentation* of a result
the user asked to see — the reference semantics are identical (the full
formatted payload materializes in process memory). Anything big should go
through a sink (``chdb_spark.sinks``) or the lazy DataFrame path; formats
exist for the human/API surface, not the 100 TB data path.

Supported (canonical name — aliases in FORMAT_ALIASES):
  text:   CSV, CSVWithNames, CSVWithNamesAndTypes,
          TabSeparated(+WithNames/+WithNamesAndTypes/Raw),
          Pretty, PrettyCompact, PrettyNoEscapes, PrettySpace,
          JSON, JSONEachRow, JSONCompact, JSONCompactEachRow, JSONColumns,
          JSONStrings, Values, Vertical, Markdown, Null
  binary: Arrow, ArrowStream, Parquet
  python: DataFrame (lazy Spark DF), Pandas, ArrowTable
"""

from __future__ import annotations

import json
import math
from datetime import date, datetime
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# ClickHouse type names (for WithNamesAndTypes rows and JSON meta)
# ---------------------------------------------------------------------------

_CH_SIMPLE = {
    T.LongType: "Int64",
    T.IntegerType: "Int32",
    T.ShortType: "Int16",
    T.ByteType: "Int8",
    T.DoubleType: "Float64",
    T.FloatType: "Float32",
    T.StringType: "String",
    T.BooleanType: "Bool",
    T.DateType: "Date32",
    T.TimestampType: "DateTime64(6)",
    T.TimestampNTZType: "DateTime64(6)",
    T.BinaryType: "String",
    T.NullType: "Nothing",
}


def ch_type_name(dt: T.DataType, nullable: bool = False) -> str:
    """Spark DataType → ClickHouse type name (reference meta rows carry CH
    names; SURVEY.md §3.1 type mapping)."""
    if isinstance(dt, T.DecimalType):
        name = f"Decimal({dt.precision}, {dt.scale})"
    elif isinstance(dt, T.ArrayType):
        name = f"Array({ch_type_name(dt.elementType, dt.containsNull)})"
        return name  # Array itself is never Nullable in CH
    elif isinstance(dt, T.MapType):
        name = (
            f"Map({ch_type_name(dt.keyType)}, "
            f"{ch_type_name(dt.valueType, dt.valueContainsNull)})"
        )
        return name
    elif isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {ch_type_name(f.dataType, f.nullable)}" for f in dt.fields
        )
        return f"Tuple({inner})"
    else:
        name = _CH_SIMPLE.get(type(dt), str(dt.simpleString()))
    if nullable and not name.startswith("Nullable("):
        name = f"Nullable({name})"
    return name


# ---------------------------------------------------------------------------
# scalar rendering
# ---------------------------------------------------------------------------


def _is_null(v: Any) -> bool:
    if v is None:
        return True
    try:
        return bool(v != v)  # NaN/NaT (pandas nulls); arrays compare elementwise
    except ValueError:
        return False


def _fmt_float(v: float) -> str:
    if math.isnan(v):
        return "nan"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(float(v))


def _plain(v: Any) -> str:
    """Unescaped text of one value (Pretty/TSV body before escaping)."""
    if _is_null(v):
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _fmt_float(v)
    if isinstance(v, datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}"
        return s
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_quoted_inner(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{_quoted_inner(k)}:{_quoted_inner(x)}" for k, x in v.items()) + "}"
    return str(v)


def _quoted_inner(v: Any) -> str:
    """Array/map elements: strings get single quotes (CH nested rendering)."""
    if _is_null(v):
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return _plain(v)


def _tsv_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _tsv_value(v: Any) -> str:
    if _is_null(v):
        return "\\N"
    return _tsv_escape(_plain(v))


def _csv_value(v: Any) -> str:
    if _is_null(v):
        return "\\N"  # CH CSV null default (format_csv_null_representation)
    s = _plain(v)
    if isinstance(v, (str, bytes, bytearray, datetime, date, list, tuple, dict)) or any(
        c in s for c in (",", '"', "\n", "\r")
    ):
        return '"' + s.replace('"', '""') + '"'
    return s


def _sql_value(v: Any) -> str:
    """Values format / SQL literal."""
    if _is_null(v):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (str, bytes, bytearray)):
        s = _plain(v)
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (datetime, date)):
        return "'" + _plain(v) + "'"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_sql_value(x) for x in v) + "]"
    return _plain(v)


def _json_value(v: Any, quote64: bool = False) -> Any:
    """Python object ready for json.dumps. CH quotes 64-bit integers by
    default (output_format_json_quote_64bit_integers=1) — *by column type*:
    every Int64/UInt64 value is a JSON string, regardless of magnitude.
    ``quote64`` carries that column-level fact; values whose type is
    unknown (nested/dynamic) still quote past 2^53 to stay JS-safe."""
    if _is_null(v):
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return str(v) if quote64 or abs(v) > 2**53 - 1 else v
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return v
    if isinstance(v, (datetime, date)):
        return _plain(v)
    if isinstance(v, (bytes, bytearray)):
        return _plain(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return [_json_value(x, quote64) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_value(x, quote64) for k, x in v.items()}
    if hasattr(v, "item"):  # numpy scalar
        return _json_value(v.item(), quote64)
    return str(v) if not isinstance(v, str) else v


# ---------------------------------------------------------------------------
# table renderers (rows = list of tuples of python values)
# ---------------------------------------------------------------------------


def _collect(df: DataFrame):
    pdf = df.toPandas()
    cols = list(pdf.columns)
    rows = [tuple(rec) for rec in pdf.itertuples(index=False, name=None)]
    types = [
        ch_type_name(f.dataType, f.nullable) for f in df.schema.fields
    ]
    numeric = [
        isinstance(f.dataType, T.NumericType) for f in df.schema.fields
    ]
    return cols, types, rows, numeric


def _sep(names, sep_rows):
    return "\n".join(sep_rows) + "\n" if sep_rows else ""


def _render_csv(cols, types, rows, names=False, with_types=False):
    # CH query-level format settings with render meaning here
    sep = str(_RENDER_SETTINGS.get("format_csv_delimiter", ","))[:1] or ","
    null_rep = _RENDER_SETTINGS.get("format_csv_null_representation", "\\N")

    def val(v):
        if _is_null(v):
            return null_rep
        return _csv_value(v)

    out = []
    if names:
        out.append(sep.join(_csv_value(c) for c in cols))
    if with_types:
        out.append(sep.join(_csv_value(t) for t in types))
    for r in rows:
        out.append(sep.join(val(v) for v in r))
    return "\n".join(out) + ("\n" if out else "")


def _render_tsv(cols, types, rows, names=False, with_types=False, raw=False):
    esc = (lambda v: "\\N" if _is_null(v) else _plain(v)) if raw else _tsv_value
    out = []
    if names:
        out.append("\t".join(_tsv_escape(c) for c in cols))
    if with_types:
        out.append("\t".join(types))
    for r in rows:
        out.append("\t".join(esc(v) for v in r))
    return "\n".join(out) + ("\n" if out else "")


def _cells(cols, rows):
    body = [[_plain(v) for v in r] for r in rows]
    widths = [len(c) for c in cols]
    for r in body:
        for i, s in enumerate(r):
            widths[i] = max(widths[i], len(s))
    return body, widths


def _pad(s, w, right_align):
    return s.rjust(w) if right_align else s.ljust(w)


def _render_pretty(cols, rows, numeric):
    """CH ``Pretty``: heavy-box header, light-box body."""
    body, w = _cells(cols, rows)
    top = "┏━" + "━┳━".join("━" * x for x in w) + "━┓"
    hdr = "┃ " + " ┃ ".join(c.ljust(x) for c, x in zip(cols, w)) + " ┃"
    mid = "┡━" + "━╇━".join("━" * x for x in w) + "━┩"
    bot = "└─" + "─┴─".join("─" * x for x in w) + "─┘"
    lines = [top, hdr, mid]
    for r in body:
        lines.append(
            "│ " + " │ ".join(_pad(s, x, n) for s, x, n in zip(r, w, numeric)) + " │"
        )
    lines.append(bot)
    return "\n".join(lines) + "\n"


def _render_pretty_compact(cols, rows, numeric):
    """CH ``PrettyCompact``: names embedded in the top border."""
    body, w = _cells(cols, rows)
    top = "┌─" + "─┬─".join(c.ljust(x, "─") for c, x in zip(cols, w)) + "─┐"
    bot = "└─" + "─┴─".join("─" * x for x in w) + "─┘"
    lines = [top]
    for r in body:
        lines.append(
            "│ " + " │ ".join(_pad(s, x, n) for s, x, n in zip(r, w, numeric)) + " │"
        )
    lines.append(bot)
    return "\n".join(lines) + "\n"


def _render_pretty_space(cols, rows, numeric):
    body, w = _cells(cols, rows)
    lines = [" " + "   ".join(c.ljust(x) for c, x in zip(cols, w))]
    for r in body:
        lines.append(
            " " + "   ".join(_pad(s, x, n) for s, x, n in zip(r, w, numeric))
        )
    return "\n".join(lines) + "\n"


def _render_vertical(cols, rows):
    lines = []
    for i, r in enumerate(rows, 1):
        head = f"Row {i}:"
        lines.append(head)
        lines.append("─" * max(len(head), 6))
        width = max((len(c) for c in cols), default=0)
        for c, v in zip(cols, r):
            lines.append(f"{c.rjust(width)}: {_plain(v)}")
        lines.append("")
    return "\n".join(lines)


def _render_markdown(cols, rows, numeric):
    body, w = _cells(cols, rows)
    lines = ["| " + " | ".join(c.ljust(x) for c, x in zip(cols, w)) + " |"]
    lines.append(
        "|" + "|".join(("-" * (x + 1) + ":") if n else ("-" * (x + 2)) for x, n in zip(w, numeric)) + "|"
    )
    for r in body:
        lines.append(
            "| " + " | ".join(_pad(s, x, n) for s, x, n in zip(r, w, numeric)) + " |"
        )
    return "\n".join(lines) + "\n"


#: render-scope settings (set by format_result; CH query-level SETTINGS)
_RENDER_SETTINGS: dict = {}


def _i64_flags(types):
    """Per-column: is the ClickHouse type (U)Int64, so JSON must quote it?
    Honors ``SETTINGS output_format_json_quote_64bit_integers=0``."""
    if str(_RENDER_SETTINGS.get("output_format_json_quote_64bit_integers", "1")) in (
        "0", "false",
    ):
        return [False] * len(types or ())
    out = []
    for t in types or ():
        base = t[9:-1] if t.startswith("Nullable(") else t
        out.append(base in ("Int64", "UInt64"))
    return out


def _render_json(cols, types, rows):
    q = _i64_flags(types)
    doc = {
        "meta": [{"name": c, "type": t} for c, t in zip(cols, types)],
        "data": [
            {c: _json_value(v, f) for c, v, f in zip(cols, r, q)} for r in rows
        ],
        "rows": len(rows),
    }
    return json.dumps(doc, ensure_ascii=False, indent=1) + "\n"


def _render_json_compact(cols, types, rows):
    q = _i64_flags(types)
    doc = {
        "meta": [{"name": c, "type": t} for c, t in zip(cols, types)],
        "data": [[_json_value(v, f) for v, f in zip(r, q)] for r in rows],
        "rows": len(rows),
    }
    return json.dumps(doc, ensure_ascii=False, indent=1) + "\n"


def _render_json_each_row(cols, rows, types=None):
    q = _i64_flags(types) or [False] * len(cols)
    return (
        "\n".join(
            json.dumps(
                {c: _json_value(v, f) for c, v, f in zip(cols, r, q)},
                ensure_ascii=False,
            )
            for r in rows
        )
        + ("\n" if rows else "")
    )


def _render_json_compact_each_row(cols, rows, types=None):
    q = _i64_flags(types) or [False] * len(cols)
    return (
        "\n".join(
            json.dumps([_json_value(v, f) for v, f in zip(r, q)], ensure_ascii=False)
            for r in rows
        )
        + ("\n" if rows else "")
    )


def _render_json_columns(cols, rows, types=None):
    q = _i64_flags(types) or [False] * len(cols)
    doc = {
        c: [_json_value(r[i], q[i]) for r in rows] for i, c in enumerate(cols)
    }
    return json.dumps(doc, ensure_ascii=False, indent=1) + "\n"


def _render_json_strings(cols, types, rows):
    doc = {
        "meta": [{"name": c, "type": t} for c, t in zip(cols, types)],
        "data": [
            {c: (None if _is_null(v) else _plain(v)) for c, v in zip(cols, r)}
            for r in rows
        ],
        "rows": len(rows),
    }
    return json.dumps(doc, ensure_ascii=False, indent=1) + "\n"


def _render_values(rows):
    return ",".join("(" + ",".join(_sql_value(v) for v in r) + ")" for r in rows)


def _render_tskv(cols, rows):
    """CH ``TSKV``: one line per row of tab-separated key=value pairs."""
    out = []
    for r in rows:
        out.append(
            "\t".join(
                f"{_tsv_escape(c)}={_tsv_value(v)}" for c, v in zip(cols, r)
            )
        )
    return "\n".join(out) + ("\n" if out else "")


def _render_json_object_each_row(cols, rows, types=None):
    q = _i64_flags(types) or [False] * len(cols)
    doc = {
        f"row_{i}": {c: _json_value(v, f) for c, v, f in zip(cols, r, q)}
        for i, r in enumerate(rows, 1)
    }
    return json.dumps(doc, ensure_ascii=False, indent=1) + "\n"


def _render_json_compact_columns(cols, rows, types=None):
    q = _i64_flags(types) or [False] * len(cols)
    doc = [[_json_value(r[i], q[i]) for r in rows] for i in range(len(cols))]
    return json.dumps(doc, ensure_ascii=False) + "\n"


def _str_or_none(v):
    return None if _is_null(v) else _plain(v)


def _render_json_strings_each_row(cols, rows):
    return (
        "\n".join(
            json.dumps(
                {c: _str_or_none(v) for c, v in zip(cols, r)}, ensure_ascii=False
            )
            for r in rows
        )
        + ("\n" if rows else "")
    )


def _render_json_compact_strings(cols, types, rows):
    doc = {
        "meta": [{"name": c, "type": t} for c, t in zip(cols, types)],
        "data": [[_str_or_none(v) for v in r] for r in rows],
        "rows": len(rows),
    }
    return json.dumps(doc, ensure_ascii=False, indent=1) + "\n"


def _render_json_compact_strings_each_row(cols, rows):
    return (
        "\n".join(
            json.dumps([_str_or_none(v) for v in r], ensure_ascii=False)
            for r in rows
        )
        + ("\n" if rows else "")
    )


def _render_line_as_string(rows):
    """CH ``LineAsString`` output: each row's values joined raw, no escaping."""
    return "\n".join(" ".join(_plain(v) for v in r) for r in rows) + (
        "\n" if rows else ""
    )


def _render_xml(cols, types, rows):
    from xml.sax.saxutils import escape

    lines = ["<?xml version='1.0' encoding='UTF-8' ?>", "<result>", "\t<meta>", "\t\t<columns>"]
    for c, t in zip(cols, types):
        lines.append("\t\t\t<column>")
        lines.append(f"\t\t\t\t<name>{escape(c)}</name>")
        lines.append(f"\t\t\t\t<type>{escape(t)}</type>")
        lines.append("\t\t\t</column>")
    lines += ["\t\t</columns>", "\t</meta>", "\t<data>"]
    for r in rows:
        lines.append("\t\t<row>")
        for c, v in zip(cols, r):
            tag = escape(c)
            if _is_null(v):
                lines.append(f"\t\t\t<{tag} xsi:nil=\"true\"/>")
            else:
                lines.append(f"\t\t\t<{tag}>{escape(_plain(v))}</{tag}>")
        lines.append("\t\t</row>")
    lines += ["\t</data>", f"\t<rows>{len(rows)}</rows>", "</result>"]
    return "\n".join(lines) + "\n"


def _render_sql_insert(cols, rows, table="table"):
    """CH ``SQLInsert``: INSERT statements (64-row batches like the engine)."""
    out = []
    head = f"INSERT INTO {table} (" + ", ".join(cols) + ") VALUES "
    for i in range(0, len(rows), 64):
        batch = rows[i : i + 64]
        out.append(
            head
            + ", ".join("(" + ", ".join(_sql_value(v) for v in r) + ")" for r in batch)
            + ";"
        )
    return "\n".join(out) + ("\n" if out else "")


# -- RowBinary (real binary encoding: little-endian fixed types, LEB128
#    varint length-prefixed UTF-8 strings, Date32=int32 days,
#    DateTime64(6)=int64 microsecond ticks — matching the type names the
#    WithNamesAndTypes header declares, so a CH-wire decoder reading the
#    declared types stays in sync and the full 1900..2299 range fits) ------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _rowbinary_cell(v, spark_type: str) -> bytes:
    import struct

    t = spark_type
    if _is_null(v):
        # Nullable encoding: 1-byte null flag; Spark schemas are nullable,
        # so every cell carries the flag (documented divergence from
        # non-nullable CH columns)
        return b"\x01"
    prefix = b"\x00"
    if t in ("tinyint", "smallint", "int", "bigint"):
        size = {"tinyint": "b", "smallint": "h", "int": "i", "bigint": "q"}[t]
        return prefix + struct.pack("<" + size, int(v))
    if t == "float":
        return prefix + struct.pack("<f", float(v))
    if t == "double":
        return prefix + struct.pack("<d", float(v))
    if t == "boolean":
        return prefix + (b"\x01" if v else b"\x00")
    if t == "date":
        # Date32 wire: signed int32 days since epoch (negative = pre-1970)
        epoch = date(1970, 1, 1)
        return prefix + struct.pack("<i", (v - epoch).days)
    if t.startswith("timestamp"):
        # DateTime64(6) wire: signed int64 microsecond ticks since epoch
        micros = int(v.timestamp()) * 1_000_000 + v.microsecond
        return prefix + struct.pack("<q", micros)
    s = _plain(v).encode("utf-8")
    return prefix + _varint(len(s)) + s


def _render_rowbinary(
    cols, spark_types, rows, names=False, with_types=False, ch_types=None
) -> bytes:
    out = bytearray()
    if names or with_types:
        out += _varint(len(cols))
        for c in cols:
            b = c.encode()
            out += _varint(len(b)) + b
    if with_types:
        for t in ch_types or spark_types:
            b = t.encode()
            out += _varint(len(b)) + b
    for r in rows:
        for v, t in zip(r, spark_types):
            out += _rowbinary_cell(v, t)
    return bytes(out)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

#: alias (lowercase) → canonical lowercase key
FORMAT_ALIASES = {
    "tsv": "tabseparated",
    "tsvwithnames": "tabseparatedwithnames",
    "tsvwithnamesandtypes": "tabseparatedwithnamesandtypes",
    "tsvraw": "tabseparatedraw",
    "raw": "tabseparatedraw",
    "ndjson": "jsoneachrow",
    "jsonlines": "jsoneachrow",
    "pretty_compact": "prettycompact",
    "prettycompactnoescapes": "prettycompact",
    "prettynoescapes": "pretty",
    "prettymonoblock": "pretty",
    "prettycompactmonoblock": "prettycompact",
    "prettyspacenoescapes": "prettyspace",
    "prettyspacemonoblock": "prettyspace",
    "vertical_raw": "vertical",
    "tabseparatedrawwithnames": "tabseparatedwithnames",
    "jsoncolumnswithmetadata": "jsoncompact",
    "datastore": "dataframe",
    "df": "dataframe",
    "debug": "csv",  # reference: Debug = CSV + verbose engine logging
}

_TEXT_RENDERERS = {
    "csv": lambda c, t, r, n: _render_csv(c, t, r),
    "csvwithnames": lambda c, t, r, n: _render_csv(c, t, r, names=True),
    "csvwithnamesandtypes": lambda c, t, r, n: _render_csv(c, t, r, names=True, with_types=True),
    "tabseparated": lambda c, t, r, n: _render_tsv(c, t, r),
    "tabseparatedwithnames": lambda c, t, r, n: _render_tsv(c, t, r, names=True),
    "tabseparatedwithnamesandtypes": lambda c, t, r, n: _render_tsv(c, t, r, names=True, with_types=True),
    "tabseparatedraw": lambda c, t, r, n: _render_tsv(c, t, r, raw=True),
    "pretty": lambda c, t, r, n: _render_pretty(c, r, n),
    "prettycompact": lambda c, t, r, n: _render_pretty_compact(c, r, n),
    "prettyspace": lambda c, t, r, n: _render_pretty_space(c, r, n),
    "vertical": lambda c, t, r, n: _render_vertical(c, r),
    "markdown": lambda c, t, r, n: _render_markdown(c, r, n),
    "json": lambda c, t, r, n: _render_json(c, t, r),
    "jsoncompact": lambda c, t, r, n: _render_json_compact(c, t, r),
    "jsoneachrow": lambda c, t, r, n: _render_json_each_row(c, r, t),
    "jsoncompacteachrow": lambda c, t, r, n: _render_json_compact_each_row(c, r, t),
    "jsoncolumns": lambda c, t, r, n: _render_json_columns(c, r, t),
    "jsonstrings": lambda c, t, r, n: _render_json_strings(c, t, r),
    "values": lambda c, t, r, n: _render_values(r),
    "tskv": lambda c, t, r, n: _render_tskv(c, r),
    "jsonobjecteachrow": lambda c, t, r, n: _render_json_object_each_row(c, r, t),
    "jsoncompactcolumns": lambda c, t, r, n: _render_json_compact_columns(c, r, t),
    "jsonstringseachrow": lambda c, t, r, n: _render_json_strings_each_row(c, r),
    "jsoncompactstrings": lambda c, t, r, n: _render_json_compact_strings(c, t, r),
    "jsoncompactstringseachrow": lambda c, t, r, n: _render_json_compact_strings_each_row(c, r),
    "lineasstring": lambda c, t, r, n: _render_line_as_string(r),
    "xml": lambda c, t, r, n: _render_xml(c, t, r),
    "sqlinsert": lambda c, t, r, n: _render_sql_insert(c, r),
    "null": lambda c, t, r, n: "",
}

_ROWBINARY = {"rowbinary", "rowbinarywithnames", "rowbinarywithnamesandtypes"}


def supported_formats() -> list[str]:
    """All accepted format names (canonical + aliases), for docs/tests."""
    canon = set(_TEXT_RENDERERS) | _ROWBINARY | {
        "dataframe", "pandas", "arrowtable", "arrow", "arrowstream", "parquet",
    }
    return sorted(canon | set(FORMAT_ALIASES))


_FORMAT_SUFFIX = None  # compiled lazily (needs supported_formats())


def split_format_suffix(sql: str) -> tuple[str, str | None]:
    """Strip a trailing ClickHouse ``FORMAT <Name>`` clause from SQL text
    (the reference accepts ``SELECT ... FORMAT JSONEachRow`` — ClickHouse
    dialect; chdb examples use it throughout). Returns (sql, format|None).
    Conservative: only strips when the trailing word is a KNOWN format
    name, so ``date_format``/column names never false-positive."""
    import re

    global _FORMAT_SUFFIX
    if _FORMAT_SUFFIX is None:
        _FORMAT_SUFFIX = re.compile(r"\bFORMAT\s+(\w+)\s*;?\s*$", re.IGNORECASE)
    m = _FORMAT_SUFFIX.search(sql or "")
    if not m:
        return sql, None
    name = m.group(1)
    key = FORMAT_ALIASES.get(name.lower(), name.lower())
    known = key in _TEXT_RENDERERS or key in (
        "dataframe", "pandas", "arrowtable", "arrow", "arrowstream", "parquet",
    )
    if not known:
        return sql, None
    return sql[: m.start()].rstrip(), name


def format_result(
    df: DataFrame, fmt: str = "DataFrame", settings: dict | None = None
) -> Any:
    """Render a (lazy) result DataFrame in a ClickHouse output format.

    Returns: ``str`` for text formats, ``bytes`` for Arrow/Parquet, a lazy
    Spark DataFrame for ``DataFrame``, ``pandas.DataFrame`` for ``Pandas``,
    ``pyarrow.Table`` for ``ArrowTable``. Mirrors reference
    chdb/__init__.py:145-217 (everything beyond the Python objects is an
    engine-rendered format string). ``settings`` carries CH query-level
    SETTINGS with Spark-side render meaning (currently
    output_format_json_quote_64bit_integers).
    """
    global _RENDER_SETTINGS
    _RENDER_SETTINGS = settings or {}
    key = FORMAT_ALIASES.get(fmt.lower(), fmt.lower())

    if key == "dataframe":
        return df
    if key == "pandas":
        return df.toPandas()
    if key == "arrowtable":
        import pyarrow as pa  # noqa: F401

        from chdb_spark.sinks import to_arrow

        return to_arrow(df)
    if key in ("arrow", "arrowstream", "parquet"):
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        from chdb_spark.sinks import to_arrow

        tbl = to_arrow(df)
        buf = io.BytesIO()
        if key == "parquet":
            pq.write_table(tbl, buf)
        elif key == "arrow":
            with pa.ipc.new_file(buf, tbl.schema) as w:
                w.write_table(tbl)
        else:
            with pa.ipc.new_stream(buf, tbl.schema) as w:
                w.write_table(tbl)
        return buf.getvalue()

    if key in _ROWBINARY:
        spark_types = [f.dataType.simpleString() for f in df.schema.fields]
        ch_names, _, rows, _ = _collect(df)
        return _render_rowbinary(
            list(df.columns),
            spark_types,
            rows,
            names=key != "rowbinary",
            with_types=key == "rowbinarywithnamesandtypes",
            ch_types=[ch_type_name(f.dataType, f.nullable) for f in df.schema.fields],
        )

    renderer = _TEXT_RENDERERS.get(key)
    if renderer is None:
        raise ValueError(
            f"unknown output format: {fmt!r} (supported: {', '.join(supported_formats())})"
        )
    if key == "null":
        df.count()  # execute for side effects, discard output (CH Null format)
        return ""
    cols, types, rows, numeric = _collect(df)
    return renderer(cols, types, rows, numeric)


def format_rows(schema, rows, fmt: str) -> bytes:
    """Render already-collected rows in a ClickHouse output format —
    the per-chunk encoder for streamed results (reference send_query with
    ``format=``: each fetched chunk is format-encoded bytes). Accepts the
    text formats and RowBinary*; driver-side string work on one chunk."""
    key = FORMAT_ALIASES.get(fmt.lower(), fmt.lower())
    cols = [f.name for f in schema.fields]
    types = [ch_type_name(f.dataType, f.nullable) for f in schema.fields]
    numeric = [isinstance(f.dataType, T.NumericType) for f in schema.fields]
    tuples = [tuple(r) for r in rows]
    if key in _ROWBINARY:
        spark_types = [f.dataType.simpleString() for f in schema.fields]
        return _render_rowbinary(
            cols, spark_types, tuples,
            names=key != "rowbinary",
            with_types=key == "rowbinarywithnamesandtypes",
            ch_types=types,
        )
    renderer = _TEXT_RENDERERS.get(key)
    if renderer is None:
        raise ValueError(f"format_rows: unsupported streaming format {fmt!r}")
    out = renderer(cols, types, tuples, numeric)
    return out.encode() if isinstance(out, str) else out
