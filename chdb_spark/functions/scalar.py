"""Scalar functions: STRING / DATETIME / MATH / CONDITIONAL / TYPE_CONVERSION.

Reference inventory: datastore/function_definitions.py —
STRING 110 fns (:61-1051,5709-5875), DATETIME 142 (:1077-1826),
MATH 91 (:1966-2156,5425-5700), CONDITIONAL 45 (:2176-2239,7861-7987),
TYPE_CONVERSION 84 (:2261-2345,7614-7842).

Every implementation is a pyspark Column composition (JVM-side, codegen'd) —
no Python UDFs in this module. Names follow the reference (ClickHouse) names;
Spark-native users just use pyspark.sql.functions directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chdb_spark.functions.registry import register, register_many

# ---------------------------------------------------------------------------
# STRING (reference function_definitions.py:61-1051,5709-5875)
# ---------------------------------------------------------------------------

register_many(
    "STRING",
    {
        "upper": F.upper,
        "lower": F.lower,
        "length": F.length,
        "lengthUTF8": F.char_length,
        "reverse": F.reverse,
        "trimBoth": F.trim,
        "trimLeft": F.ltrim,
        "trimRight": F.rtrim,
        "initcap": F.initcap,
        "soundex": F.soundex,
        "ascii": F.ascii,
        "base64Encode": F.base64,
        "base64Decode": lambda c: F.unbase64(c).cast("string"),
        "levenshteinDistance": F.levenshtein,
        "editDistance": F.levenshtein,
        "splitByChar": lambda sep, s: F.split(s, _re_quote(sep)),
    },
)


#: ClickHouse/MySQL formatDateTime specifiers → Java DateTimeFormatter
#: (reference formatDateTime, function_definitions.py:1731-1746 — the
#: reference takes %-style patterns; Spark's date_format takes Java ones).
_CH_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "I": "hh", "M": "mm", "i": "mm",
    "S": "ss", "s": "ss", "f": "SSSSSS", "j": "DDD", "a": "EEE",
    "W": "EEEE", "b": "MMM", "p": "a", "F": "yyyy-MM-dd",
    "D": "MM/dd/yy", "T": "HH:mm:ss", "R": "HH:mm", "G": "yyyy",
    "g": "yy", "n": "\n", "t": "\t", "%": "%",
}


def _ch_format_to_java(fmt: str) -> str:
    """Translate a %-style datetime pattern to Java; literal letter runs are
    single-quoted so date_format does not interpret them."""
    out: list[str] = []
    lit: list[str] = []

    def flush_lit():
        if lit:
            chunk = "".join(lit)
            if any(ch.isalpha() or ch == "'" for ch in chunk):
                chunk = "'" + chunk.replace("'", "''") + "'"
            out.append(chunk)
            lit.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            flush_lit()
            out.append(_CH_FMT.get(spec, spec))
            i += 2
        else:
            lit.append(ch)
            i += 1
    flush_lit()
    return "".join(out)


def _re_quote(sep) -> str:
    """Escape a literal separator for Java-regex-based F.split."""
    import re

    return re.escape(sep) if isinstance(sep, str) else sep


@register("substring", "STRING")
def substring(col, start, length=None) -> Column:
    """1-based substring (reference function_definitions.py:193)."""
    if length is None:
        return F.substring(col, start, 2147483647)
    return F.substring(col, start, length)


@register("concat", "STRING")
def concat(*cols) -> Column:
    return F.concat(*cols)


@register("concatWithSeparator", "STRING")
def concat_ws(sep, *cols) -> Column:
    return F.concat_ws(sep, *cols)


@register("replaceAll", "STRING")
def replace_all(col, pat: str, repl: str) -> Column:
    """Non-regex replace (reference replaceAll, function_definitions.py:329)."""
    return F.replace(col, F.lit(pat), F.lit(repl))


@register("replaceRegexpAll", "STRING")
def replace_regexp_all(col, pat: str, repl: str) -> Column:
    return F.regexp_replace(col, pat, repl)


@register("position", "STRING")
def position(haystack, needle) -> Column:
    """1-based position, 0 if absent (reference position, :418)."""
    return F.instr(haystack, needle)


@register("startsWith", "STRING")
def starts_with(col, prefix) -> Column:
    return col.startswith(prefix)


@register("endsWith", "STRING")
def ends_with(col, suffix) -> Column:
    return col.endswith(suffix)


@register("left", "STRING")
def left(col, n: int) -> Column:
    return F.substring(col, 1, n)


@register("right", "STRING")
def right(col, n: int) -> Column:
    return F.substring(col, -n, n)


@register("leftPad", "STRING")
def left_pad(col, n: int, pad: str = " ") -> Column:
    return F.lpad(col, n, pad)


@register("rightPad", "STRING")
def right_pad(col, n: int, pad: str = " ") -> Column:
    return F.rpad(col, n, pad)


@register("repeat", "STRING")
def repeat(col, n: int) -> Column:
    return F.repeat(col, n)


@register("splitByString", "STRING")
def split_by_string(sep: str, col) -> Column:
    import re

    return F.split(col, re.escape(sep))


@register("splitByWhitespace", "STRING")
def split_by_whitespace(col) -> Column:
    return F.split(F.trim(col), r"\s+")


@register("match", "STRING")
def match(col, pattern: str) -> Column:
    return col.rlike(pattern)


@register("like", "STRING")
def like(col, pattern: str) -> Column:
    return col.like(pattern)


@register("extract", "STRING")
def extract(col, pattern: str, group: int = 1) -> Column:
    return F.regexp_extract(col, pattern, group)


@register("extractAll", "STRING")
def extract_all(col, pattern: str) -> Column:
    return F.regexp_extract_all(col, F.lit(pattern))


@register("countSubstrings", "STRING")
def count_substrings(col, needle: str) -> Column:
    """Occurrences of a literal substring (reference :8959 area)."""
    import re

    nl = F.length(F.lit(needle))
    return ((F.length(col) - F.length(F.regexp_replace(col, re.escape(needle), ""))) / nl).cast("long")


@register("translate", "STRING")
def translate(col, frm: str, to: str) -> Column:
    return F.translate(col, frm, to)


@register("center", "STRING")
def center(col, width: int, fillchar: str = " ") -> Column:
    """pandas str.center analogue (reference pandas accessor)."""
    total = F.lit(width) - F.length(col)
    lpad_n = F.length(col) + F.floor(total / 2).cast("int")
    return F.when(F.length(col) >= width, col).otherwise(
        F.rpad(F.lpad(col, lpad_n.cast("int"), fillchar), width, fillchar)
    )


@register("zfill", "STRING")
def zfill(col, width: int) -> Column:
    return F.lpad(col, width, "0")


@register("empty", "STRING")
def empty(col) -> Column:
    return F.length(col) == 0


@register("notEmpty", "STRING")
def not_empty(col) -> Column:
    return F.length(col) > 0


@register("format", "STRING")
def format_string(fmt: str, *cols) -> Column:
    return F.format_string(fmt, *cols)


# ---------------------------------------------------------------------------
# DATETIME (reference function_definitions.py:1077-1826)
# ---------------------------------------------------------------------------

register_many(
    "DATETIME",
    {
        "toDate": F.to_date,
        "toDateTime": F.to_timestamp,
        "toYear": F.year,
        "toMonth": F.month,
        "toDayOfMonth": F.dayofmonth,
        "toDayOfYear": F.dayofyear,
        "toHour": F.hour,
        "toMinute": F.minute,
        "toSecond": F.second,
        "toQuarter": F.quarter,
        "toUnixTimestamp": F.unix_timestamp,
        "fromUnixTimestamp": F.from_unixtime,
        "now": F.current_timestamp,
        "today": F.current_date,
        "toLastDayOfMonth": F.last_day,
        "toMonday": lambda c: F.date_sub(F.to_date(c), (F.dayofweek(c) + 5) % 7),
        "addYears": lambda c, n: F.add_months(c, 12 * n),
        "addMonths": F.add_months,
        "addDays": F.date_add,
        "subtractDays": F.date_sub,
        "addHours": lambda c, n: c + F.expr(f"INTERVAL {n} HOURS"),
        "addMinutes": lambda c, n: c + F.expr(f"INTERVAL {n} MINUTES"),
        "addSeconds": lambda c, n: c + F.expr(f"INTERVAL {n} SECONDS"),
        "toStartOfDay": lambda c: F.date_trunc("day", c),
        "toStartOfHour": lambda c: F.date_trunc("hour", c),
        "toStartOfMinute": lambda c: F.date_trunc("minute", c),
        "toStartOfMonth": lambda c: F.date_trunc("month", c),
        "toStartOfQuarter": lambda c: F.date_trunc("quarter", c),
        "toStartOfYear": lambda c: F.date_trunc("year", c),
        "toStartOfWeek": lambda c: F.date_trunc("week", c),
        "formatDateTime": lambda c, fmt: F.date_format(c, _ch_format_to_java(fmt)),
        "dateName": lambda part, c: F.date_format(c, {"year": "yyyy", "month": "MMMM", "weekday": "EEEE"}.get(part, "yyyy")),
        "toTimezone": F.from_utc_timestamp,
        "isLeapYear": lambda c: ((F.year(c) % 4 == 0) & (F.year(c) % 100 != 0)) | (F.year(c) % 400 == 0),
        "makeDate": F.make_date,
    },
)


@register("toDayOfWeek", "DATETIME")
def to_day_of_week(col) -> Column:
    """ISO day-of-week 1=Mon..7=Sun (ClickHouse default; Spark dayofweek is 1=Sun)."""
    return (F.dayofweek(col) + 5) % 7 + 1


@register("toWeek", "DATETIME")
def to_week(col) -> Column:
    return F.weekofyear(col)


@register("dateDiff", "DATETIME")
def date_diff(unit: str, start, end) -> Column:
    """dateDiff('day'|'hour'|..., start, end) (reference :1430)."""
    unit = unit.lower()
    if unit == "day":
        return F.datediff(end, start)
    if unit == "month":
        return F.floor(F.months_between(end, start)).cast("long")
    if unit == "year":
        return (F.year(end) - F.year(start)).cast("long")
    secs = {"second": 1, "minute": 60, "hour": 3600}[unit]
    return ((F.unix_timestamp(end) - F.unix_timestamp(start)) / secs).cast("long")


@register("dateTrunc", "DATETIME")
def date_trunc(unit: str, col) -> Column:
    return F.date_trunc(unit, col)


@register("toYYYYMM", "DATETIME")
def to_yyyymm(col) -> Column:
    return (F.year(col) * 100 + F.month(col)).cast("int")


@register("toYYYYMMDD", "DATETIME")
def to_yyyymmdd(col) -> Column:
    return (F.year(col) * 10000 + F.month(col) * 100 + F.dayofmonth(col)).cast("int")


@register("age", "DATETIME")
def age(unit: str, start, end) -> Column:
    return date_diff(unit, start, end)


# ---------------------------------------------------------------------------
# MATH (reference function_definitions.py:1966-2156,5425-5700,7301-7329)
# ---------------------------------------------------------------------------

register_many(
    "MATH",
    {
        "abs": F.abs,
        "sqrt": F.sqrt,
        "cbrt": F.cbrt,
        "exp": F.exp,
        "log": F.log,
        "ln": F.log,
        "log2": F.log2,
        "log10": F.log10,
        "log1p": F.log1p,
        "expm1": F.expm1,
        "sin": F.sin,
        "cos": F.cos,
        "tan": F.tan,
        "asin": F.asin,
        "acos": F.acos,
        "atan": F.atan,
        "atan2": F.atan2,
        "sinh": F.sinh,
        "cosh": F.cosh,
        "tanh": F.tanh,
        "asinh": F.asinh,
        "acosh": F.acosh,
        "atanh": F.atanh,
        "sign": F.signum,
        "floor": F.floor,
        "ceiling": F.ceil,
        "round": F.round,
        "roundBankers": F.bround,
        "truncate": lambda c, n=0: _trunc(c, n),
        "pow": F.pow,
        "power": F.pow,
        "e": lambda: F.lit(2.718281828459045),
        "pi": lambda: F.lit(3.141592653589793),
        "degrees": F.degrees,
        "radians": F.radians,
        "factorial": F.factorial,
        "gcd": lambda a, b: _gcd(a, b),
        "intDiv": lambda a, b: F.floor(a / b).cast("long"),
        "modulo": lambda a, b: a % b,
        "positiveModulo": F.positive_modulo if hasattr(F, "positive_modulo") else lambda a, b: ((a % b) + b) % b,
        "plus": lambda a, b: a + b,
        "minus": lambda a, b: a - b,
        "multiply": lambda a, b: a * b,
        "divide": lambda a, b: a / b,
        "negate": lambda a: -a,
        "rand": F.rand,
        "randNormal": F.randn,
        "randUniform": lambda lo, hi: F.lit(lo) + F.rand() * (hi - lo),
        "greatest": F.greatest,
        "least": F.least,
        "isFinite": lambda c: ~F.isnan(c) & (F.abs(c) != float("inf")),
        "isInfinite": lambda c: F.abs(c) == float("inf"),
        "isNaN": F.isnan,
        "erf": lambda c: _erf(c),
    },
)


def _trunc(c, n: int = 0) -> Column:
    scale = 10**n
    return (F.floor(F.abs(c) * scale) / scale) * F.signum(c)


def _gcd(a, b) -> Column:
    # Unrolled Euclid as pure Column math (40 iterations covers int64 worst
    # case, Fibonacci-bounded). Stays inside whole-stage codegen — no UDF.
    x, y = F.abs(a.cast("long")), F.abs(b.cast("long"))
    for _ in range(40):
        x, y = F.when(y == 0, x).otherwise(y), F.when(y == 0, F.lit(0)).otherwise(x % y)
    return x


def _erf(c) -> Column:
    """Abramowitz-Stegun 7.1.26 approximation of erf — pure Column math,
    matching the precision class of the reference's engine fn."""
    x = F.abs(c)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return F.signum(c) * (1.0 - poly * F.exp(-x * x))


@register("clip", "MATH")
def clip(col, lo, hi) -> Column:
    """pandas clip / CH clamp: greatest(least(x,hi),lo) (SURVEY.md §2.8-Math)."""
    return F.greatest(F.least(col, F.lit(hi)), F.lit(lo))


# ---------------------------------------------------------------------------
# CONDITIONAL (reference function_definitions.py:2176-2239,7861-7987)
# ---------------------------------------------------------------------------

register_many(
    "CONDITIONAL",
    {
        "if": lambda cond, a, b: F.when(cond, a).otherwise(b),
        "coalesce": F.coalesce,
        "ifNull": lambda a, b: F.coalesce(a, b),
        "nullIf": F.nullif if hasattr(F, "nullif") else lambda a, b: F.when(a == b, F.lit(None)).otherwise(a),
        "isNull": lambda c: c.isNull(),
        "isNotNull": lambda c: c.isNotNull(),
        "assumeNotNull": lambda c: c,
        "toNullable": lambda c: c,
        "nanvl": F.nanvl,
    },
)


@register("multiIf", "CONDITIONAL")
def multi_if(*args) -> Column:
    """multiIf(cond1, v1, cond2, v2, ..., else) (reference :2204)."""
    if len(args) % 2 == 0:
        raise ValueError("multiIf needs odd arg count: cond,val pairs + else")
    out = F.when(args[0], args[1])
    i = 2
    while i + 1 < len(args):
        out = out.when(args[i], args[i + 1])
        i += 2
    return out.otherwise(args[-1])


@register("transform", "CONDITIONAL")
def transform_map(col, from_vals: list, to_vals: list, default=None) -> Column:
    """CH transform(x, [a,b], [1,2], d) — chained when/otherwise."""
    out = None
    for f, t in zip(from_vals, to_vals):
        out = F.when(col == f, F.lit(t)) if out is None else out.when(col == f, F.lit(t))
    return out.otherwise(F.lit(default) if default is not None else col)


# ---------------------------------------------------------------------------
# TYPE_CONVERSION (reference function_definitions.py:7614-7842)
# ---------------------------------------------------------------------------

register_many(
    "TYPE_CONVERSION",
    {
        "toString": lambda c: c.cast(T.StringType()),
        "toFixedString": lambda c, n: F.rpad(c.cast("string"), n, "\0"),
        "toInt8": lambda c: c.cast(T.ByteType()),
        "toInt16": lambda c: c.cast(T.ShortType()),
        "toInt32": lambda c: c.cast(T.IntegerType()),
        "toInt64": lambda c: c.cast(T.LongType()),
        "toUInt8": lambda c: c.cast(T.ShortType()),
        "toUInt16": lambda c: c.cast(T.IntegerType()),
        "toUInt32": lambda c: c.cast(T.LongType()),
        # UInt64 → Decimal(20,0): documents the overflow divergence (SURVEY §1.3)
        "toUInt64": lambda c: c.cast(T.DecimalType(20, 0)),
        "toFloat32": lambda c: c.cast(T.FloatType()),
        "toFloat64": lambda c: c.cast(T.DoubleType()),
        "toDecimal32": lambda c, s: c.cast(T.DecimalType(9, s)),
        "toDecimal64": lambda c, s: c.cast(T.DecimalType(18, s)),
        "toDecimal128": lambda c, s: c.cast(T.DecimalType(38, s)),
        "toBool": lambda c: c.cast(T.BooleanType()),
        "accurateCast": lambda c, t: c.cast(t),
        "toTypeName": lambda c: F.typeof(c) if hasattr(F, "typeof") else F.lit("unknown"),
        "parseDateTimeBestEffort": F.to_timestamp,
    },
)
