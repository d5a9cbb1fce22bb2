"""Registry widening — second batch of reference functions per category.

Fills SURVEY.md §2.8 gaps beyond the core set in scalar.py / collection.py:
case-insensitive & multi-needle string search, UTF8 aliases, char n-grams,
sub-hour time buckets, relative-time numbers, interval arithmetic,
Unix-epoch 64-bit conversions, bit manipulation, OrNull/OrZero cast
families (CH's permissive-cast surface), extended JSON extraction, and IP
string/number conversions.

Everything is a pyspark Column composition (JVM-side); functions whose
natural form is a higher-order lambda (char ngrams) are marked cool-path in
their docstring. Reference anchors: datastore/function_definitions.py
STRING :61-1051, DATETIME :1077-1826, MATH :1966-2156, TYPE_CONVERSION
:7614-7842, JSON :3896-4324, IP :4561-4673.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chdb_spark.functions.registry import register, register_many

# ---------------------------------------------------------------------------
# STRING — batch 2 (reference :61-1051,5709-5875)
# ---------------------------------------------------------------------------


def _ci_instr(haystack, needle) -> Column:
    return F.instr(F.lower(haystack), needle.lower() if isinstance(needle, str) else F.lower(needle))


register_many(
    "STRING",
    {
        "positionCaseInsensitive": _ci_instr,
        "locate": lambda needle, haystack: F.instr(haystack, needle),
        "appendTrailingCharIfAbsent": lambda c, ch: F.when(
            c.endswith(ch), c
        ).otherwise(F.concat(c, F.lit(ch))),
        "substringIndex": F.substring_index,
        "space": lambda n: F.repeat(F.lit(" "), n),
        "lowerUTF8": F.lower,
        "upperUTF8": F.upper,
        "reverseUTF8": F.reverse,
        "substringUTF8": F.substring,
        "leftUTF8": lambda c, n: F.substring(c, 1, n),
        "rightUTF8": lambda c, n: F.substring(c, -n, n),
        "startsWithUTF8": lambda c, p: c.startswith(p),
        "endsWithUTF8": lambda c, s: c.endswith(s),
        "initcapUTF8": F.initcap,
        "concatAssumeInjective": F.concat,
        "countMatches": lambda c, pat: F.regexp_count(c, F.lit(pat)),
        "regexpExtract": F.regexp_extract,
        "notLike": lambda c, pat: ~c.like(pat),
        "ilike": lambda c, pat: c.ilike(pat),
        "notILike": lambda c, pat: ~c.ilike(pat),
        "firstLine": lambda c: F.element_at(F.split(c, "\n"), 1),
        "hasToken": lambda c, tok: F.array_contains(
            F.split(c, r"[^\p{L}\p{N}]+"), tok
        ),
        "normalizeWhitespace": lambda c: F.regexp_replace(F.trim(c), r"\s+", " "),
    },
)


@register("multiSearchAny", "STRING")
def multi_search_any(col, needles: list[str]) -> Column:
    """True if any literal needle occurs (reference multiSearchAny, :500s).
    OR-chain of contains — codegen'd short-circuit, no regex engine."""
    out = F.lit(False)
    for n in needles:
        out = out | col.contains(n)
    return out


@register("multiSearchAnyCaseInsensitive", "STRING")
def multi_search_any_ci(col, needles: list[str]) -> Column:
    return multi_search_any(F.lower(col), [n.lower() for n in needles])


@register("tokens", "STRING")
def tokens_fn(col) -> Column:
    """Split into alphanumeric tokens (CH tokens())."""
    return F.filter(F.split(col, r"[^\p{L}\p{N}]+"), lambda t: F.length(t) > 0)


@register("ngrams", "STRING")
def char_ngrams(col, n: int) -> Column:
    """Character n-grams as array<string> (CH ngrams()). HOF transform —
    cool path; the hot-path token shingles live in operators.dedup."""
    return F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - n + 1, F.lit(1))),
            lambda i: col.substr(i, F.lit(n)),
        ),
        lambda g: F.length(g) == n,
    )


@register("stringJaccardIndex", "STRING")
def string_jaccard_index(a, b) -> Column:
    """Character-set Jaccard similarity (CH stringJaccardIndex, :8990s)."""
    ca = F.array_distinct(F.split(a, ""))
    cb = F.array_distinct(F.split(b, ""))
    inter = F.size(F.array_intersect(ca, cb))
    return inter.cast("double") / F.size(F.array_union(ca, cb))


# ---------------------------------------------------------------------------
# DATETIME — batch 2 (reference :1077-1826)
# ---------------------------------------------------------------------------


def _bucket_seconds(c, secs: int) -> Column:
    return F.timestamp_seconds(F.floor(F.unix_timestamp(c) / secs).cast("long") * secs)


register_many(
    "DATETIME",
    {
        "toStartOfFiveMinutes": lambda c: _bucket_seconds(c, 300),
        "toStartOfTenMinutes": lambda c: _bucket_seconds(c, 600),
        "toStartOfFifteenMinutes": lambda c: _bucket_seconds(c, 900),
        "toStartOfSecond": lambda c: F.date_trunc("second", c),
        "toStartOfInterval": lambda c, secs: _bucket_seconds(c, secs),
        "timeSlot": lambda c: _bucket_seconds(c, 1800),
        "toTime": lambda c: F.date_format(c, "HH:mm:ss"),
        "toISOWeek": F.weekofyear,
        "toRelativeYearNum": F.year,
        "toRelativeMonthNum": lambda c: (F.year(c) * 12 + F.month(c)).cast("long"),
        "toRelativeDayNum": lambda c: F.datediff(F.to_date(c), F.lit("1970-01-01").cast("date")).cast("long"),
        "toRelativeHourNum": lambda c: F.floor(F.unix_timestamp(c) / 3600).cast("long"),
        "toRelativeMinuteNum": lambda c: F.floor(F.unix_timestamp(c) / 60).cast("long"),
        "toRelativeSecondNum": lambda c: F.unix_timestamp(c).cast("long"),
        "addWeeks": lambda c, n: F.date_add(c, 7 * n),
        "subtractWeeks": lambda c, n: F.date_sub(c, 7 * n),
        "addQuarters": lambda c, n: F.add_months(c, 3 * n),
        "subtractQuarters": lambda c, n: F.add_months(c, -3 * n),
        "subtractMonths": lambda c, n: F.add_months(c, -n),
        "subtractYears": lambda c, n: F.add_months(c, -12 * n),
        "subtractHours": lambda c, n: c - F.expr(f"INTERVAL {n} HOURS"),
        "subtractMinutes": lambda c, n: c - F.expr(f"INTERVAL {n} MINUTES"),
        "subtractSeconds": lambda c, n: c - F.expr(f"INTERVAL {n} SECONDS"),
        "monthName": lambda c: F.date_format(c, "MMMM"),
        "dayName": lambda c: F.date_format(c, "EEEE"),
        "yesterday": lambda: F.date_sub(F.current_date(), 1),
        "weekday": lambda c: (F.dayofweek(c) + 5) % 7,  # 0=Mon..6=Sun (CH weekday)
        "toYYYYMMDDhhmmss": lambda c: F.date_format(c, "yyyyMMddHHmmss").cast("long"),
        "fromUnixTimestamp64Milli": F.timestamp_millis,
        "fromUnixTimestamp64Micro": F.timestamp_micros,
        "fromUnixTimestamp64Nano": lambda c: F.timestamp_micros((c / 1000).cast("long")),
        "toUnixTimestamp64Milli": F.unix_millis,
        "toUnixTimestamp64Micro": F.unix_micros,
        "makeDateTime": F.make_timestamp,
        "toDateTime64": F.to_timestamp,
        "timestampDiff": lambda unit, a, b: _datediff_unit(unit, a, b),
        "dateSub": lambda unit, n, c: _date_add_unit(unit, -n, c),
        "dateAdd": lambda unit, n, c: _date_add_unit(unit, n, c),
    },
)


def _datediff_unit(unit: str, start, end) -> Column:
    from chdb_spark.functions.scalar import date_diff

    return date_diff(unit, start, end)


def _date_add_unit(unit: str, n: int, c) -> Column:
    unit = unit.lower()
    if unit == "day":
        return F.date_add(c, n)
    if unit == "week":
        return F.date_add(c, 7 * n)
    if unit == "month":
        return F.add_months(c, n)
    if unit == "quarter":
        return F.add_months(c, 3 * n)
    if unit == "year":
        return F.add_months(c, 12 * n)
    return c + F.expr(f"INTERVAL {n} {unit.upper()}S")


@register("toISOYear", "DATETIME")
def to_iso_year(c) -> Column:
    """ISO-8601 week-numbering year = calendar year of that week's Thursday."""
    iso_dow = (F.dayofweek(c) + 5) % 7 + 1  # 1=Mon..7=Sun
    return F.year(F.date_add(F.to_date(c), (4 - iso_dow).cast("int")))


@register("toYearWeek", "DATETIME")
def to_year_week(c) -> Column:
    return (to_iso_year(c) * 100 + F.weekofyear(c)).cast("int")


# ---------------------------------------------------------------------------
# MATH — batch 2 (reference :1966-2156,5425-5700)
# ---------------------------------------------------------------------------

register_many(
    "MATH",
    {
        "exp2": lambda c: F.pow(F.lit(2.0), c),
        "exp10": lambda c: F.pow(F.lit(10.0), c),
        "intExp2": lambda c: F.pow(F.lit(2.0), c).cast("long"),
        "intExp10": lambda c: F.pow(F.lit(10.0), c).cast("long"),
        "sigmoid": lambda c: 1.0 / (1.0 + F.exp(-c)),
        "hypot": F.hypot,
        "cot": lambda c: F.cos(c) / F.sin(c),
        "moduloOrZero": lambda a, b: F.when(b == 0, F.lit(0)).otherwise(a % b),
        "intDivOrZero": lambda a, b: F.when(b == 0, F.lit(0)).otherwise(
            F.floor(a / b).cast("long")
        ),
        "ifNotFinite": lambda c, alt: F.when(
            F.isnan(c) | (F.abs(c) == float("inf")), alt
        ).otherwise(c),
        "roundToExp2": lambda c: F.pow(F.lit(2.0), F.floor(F.log2(c))),
        "min2": F.least,
        "max2": F.greatest,
        "bitAnd": lambda a, b: a.bitwiseAND(b),
        "bitOr": lambda a, b: a.bitwiseOR(b),
        "bitXor": lambda a, b: a.bitwiseXOR(b),
        "bitNot": F.bitwise_not,
        "bitShiftLeft": F.shiftleft,
        "bitShiftRight": F.shiftright,
        "bitTest": lambda c, n: F.shiftright(c, n).bitwiseAND(F.lit(1)).cast("boolean"),
        "bitCount": F.bit_count,
        "bitHammingDistance": lambda a, b: F.bit_count(a.bitwiseXOR(b)),
    },
)

# ---------------------------------------------------------------------------
# CONDITIONAL / boolean aggregates — batch 2
# ---------------------------------------------------------------------------

register_many(
    "CONDITIONAL",
    {
        "isZeroOrNull": lambda c: c.isNull() | (c == 0),
        "isNotDistinctFrom": lambda a, b: a.eqNullSafe(b),
        "isDistinctFrom": lambda a, b: ~a.eqNullSafe(b),
        "caseWithExpression": lambda c, froms, tos, default: _case_with(c, froms, tos, default),
    },
)


def _case_with(c, froms, tos, default) -> Column:
    out = None
    for f, t in zip(froms, tos):
        out = F.when(c == f, t) if out is None else out.when(c == f, t)
    return out.otherwise(default)


register_many(
    "AGGREGATE",
    {
        "boolAnd": F.bool_and,
        "boolOr": F.bool_or,
        "anyValue": F.any_value,
        "countNull": lambda c: F.count_if(c.isNull()),
    },
    kind="AGGREGATE",
)

# ---------------------------------------------------------------------------
# TYPE_CONVERSION — OrNull / OrZero families (reference :7614-7842)
# CH's permissive casts: toInt32OrNull('x') → NULL, toInt32OrZero('x') → 0.
# Spark's try_cast is the exact analogue for the OrNull family.
# ---------------------------------------------------------------------------

_CAST_TARGETS = {
    "Int8": "tinyint",
    "Int16": "smallint",
    "Int32": "int",
    "Int64": "bigint",
    "UInt8": "smallint",
    "UInt16": "int",
    "UInt32": "bigint",
    "UInt64": "decimal(20,0)",
    "Float32": "float",
    "Float64": "double",
    "Date": "date",
    "DateTime": "timestamp",
}


def _or_null(t: str):
    return lambda c: c.try_cast(t)


def _or_zero(t: str):
    zero = "1970-01-01" if t == "date" else ("1970-01-01 00:00:00" if t == "timestamp" else 0)
    return lambda c: F.coalesce(c.try_cast(t), F.lit(zero).cast(t))


register_many(
    "TYPE_CONVERSION",
    {f"to{name}OrNull": _or_null(t) for name, t in _CAST_TARGETS.items()},
)
register_many(
    "TYPE_CONVERSION",
    {f"to{name}OrZero": _or_zero(t) for name, t in _CAST_TARGETS.items()},
)

register_many(
    "TYPE_CONVERSION",
    {
        "toIntervalSecond": lambda n: F.make_interval(secs=F.lit(n)),
        "toIntervalMinute": lambda n: F.make_interval(mins=F.lit(n)),
        "toIntervalHour": lambda n: F.make_interval(hours=F.lit(n)),
        "toIntervalDay": lambda n: F.make_interval(days=F.lit(n)),
        "toIntervalMonth": lambda n: F.make_interval(months=F.lit(n)),
        "toIntervalYear": lambda n: F.make_interval(years=F.lit(n)),
    },
)

# ---------------------------------------------------------------------------
# JSON — batch 2 (reference :3896-4324)
# ---------------------------------------------------------------------------


def _jp(path: str) -> str:
    return path if path.startswith("$") else f"$.{path}"


register_many(
    "JSON",
    {
        "JSONExtractUInt": lambda c, p: F.get_json_object(c, _jp(p)).cast("long"),
        "JSONExtractArrayRaw": lambda c, p="$": F.from_json(
            F.get_json_object(c, _jp(p)) if p != "$" else c, "array<string>"
        ),
        "JSONArrayLength": lambda c, p="$": F.json_array_length(
            F.get_json_object(c, _jp(p)) if p != "$" else c
        ),
        "JSON_EXISTS": lambda c, p: F.get_json_object(c, p).isNotNull(),
        "JSON_QUERY": lambda c, p: F.get_json_object(c, p),
        "simpleJSONExtractString": lambda c, p: F.get_json_object(c, _jp(p)),
        "simpleJSONExtractInt": lambda c, p: F.get_json_object(c, _jp(p)).cast("long"),
        "simpleJSONExtractFloat": lambda c, p: F.get_json_object(c, _jp(p)).cast("double"),
        "simpleJSONExtractBool": lambda c, p: F.get_json_object(c, _jp(p)).cast("boolean"),
        "simpleJSONExtractRaw": lambda c, p: F.get_json_object(c, _jp(p)),
        "simpleJSONHas": lambda c, p: F.get_json_object(c, _jp(p)).isNotNull(),
        "JSONType": lambda c: F.when(F.trim(c).startswith("{"), "Object")
        .when(F.trim(c).startswith("["), "Array")
        .when(F.trim(c).startswith('"'), "String")
        .when(F.trim(c).isin("true", "false"), "Bool")
        .when(F.trim(c) == "null", "Null")
        .otherwise("Number"),
    },
)

# ---------------------------------------------------------------------------
# IP — string/number conversions (reference :4561-4673)
# ---------------------------------------------------------------------------


@register("IPv4NumToString", "IP")
def ipv4_num_to_string(c) -> Column:
    return F.concat_ws(
        ".",
        F.shiftright(c, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(c, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(c, 8).bitwiseAND(F.lit(255)).cast("string"),
        c.bitwiseAND(F.lit(255)).cast("string"),
    )


@register("IPv4StringToNum", "IP")
def ipv4_string_to_num(c) -> Column:
    p = F.split(c, r"\.")
    return (
        F.element_at(p, 1).cast("long") * 16777216
        + F.element_at(p, 2).cast("long") * 65536
        + F.element_at(p, 3).cast("long") * 256
        + F.element_at(p, 4).cast("long")
    )


_IPV4_RE = r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"


@register("isIPv4String", "IP")
def is_ipv4_string(c) -> Column:
    return c.rlike(_IPV4_RE)


@register("isIPv6String", "IP")
def is_ipv6_string(c) -> Column:
    return c.rlike(r"^[0-9a-fA-F:]+$") & c.contains(":")


@register("IPv4CIDRToRange", "IP")
def ipv4_cidr_to_range(c, prefix: int) -> Column:
    """(lo, hi) struct of the CIDR block over the numeric IPv4 form."""
    mask = F.lit((0xFFFFFFFF << (32 - prefix)) & 0xFFFFFFFF)
    lo = ipv4_string_to_num(c).bitwiseAND(mask)
    hi = lo + F.lit((1 << (32 - prefix)) - 1)
    return F.struct(lo.alias("lo"), hi.alias("hi"))
