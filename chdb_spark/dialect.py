"""ClickHouse-dialect SQL acceptance — rewrite CH SQL text into Spark SQL.

The reference accepts ClickHouse SQL everywhere (``chdb.query(sql)``,
reference chdb/__init__.py:145-217; every README.md example is CH dialect:
``toDate(...)``, ``numbers_mt(1e10)``, ``file("data.parquet", Parquet)``,
``SETTINGS max_threads=4``). Spark SQL is ANSI-ish with different function
names, so a *textual* rewrite layer maps the CH surface onto Spark's:

* function calls → Spark builtins / expression templates (``uniq`` →
  ``approx_count_distinct``, ``toYYYYMM(d)`` → ``CAST(date_format(..))``),
  applied recursively through nested calls;
* parametric aggregates (``quantile(0.5)(x)``, ``quantiles(..)(x)``,
  ``uniqUpTo(n)(x)``, ``groupArray(n)(x)``) → Spark equivalents;
* combinators ``countIf/sumIf/...`` → ``count_if`` / ``CASE WHEN`` forms;
* ``PREWHERE`` → ``WHERE``; table ``FINAL`` modifier and trailing
  ``SETTINGS k=v`` clause are stripped (no-ops here: Spark tables have no
  merge-pending duplicates and thread caps come from the session);
* ``numbers(N)`` / ``numbers_mt(N)`` / ``system.numbers`` → Spark's
  ``range`` table-valued function with the column aliased to ``number``;
* ``file('path', Format)`` / ``url(...)`` / ``Python(var)`` table
  functions → registered temp views (needs a SparkSession — see
  :func:`resolve_table_functions`).

Everything here is driver-side string work on the query text — nothing at
data scale. The rewrite is conservative: only CH-specific names (ones Spark
SQL does not define, or defines identically) are touched, so valid Spark
SQL passes through byte-identical and the layer can sit unconditionally in
front of ``spark.sql``.

Design note (why text, not plans): Spark cannot register Column-builder
expressions as SQL functions from Python (only UDFs, the slow path). A
text-level rewrite keeps every mapped function inside whole-stage codegen —
the resulting query plans are exactly what hand-written Spark SQL produces.
"""

from __future__ import annotations

import re
from typing import Callable

# ---------------------------------------------------------------------------
# lexer helpers
# ---------------------------------------------------------------------------


def _end_of_string(s: str, i: int) -> int:
    """Index just past a quoted token starting at s[i] (handles backslash
    escapes and doubled-quote escapes, both of which CH accepts)."""
    q = s[i]
    j = i + 1
    n = len(s)
    while j < n:
        c = s[j]
        if c == "\\" and q != "`":
            j += 2
            continue
        if c == q:
            if j + 1 < n and s[j + 1] == q:  # doubled-quote escape
                j += 2
                continue
            return j + 1
        j += 1
    return n


def _balanced(s: str, i: int) -> tuple[str, int]:
    """s[i] == '(' — return (inner_text, index_past_close)."""
    depth = 0
    j = i
    n = len(s)
    while j < n:
        c = s[j]
        if c in "'\"`":
            j = _end_of_string(s, j)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[i + 1 : j], j + 1
        j += 1
    raise ValueError(f"unbalanced parentheses in SQL near: {s[i:i+40]!r}")


def _balanced_brackets(s: str, i: int) -> tuple[str, int]:
    """s[i] == '[' — return (inner_text, index_past_close)."""
    depth = 0
    j = i
    n = len(s)
    while j < n:
        c = s[j]
        if c in "'\"`":
            j = _end_of_string(s, j)
            continue
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
            if depth == 0:
                return s[i + 1 : j], j + 1
        j += 1
    raise ValueError(f"unbalanced brackets in SQL near: {s[i:i+40]!r}")


def _split_args(s: str) -> list[str]:
    """Split a call's argument text on top-level commas (paren/bracket/
    string aware). Empty input → []."""
    out: list[str] = []
    depth = 0
    start = 0
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            i = _end_of_string(s, i)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i].strip())
            start = i + 1
        i += 1
    tail = s[start:].strip()
    if tail or out:
        out.append(tail)
    return [a for a in out if a != ""] if out == [""] else out


def _str_lit(arg: str) -> str | None:
    """If ``arg`` is a single single-quoted literal, return its unescaped
    content; else None."""
    a = arg.strip()
    if len(a) >= 2 and a[0] == "'" and _end_of_string(a, 0) == len(a):
        body = a[1:-1]
        return body.replace("\\'", "'").replace("''", "'").replace("\\\\", "\\")
    return None


def _q(s: str) -> str:
    """Re-quote a Python string as a Spark SQL single-quoted literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


# ---------------------------------------------------------------------------
# function templates
# ---------------------------------------------------------------------------

# CH dayofweek: Mon=1..Sun=7; Spark dayofweek: Sun=1..Sat=7.
_DOW = "(((dayofweek({0}) + 5) % 7) + 1)"


def _t(template: str) -> Callable[[list[str]], str]:
    return lambda args: template.format(*args)


def _case_if(agg: str) -> Callable[[list[str]], str]:
    # sumIf(x, cond) → sum(CASE WHEN cond THEN x END)
    return lambda a: f"{agg}(CASE WHEN {a[1]} THEN {a[0]} END)"


def _multi_if(args: list[str]) -> str:
    # multiIf(c1, v1, c2, v2, ..., default)
    parts = ["CASE"]
    i = 0
    while i + 1 < len(args):
        parts.append(f"WHEN {args[i]} THEN {args[i+1]}")
        i += 2
    if i < len(args):
        parts.append(f"ELSE {args[i]}")
    parts.append("END")
    return " ".join(parts)


def _split_by_char(args: list[str]) -> str:
    # splitByChar(sep, s[, limit]) — sep is a literal char; escape for the
    # regex split() takes. Non-literal separators fall back unescaped.
    sep = _str_lit(args[0])
    pat = _q(re.escape(sep)) if sep is not None else args[0]
    return f"split({args[1]}, {pat}{', ' + args[2] if len(args) > 2 else ''})"


def _json_path(args: list[str]) -> str:
    """JSONExtract*(json, 'k1', 'k2', ... ) → '$.k1.k2' path (literal keys;
    integer indices become [i-1] — CH indices are 1-based)."""
    keys = []
    for a in args[1:]:
        lit = _str_lit(a)
        if lit is not None:
            keys.append("." + lit)
        elif re.fullmatch(r"-?\d+", a.strip()):
            keys.append(f"[{int(a) - 1}]")
        else:
            return f"concat('$.', {a})"  # dynamic single key
    return _q("$" + "".join(keys))


def _json_extract(cast: str | None) -> Callable[[list[str]], str]:
    def render(args: list[str]) -> str:
        path = _json_path(args)
        g = f"get_json_object({args[0]}, {path})"
        return f"CAST({g} AS {cast})" if cast else g

    return render


_FMT_DT = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%c": "M", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%i": "mm", "%M": "mm", "%S": "ss", "%s": "ss",
    "%f": "SSSSSS", "%p": "a", "%j": "DDD", "%a": "EEE", "%W": "EEEE",
    "%w": "u", "%F": "yyyy-MM-dd", "%T": "HH:mm:ss", "%D": "MM/dd/yy",
    "%R": "HH:mm", "%%": "%",
}


def _format_datetime(args: list[str]) -> str:
    fmt = _str_lit(args[1])
    if fmt is None:
        return f"date_format({args[0]}, {args[1]})"  # already Java-style?
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            out.append(_FMT_DT.get(fmt[i : i + 2], fmt[i + 1]))
            i += 2
        else:
            # literal text must be quoted in Java datetime patterns
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            chunk = fmt[i:j]
            out.append(chunk if chunk.isalnum() is False and not any(c.isalpha() for c in chunk) else "'" + chunk.replace("'", "''") + "'")
            i = j
    return f"date_format({args[0]}, {_q(''.join(out))})"


def _date_diff(args: list[str]) -> str:
    # dateDiff('unit', start, end) → timestampdiff(UNIT, start, end)
    unit = _str_lit(args[0])
    if unit is None:
        raise ValueError("dateDiff unit must be a string literal")
    return f"timestampdiff({unit.upper()}, {args[1]}, {args[2]})"


def _interval_add(unit: str, sign: str = "+") -> Callable[[list[str]], str]:
    return lambda a: f"({a[0]} {sign} ({a[1]}) * INTERVAL '1' {unit})"


def _ch_format(a: list[str]) -> str:
    """CH ``format('{} x {}', a, b)`` → ``format_string('%s x %s', a, b)``.
    Indexed placeholders (``{0}``) and non-literal formats pass through."""
    lit = _str_lit(a[0])
    if lit is None or re.search(r"\{\d", lit):
        return f"format({', '.join(a)})"
    fmt = lit.replace("%", "%%").replace("{}", "%s")
    return f"format_string({_q(fmt)}, {', '.join(a[1:])})"


def _replace_regexp(args: list[str]) -> str:
    # CH uses re2 \1 backrefs; Java wants $1
    pat = args[2]
    lit = _str_lit(pat)
    if lit is not None:
        pat = _q(re.sub(r"\\(\d)", r"$\1", lit))
    return f"regexp_replace({args[0]}, {args[1]}, {pat})"


#: name → renderer(args)->str. ONLY names Spark SQL does not define (or
#: defines with identical semantics, in which case they are omitted).
_FUNCS: dict[str, Callable[[list[str]], str]] = {
    # -- type conversion -----------------------------------------------------
    "toString": _t("CAST({0} AS STRING)"),
    "toInt8": _t("CAST({0} AS TINYINT)"),
    "toInt16": _t("CAST({0} AS SMALLINT)"),
    "toInt32": _t("CAST({0} AS INT)"),
    "toInt64": _t("CAST({0} AS BIGINT)"),
    "toUInt8": _t("CAST({0} AS SMALLINT)"),
    "toUInt16": _t("CAST({0} AS INT)"),
    "toUInt32": _t("CAST({0} AS BIGINT)"),
    "toUInt64": _t("CAST({0} AS BIGINT)"),
    "toFloat32": _t("CAST({0} AS FLOAT)"),
    "toFloat64": _t("CAST({0} AS DOUBLE)"),
    "toDate": _t("CAST({0} AS DATE)"),
    "toDate32": _t("CAST({0} AS DATE)"),
    "toDateTime": lambda a: f"CAST({a[0]} AS TIMESTAMP)",
    "toDateTime64": lambda a: f"CAST({a[0]} AS TIMESTAMP)",
    "toDecimal32": lambda a: f"CAST({a[0]} AS DECIMAL(9, {a[1]}))",
    "toDecimal64": lambda a: f"CAST({a[0]} AS DECIMAL(18, {a[1]}))",
    "toDecimal128": lambda a: f"CAST({a[0]} AS DECIMAL(38, {a[1]}))",
    "toIntervalDay": _t("(({0}) * INTERVAL '1' DAY)"),
    "toIntervalHour": _t("(({0}) * INTERVAL '1' HOUR)"),
    "parseDateTimeBestEffort": _t("CAST({0} AS TIMESTAMP)"),
    "parseDateTime32BestEffort": _t("CAST({0} AS TIMESTAMP)"),
    "toUnixTimestamp": _t("unix_timestamp({0})"),
    "toUnixTimestamp64Milli": _t("(unix_timestamp({0}) * 1000)"),
    "toUnixTimestamp64Micro": _t("(unix_timestamp({0}) * 1000000)"),
    "fromUnixTimestamp": _t("timestamp_seconds({0})"),
    "reinterpretAsUInt64": _t("CAST({0} AS BIGINT)"),
    "toFixedString": _t("rpad({0}, {1}, chr(0))"),
    "toTypeName": _t("typeof({0})"),
    "accurateCast": lambda a: f"CAST({a[0]} AS {_str_lit(a[1]) or a[1]})",
    # -- date parts ----------------------------------------------------------
    "toYear": _t("year({0})"),
    "toMonth": _t("month({0})"),
    "toDayOfMonth": _t("day({0})"),
    "toDayOfWeek": _t(_DOW),
    "toDayOfYear": _t("dayofyear({0})"),
    "toHour": _t("hour({0})"),
    "toMinute": _t("minute({0})"),
    "toSecond": _t("second({0})"),
    "toQuarter": _t("quarter({0})"),
    "toISOWeek": _t("weekofyear({0})"),
    "toWeek": _t("weekofyear({0})"),
    "toYYYYMM": _t("CAST(date_format({0}, 'yyyyMM') AS INT)"),
    "toYYYYMMDD": _t("CAST(date_format({0}, 'yyyyMMdd') AS INT)"),
    "toYYYYMMDDhhmmss": _t("CAST(date_format({0}, 'yyyyMMddHHmmss') AS BIGINT)"),
    "toStartOfYear": _t("trunc({0}, 'YEAR')"),
    "toStartOfQuarter": _t("trunc({0}, 'QUARTER')"),
    "toStartOfMonth": _t("trunc({0}, 'MM')"),
    "toMonday": _t("trunc({0}, 'WEEK')"),
    "toStartOfWeek": _t("date_sub({0}, dayofweek({0}) - 1)"),
    "toStartOfDay": _t("date_trunc('DAY', {0})"),
    "toStartOfHour": _t("date_trunc('HOUR', {0})"),
    "toStartOfMinute": _t("date_trunc('MINUTE', {0})"),
    "toStartOfSecond": _t("date_trunc('SECOND', {0})"),
    "toStartOfFiveMinutes": _t("timestamp_seconds(floor(unix_timestamp({0}) / 300) * 300)"),
    "toStartOfTenMinutes": _t("timestamp_seconds(floor(unix_timestamp({0}) / 600) * 600)"),
    "toStartOfFifteenMinutes": _t("timestamp_seconds(floor(unix_timestamp({0}) / 900) * 900)"),
    "toTime": _t("date_format({0}, 'HH:mm:ss')"),
    "now": lambda a: "current_timestamp()",
    "now64": lambda a: "current_timestamp()",
    "today": lambda a: "current_date()",
    "yesterday": lambda a: "date_sub(current_date(), 1)",
    "addYears": _t("add_months({0}, ({1}) * 12)"),
    "addMonths": _t("add_months({0}, {1})"),
    "addWeeks": _t("date_add({0}, ({1}) * 7)"),
    "addDays": _t("date_add({0}, {1})"),
    "addHours": _interval_add("HOUR"),
    "addMinutes": _interval_add("MINUTE"),
    "addSeconds": _interval_add("SECOND"),
    "subtractYears": _t("add_months({0}, -(({1}) * 12))"),
    "subtractMonths": _t("add_months({0}, -({1}))"),
    "subtractWeeks": _t("date_sub({0}, ({1}) * 7)"),
    "subtractDays": _t("date_sub({0}, {1})"),
    "subtractHours": _interval_add("HOUR", "-"),
    "subtractMinutes": _interval_add("MINUTE", "-"),
    "subtractSeconds": _interval_add("SECOND", "-"),
    "dateDiff": _date_diff,
    "date_diff": _date_diff,
    "dateAdd": lambda a: (
        f"timestampadd({(_str_lit(a[0]) or a[0]).upper()}, {a[1]}, {a[2]})"
        if len(a) == 3
        else f"date_add({a[0]}, {a[1]})"
    ),
    "dateSub": lambda a: (
        f"timestampadd({(_str_lit(a[0]) or a[0]).upper()}, -({a[1]}), {a[2]})"
        if len(a) == 3
        else f"date_sub({a[0]}, {a[1]})"
    ),
    "dateName": _t("date_format({0}, 'MMMM')"),
    "monthName": _t("date_format({0}, 'MMMM')"),
    "formatDateTime": _format_datetime,
    "toRelativeDayNum": _t("datediff({0}, DATE '1970-01-01')"),
    "toRelativeHourNum": _t("floor(unix_timestamp({0}) / 3600)"),
    # -- strings -------------------------------------------------------------
    "lowerUTF8": _t("lower({0})"),
    "upperUTF8": _t("upper({0})"),
    "lengthUTF8": _t("char_length({0})"),
    "char_length": _t("char_length({0})"),
    "empty": _t("(length({0}) = 0)"),
    "notEmpty": _t("(length({0}) > 0)"),
    "position": lambda a: f"instr({a[0]}, {a[1]})" if len(a) == 2 else f"position({', '.join(a)})",
    "positionCaseInsensitive": _t("instr(lower({0}), lower({1}))"),
    "positionUTF8": _t("instr({0}, {1})"),
    "startsWith": _t("startswith({0}, {1})"),
    "endsWith": _t("endswith({0}, {1})"),
    "trimBoth": _t("trim({0})"),
    "trimLeft": _t("ltrim({0})"),
    "trimRight": _t("rtrim({0})"),
    "substringUTF8": _t("substring({0}, {1}, {2})"),
    "concatWithSeparator": lambda a: f"concat_ws({', '.join(a)})",
    "splitByChar": _split_by_char,
    "splitByString": _split_by_char,
    "arrayStringConcat": lambda a: f"array_join({a[0]}, {a[1] if len(a) > 1 else _q('')})",
    "replaceAll": _t("replace({0}, {1}, {2})"),
    "replaceOne": _t(
        "(CASE WHEN instr({0}, {1}) > 0 THEN concat("
        "substr({0}, 1, instr({0}, {1}) - 1), {2}, "
        "substr({0}, instr({0}, {1}) + length({1}))) ELSE {0} END)"
    ),
    "format": lambda a: _ch_format(a),
    "replaceRegexpAll": _replace_regexp,
    "replaceRegexpOne": _replace_regexp,
    # CH spells the alias in caps with re2 \1 backrefs (ClickBench Q28);
    # Spark's native regexp_replace wants $1 — route through the converter
    "REGEXP_REPLACE": _replace_regexp,
    "match": _t("({0} RLIKE {1})"),
    "extractAll": _t("regexp_extract_all({0}, {1}, 0)"),
    "countMatches": _t("size(regexp_extract_all({0}, {1}, 0))"),
    "multiSearchAny": lambda a: (
        "(" + " OR ".join(f"contains({a[0]}, {x})" for x in _split_args(a[1].strip()[1:-1])) + ")"
        if a[1].strip().startswith("[")
        else f"exists({a[1]}, _n -> contains({a[0]}, _n))"
    ),
    "leftPad": _t("lpad({0}, {1}, {2})"),
    "rightPad": _t("rpad({0}, {1}, {2})"),
    "base64Encode": _t("base64({0})"),
    "base64Decode": _t("CAST(unbase64({0}) AS STRING)"),
    "tryBase64Decode": _t("CAST(unbase64({0}) AS STRING)"),
    "appendTrailingCharIfAbsent": _t("(CASE WHEN endswith({0}, {1}) THEN {0} ELSE concat({0}, {1}) END)"),
    "caseWithExpression": _multi_if,
    # -- conditionals / null handling ---------------------------------------
    "multiIf": _multi_if,
    "assumeNotNull": _t("{0}"),
    "toNullable": _t("{0}"),
    "isNull": _t("({0} IS NULL)"),
    "isNotNull": _t("({0} IS NOT NULL)"),
    "isFinite": _t("(NOT isnan({0}) AND ABS({0}) != double('inf'))"),
    "isInfinite": _t("(ABS({0}) = double('inf'))"),
    "isNaN": _t("isnan({0})"),
    # -- math ----------------------------------------------------------------
    "intDiv": _t("({0} DIV {1})"),
    "intDivOrZero": _t("(CASE WHEN ({1}) = 0 THEN 0 ELSE {0} DIV {1} END)"),
    "modulo": _t("({0} % {1})"),
    "moduloOrZero": _t("(CASE WHEN ({1}) = 0 THEN 0 ELSE ({0}) % ({1}) END)"),
    "plus": _t("({0} + {1})"),
    "minus": _t("({0} - {1})"),
    "multiply": _t("({0} * {1})"),
    "divide": _t("(({0}) / ({1}))"),
    "negate": _t("(-({0}))"),
    "equals": _t("({0} = {1})"),
    "notEquals": _t("({0} != {1})"),
    "less": _t("({0} < {1})"),
    "greater": _t("({0} > {1})"),
    "lessOrEquals": _t("({0} <= {1})"),
    "greaterOrEquals": _t("({0} >= {1})"),
    "roundBankers": lambda a: f"bround({a[0]}, {a[1] if len(a) > 1 else 0})",
    # floor/ceil: Spark's own floor(expr[, scale])/ceil(expr[, scale])
    # already match CH's two-arg decimal forms — no mapping needed.
    "trunc": lambda a: f"CAST({a[0]} AS BIGINT)" if len(a) == 1 else f"trunc({a[0]}, {a[1]})",
    "truncate": lambda a: f"CAST({a[0]} AS BIGINT)" if len(a) == 1 else f"trunc({a[0]}, {a[1]})",
    "exp2": _t("pow(2, {0})"),
    "exp10": _t("pow(10, {0})"),
    "intExp2": _t("CAST(pow(2, {0}) AS BIGINT)"),
    "intExp10": _t("CAST(pow(10, {0}) AS BIGINT)"),
    "log1p": _t("log1p({0})"),
    "sign": _t("sign({0})"),
    "bitAnd": _t("({0} & {1})"),
    "bitOr": _t("({0} | {1})"),
    "bitXor": _t("({0} ^ {1})"),
    "bitNot": _t("(~{0})"),
    "bitShiftLeft": _t("shiftleft({0}, {1})"),
    "bitShiftRight": _t("shiftright({0}, {1})"),
    "bitCount": _t("bit_count({0})"),
    "rand": lambda a: "CAST(floor(rand() * 4294967296) AS BIGINT)",
    "rand64": lambda a: "CAST(floor(rand() * 9.223372036854776e18) AS BIGINT)",
    "randCanonical": lambda a: "rand()",
    # -- aggregates ----------------------------------------------------------
    # CH allows bare count() for count(*) (examples.md uses it throughout)
    "count": lambda a: "count(*)" if not a else f"count({', '.join(a)})",
    "uniq": lambda a: f"approx_count_distinct({', '.join(a)})",
    "uniqExact": lambda a: f"count(DISTINCT {', '.join(a)})",
    "uniqCombined": lambda a: f"approx_count_distinct({', '.join(a)})",
    "uniqCombined64": lambda a: f"approx_count_distinct({', '.join(a)})",
    "uniqHLL12": lambda a: f"approx_count_distinct({', '.join(a)})",
    "uniqTheta": lambda a: f"approx_count_distinct({', '.join(a)})",
    "countIf": _t("count_if({0})"),
    "sumIf": _case_if("sum"),
    "avgIf": _case_if("avg"),
    "minIf": _case_if("min"),
    "maxIf": _case_if("max"),
    "anyIf": lambda a: f"any_value(CASE WHEN {a[1]} THEN {a[0]} END, true)",
    # -- -State / -Merge / -SimpleState combinators ---------------------------
    # The AggregatingMergeTree pre-aggregation pattern (reference
    # datastore/core.py:6004 — "AggregatingMergeTree() together with -State
    # aggregate functions in the SELECT"): <f>State builds a mergeable
    # partial, <f>Merge re-aggregates partials. CH serializes states as
    # opaque binaries; here each state is a PLAIN-VALUE representation
    # (sum partial = the running sum, avg partial = struct<s,c>, uniqExact
    # partial = a set, uniq partial = an HLL sketch via Spark's
    # hll_sketch_agg) — State→Merge round-trips inside this engine are
    # exact/semantically identical, byte-compat with a CH server's states is
    # out of scope (ledgered). operators/rollup.py is the DataFrame-level
    # counterpart of the same algebra.
    "countState": lambda a: f"count({', '.join(a)})" if a else "count(*)",
    "sumState": _t("sum({0})"),
    "minState": _t("min({0})"),
    "maxState": _t("max({0})"),
    "anyState": _t("any_value({0}, true)"),
    "avgState": _t("named_struct('s', sum({0}), 'c', count({0}))"),
    "uniqExactState": _t("collect_set({0})"),
    "uniqState": _t("hll_sketch_agg({0})"),
    "countMerge": _t("sum({0})"),
    "sumMerge": _t("sum({0})"),
    "minMerge": _t("min({0})"),
    "maxMerge": _t("max({0})"),
    "anyMerge": _t("any_value({0}, true)"),
    "avgMerge": _t("(CAST(sum({0}.s) AS DOUBLE) / sum({0}.c))"),
    "uniqExactMerge": _t(
        "CAST(size(array_distinct(flatten(collect_list({0})))) AS BIGINT)"
    ),
    "uniqMerge": _t("hll_sketch_estimate(hll_union_agg({0}))"),
    "groupArrayState": _t("collect_list({0})"),
    "groupArrayMerge": _t("flatten(collect_list({0}))"),
    "groupUniqArrayState": _t("collect_set({0})"),
    "groupUniqArrayMerge": _t("array_distinct(flatten(collect_list({0})))"),
    # -SimpleState (SimpleAggregateFunction columns): the state IS the value
    "sumSimpleState": _t("sum({0})"),
    "minSimpleState": _t("min({0})"),
    "maxSimpleState": _t("max({0})"),
    "anySimpleState": _t("any_value({0}, true)"),
    # -- -Array combinator: aggregate over ALL elements of an array column --
    # Per-row reduce stays inside codegen (no explode → no row blowup);
    # sums accumulate as DOUBLE for any numeric element type (CH keeps the
    # element's own sum type — ledgered divergence); uniqArray is EXACT
    # here (CH's is a sketch).
    "sumArray": _t(
        "sum(aggregate({0}, CAST(0 AS DOUBLE), (acc, e) -> acc + CAST(e AS DOUBLE)))"
    ),
    # NULL arrays contribute to NEITHER side: the numerator's aggregate()
    # yields NULL (skipped by sum), and legacy size(NULL) = -1 would
    # silently skew the denominator, so it is guarded to 0 there.
    "avgArray": _t(
        "(sum(aggregate({0}, CAST(0 AS DOUBLE), (acc, e) -> acc + CAST(e AS DOUBLE)))"
        " / sum(if({0} IS NULL, 0, size({0}))))"
    ),
    "minArray": _t("min(array_min({0}))"),
    "maxArray": _t("max(array_max({0}))"),
    "uniqArray": _t(
        "CAST(size(array_distinct(flatten(collect_list({0})))) AS BIGINT)"
    ),
    # -- -OrNull combinator: NULL (not the type default) on an empty set --
    # Spark aggregates already return NULL on empty/all-NULL input, so most
    # map to the plain form; count is the exception (0 → NULL).
    "sumOrNull": _t("sum({0})"),
    "avgOrNull": _t("avg({0})"),
    "minOrNull": _t("min({0})"),
    "maxOrNull": _t("max({0})"),
    "anyOrNull": _t("any_value({0}, true)"),
    "countOrNull": lambda a: (
        f"nullif(count({', '.join(a)}), 0)" if a else "nullif(count(*), 0)"
    ),
    "argMin": lambda a: f"min_by({a[0]}, {a[1]})",
    "argMax": lambda a: f"max_by({a[0]}, {a[1]})",
    "anyLast": _t("last({0})"),
    "anyHeavy": _t("mode({0})"),
    "avgWeighted": _t("(sum(({0}) * ({1})) / sum({1}))"),
    "median": _t("percentile_approx({0}, 0.5)"),
    "medianExact": _t("percentile({0}, 0.5)"),
    "stddevPop": _t("stddev_pop({0})"),
    "stddevSamp": _t("stddev_samp({0})"),
    "varPop": _t("var_pop({0})"),
    "varSamp": _t("var_samp({0})"),
    "covarPop": _t("covar_pop({0}, {1})"),
    "covarSamp": _t("covar_samp({0}, {1})"),
    "skewPop": _t("skewness({0})"),
    "kurtPop": _t("kurtosis({0})"),
    "groupArray": lambda a: f"collect_list({a[0]})",
    "groupUniqArray": lambda a: f"collect_set({a[0]})",
    "groupBitAnd": _t("bit_and({0})"),
    "groupBitOr": _t("bit_or({0})"),
    "groupBitXor": _t("bit_xor({0})"),
    "groupArrayArray": _t("flatten(collect_list({0}))"),
    "sumDistinct": _t("sum(DISTINCT {0})"),
    "avgDistinct": _t("avg(DISTINCT {0})"),
    "deltaSum": _t("(max({0}) - min({0}))"),
    "boundingRatio": _t("((max({0}) - min({0})) / nullif(max({1}) - min({1}), 0))"),
    # -- arrays --------------------------------------------------------------
    "arrayJoin": _t("explode({0})"),
    "has": _t("array_contains({0}, {1})"),
    "hasAny": _t("arrays_overlap({0}, {1})"),
    "hasAll": _t("(size(array_except({1}, {0})) = 0)"),
    "indexOf": _t("coalesce(array_position({0}, {1}), 0)"),
    "arrayConcat": lambda a: f"concat({', '.join(a)})",
    "arrayElement": _t("element_at({0}, {1})"),
    "arraySlice": lambda a: f"slice({', '.join(a)})",
    "arrayUniq": _t("size(array_distinct({0}))"),
    "arrayDistinct": _t("array_distinct({0})"),
    "arraySort": lambda a: f"array_sort({a[0]})" if len(a) == 1 else f"array_sort({a[1]}, (l, r) -> CASE WHEN ({a[0]})(l) < ({a[0]})(r) THEN -1 WHEN ({a[0]})(l) > ({a[0]})(r) THEN 1 ELSE 0 END)",
    "arrayReverse": _t("reverse({0})"),
    "arrayReverseSort": lambda a: f"reverse(array_sort({a[0]}))",
    "arrayFlatten": _t("flatten({0})"),
    "arrayZip": lambda a: f"arrays_zip({', '.join(a)})",
    "arrayMap": lambda a: f"transform({a[1]}, {a[0]})",
    "arrayFilter": lambda a: f"filter({a[1]}, {a[0]})",
    "arrayExists": lambda a: f"exists({a[1]}, {a[0]})" if len(a) == 2 else f"exists({a[0]}, x -> x != 0)",
    "arrayAll": lambda a: f"forall({a[1]}, {a[0]})" if len(a) == 2 else f"forall({a[0]}, x -> x != 0)",
    "arrayCount": lambda a: f"size(filter({a[1]}, {a[0]}))" if len(a) == 2 else f"size(filter({a[0]}, x -> x != 0))",
    "arraySum": lambda a: f"aggregate({a[0]}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)" if len(a) == 1 else f"aggregate({a[1]}, CAST(0 AS DOUBLE), (acc, x) -> acc + ({a[0]})(x))",
    "arrayAvg": _t("(aggregate({0}, CAST(0 AS DOUBLE), (acc, x) -> acc + x) / size({0}))"),
    "arrayMin": _t("array_min({0})"),
    "arrayMax": _t("array_max({0})"),
    "arrayCompact": _t("array_distinct({0})"),
    "arrayPushBack": lambda a: f"concat({a[0]}, array({a[1]}))",
    "arrayPushFront": lambda a: f"concat(array({a[1]}), {a[0]})",
    "arrayPopBack": _t("slice({0}, 1, size({0}) - 1)"),
    "arrayPopFront": _t("slice({0}, 2, size({0}) - 1)"),
    "arrayIntersect": lambda a: f"array_intersect({a[0]}, {a[1]})",
    "arrayResize": lambda a: f"slice(concat({a[0]}, array_repeat({a[2] if len(a) > 2 else 'NULL'}, {a[1]})), 1, {a[1]})",
    "arrayEnumerate": _t("sequence(1, size({0}))"),
    "emptyArrayString": lambda a: "array()",
    "emptyArrayInt32": lambda a: "array()",
    "length_array": _t("size({0})"),
    # -- json ----------------------------------------------------------------
    "JSONExtractString": _json_extract(None),
    "JSONExtractRaw": _json_extract(None),
    "JSONExtractInt": _json_extract("BIGINT"),
    "JSONExtractUInt": _json_extract("BIGINT"),
    "JSONExtractFloat": _json_extract("DOUBLE"),
    "JSONExtractBool": _json_extract("BOOLEAN"),
    "JSONHas": lambda a: f"(get_json_object({a[0]}, {_json_path(a)}) IS NOT NULL)",
    "simpleJSONExtractString": _json_extract(None),
    "simpleJSONExtractInt": _json_extract("BIGINT"),
    "simpleJSONExtractFloat": _json_extract("DOUBLE"),
    "simpleJSONHas": lambda a: f"(get_json_object({a[0]}, {_json_path(a)}) IS NOT NULL)",
    "visitParamExtractString": _json_extract(None),
    "JSONExtract": lambda a: (
        # last arg is the CH result type: JSONExtract(j, k..., 'Int64')
        f"CAST(get_json_object({a[0]}, {_json_path(a[:-1])}) AS "
        f"{_CH_DDL_TYPES.get(_str_lit(a[-1]) or '', _str_lit(a[-1]) or 'STRING')})"
    ),
    "JSONExtractArrayRaw": lambda a: (
        # array of raw JSON element strings (scalar elements lose their
        # surrounding quotes vs CH — documented approximation)
        f"from_json(get_json_object({a[0]}, {_json_path(a)}), 'array<string>')"
    ),
    "JSONType": lambda a: (
        f"CASE WHEN get_json_object({a[0]}, {_json_path(a)}) IS NULL THEN 'Null' "
        f"WHEN get_json_object({a[0]}, {_json_path(a)}) RLIKE '^\\\\{{' THEN 'Object' "
        f"WHEN get_json_object({a[0]}, {_json_path(a)}) RLIKE '^\\\\[' THEN 'Array' "
        f"WHEN get_json_object({a[0]}, {_json_path(a)}) IN ('true', 'false') THEN 'Bool' "
        f"WHEN get_json_object({a[0]}, {_json_path(a)}) RLIKE '^-?[0-9]+$' THEN 'Int64' "
        f"WHEN get_json_object({a[0]}, {_json_path(a)}) RLIKE '^-?[0-9.eE+-]+$' THEN 'Double' "
        "ELSE 'String' END"
    ),
    "toJSONString": _t("to_json({0})"),
    "JSONExtractKeys": _t("json_object_keys({0})"),
    "JSONLength": _t("json_array_length({0})"),
    "isValidJSON": _t("(get_json_object({0}, '$') IS NOT NULL)"),
    # -- hash / url / misc ---------------------------------------------------
    # Hash-name parity note: CH's cityHash64/sipHash64 exact values are not
    # reproducible without the native implementations; xxhash64 preserves
    # the contract that matters for dedup/bucketing (stable 64-bit spread).
    "cityHash64": lambda a: f"xxhash64({', '.join(a)})",
    "sipHash64": lambda a: f"xxhash64({', '.join(a)})",
    "farmHash64": lambda a: f"xxhash64({', '.join(a)})",
    "intHash64": _t("xxhash64({0})"),
    "halfMD5": _t("CAST(conv(substring(md5({0}), 1, 16), 16, 10) AS BIGINT)"),
    "MD5": _t("md5({0})"),
    "SHA256": _t("sha2({0}, 256)"),
    "SHA1": _t("sha1({0})"),
    "URLHash": _t("xxhash64({0})"),
    "domain": _t("parse_url({0}, 'HOST')"),
    "domainWithoutWWW": _t("regexp_replace(parse_url({0}, 'HOST'), '^www\\\\.', '')"),
    "topLevelDomain": _t("regexp_extract(parse_url({0}, 'HOST'), '\\\\.([^.]+)$', 1)"),
    "protocol": _t("parse_url({0}, 'PROTOCOL')"),
    "path_url": _t("parse_url({0}, 'PATH')"),
    "pathFull": _t("concat(parse_url({0}, 'PATH'), coalesce(concat('?', parse_url({0}, 'QUERY')), ''))"),
    "queryString": _t("parse_url({0}, 'QUERY')"),
    "extractURLParameter": _t("parse_url({0}, 'QUERY', {1})"),
    "cutQueryString": _t("regexp_replace({0}, '\\\\?.*$', '')"),
    "generateUUIDv4": lambda a: "uuid()",
    "currentDatabase": lambda a: "current_database()",
    "currentUser": lambda a: "current_user()",
    "hostName": lambda a: "'localhost'",
    "version": lambda a: "'24.5.1-chdb-spark'",
    "tuple": lambda a: f"struct({', '.join(a)})",
    "greatCircleDistance": _t(
        "(2 * 6371000 * asin(sqrt(pow(sin(radians(({3}) - ({1})) / 2), 2) "
        "+ cos(radians({1})) * cos(radians({3})) * pow(sin(radians(({2}) - ({0})) / 2), 2))))"
    ),
    "transform_ch": _multi_if,
    "ifNotFinite": _t("(CASE WHEN isnan({0}) OR ABS({0}) = double('inf') THEN {1} ELSE {0} END)"),
    "runningDifference": _t("({0} - lag({0}, 1, 0) OVER (ORDER BY monotonically_increasing_id()))"),
}

# CH `path(url)` clashes with nothing in Spark, but keep the key distinct
_FUNCS["path"] = _FUNCS.pop("path_url")


# ---------------------------------------------------------------------------
# hand-written tail templates (VERDICT r4 item 1) — CH names the generated
# pass (chdb_spark/dialect_gen.py) cannot derive mechanically: lambda-first
# HOFs (CH puts the lambda argument FIRST; Spark puts the collection first),
# literal type/unit parameters, and operator forms.
# ---------------------------------------------------------------------------

_CH_TYPE_SQL = {
    "int8": "TINYINT", "int16": "SMALLINT", "int32": "INT", "int64": "BIGINT",
    "uint8": "SMALLINT", "uint16": "INT", "uint32": "BIGINT", "uint64": "BIGINT",
    "float32": "FLOAT", "float64": "DOUBLE", "string": "STRING", "bool": "BOOLEAN",
    "date": "DATE", "date32": "DATE", "datetime": "TIMESTAMP",
    "datetime64": "TIMESTAMP",
}


def _cast_2arg(fn: str) -> Callable[[list[str]], str]:
    """CAST(x, 'Type') / accurateCastOrNull(x, 'Type') — CH's 2-arg cast
    forms with a ClickHouse type-name literal. The native CAST(x AS T)
    parses as ONE argument (contains ' AS ') and passes through."""

    def render(a: list[str]) -> str:
        if len(a) == 1:  # CAST(x AS T) — already Spark syntax
            return f"CAST({a[0]})"
        t = _str_lit(a[1]) or a[1]
        spark_t = _CH_TYPE_SQL.get(t.strip().lower(), t)
        if fn == "try":
            return f"try_cast({a[0]} AS {spark_t})"
        if fn == "default":
            return f"coalesce(try_cast({a[0]} AS {spark_t}), {a[2]})"
        return f"CAST({a[0]} AS {spark_t})"

    return render


def _array_reduce(a: list[str]) -> str:
    """arrayReduce('aggName', arr) — the common agg names over an array."""
    agg = (_str_lit(a[0]) or "").lower()
    arr = a[1]
    forms = {
        "sum": f"aggregate({arr}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)",
        "max": f"array_max({arr})",
        "min": f"array_min({arr})",
        "avg": f"(aggregate({arr}, CAST(0 AS DOUBLE), (acc, x) -> acc + x) / size({arr}))",
        "count": f"size({arr})",
        "any": f"get({arr}, 0)",
        "uniq": f"size(array_distinct({arr}))",
        "uniqexact": f"size(array_distinct({arr}))",
    }
    if agg not in forms:
        raise ValueError(f"arrayReduce: unsupported aggregate {agg!r}")
    return forms[agg]


def _ch_extract(a: list[str]) -> str:
    # SQL EXTRACT(YEAR FROM ts) arrives as ONE arg containing FROM —
    # passthrough; CH extract(haystack, re) is the 2-arg regex form.
    # CH returns the FIRST capture group when the pattern has one
    # (extract(s, 'id=(\\d+)') → '123', not 'id=123'), else the whole
    # match — inspect the pattern literal for an unescaped '(' that is
    # not a non-capturing '(?' (ADVICE r5).
    if len(a) == 1:
        return f"extract({a[0]})"
    group = 0
    lit = _str_lit(a[1])
    if lit is not None and re.search(r"(?<!\\)\((?!\?)", lit):
        group = 1
    return f"regexp_extract({a[0]}, {a[1]}, {group})"


def _ch_transform(a: list[str]) -> str:
    # CH transform(x, from_array, to_array[, default]) — value lookup, NOT
    # Spark's transform(arr, lambda) (2 args, passthrough)
    if len(a) == 2:
        return f"transform({a[0]}, {a[1]})"
    default = a[3] if len(a) > 3 else a[0]
    return f"coalesce(element_at(map_from_arrays({a[1]}, {a[2]}), {a[0]}), {default})"


_FUNCS.update(
    {
        # operator forms
        "like": _t("({0} LIKE {1})"),
        "notLike": _t("({0} NOT LIKE {1})"),
        "ilike": _t("({0} ILIKE {1})"),
        "notILike": _t("(NOT ({0} ILIKE {1}))"),
        # 2-arg cast family
        "CAST": _cast_2arg("strict"),
        "accurateCastOrNull": _cast_2arg("try"),
        "accurateCastOrDefault": _cast_2arg("default"),
        "reinterpret": _cast_2arg("strict"),
        "toDecimal256": lambda a: f"CAST({a[0]} AS DECIMAL(38, {a[1]}))",
        "toDecimalString": lambda a: f"CAST(CAST({a[0]} AS DECIMAL(38, {a[1]})) AS STRING)",
        # bit ops
        "bitTest": _t("((CAST({0} AS BIGINT) >> CAST({1} AS INT)) & 1)"),
        "bitRotateLeft": _t(
            "(shiftleft(CAST({0} AS BIGINT), {1}) | shiftrightunsigned(CAST({0} AS BIGINT), 64 - ({1})))"
        ),
        "bitRotateRight": _t(
            "(shiftrightunsigned(CAST({0} AS BIGINT), {1}) | shiftleft(CAST({0} AS BIGINT), 64 - ({1})))"
        ),
        # string search
        "countSubstrings": _t(
            "CAST((length({0}) - length(replace({0}, {1}, ''))) / length({1}) AS INT)"
        ),
        "multiMatchAny": _t("exists({1}, p -> {0} RLIKE p)"),
        "multiMatchAnyIndex": _t(
            "coalesce(nullif(array_position(transform({1}, p -> {0} RLIKE p), true), 0), 0)"
        ),
        "multiSearchAllPositions": _t(
            "transform({1}, p -> CAST(locate(p, {0}) AS BIGINT))"
        ),
        "multiSearchFirstIndex": _t(
            "coalesce(nullif(array_position(transform({1}, p -> locate(p, {0}) > 0), true), 0), 0)"
        ),
        "multiSearchFirstPosition": _t(
            "coalesce(array_min(filter(transform({1}, p -> CAST(locate(p, {0}) AS BIGINT)), x -> x > 0)), 0)"
        ),
        "extract": _ch_extract,
        "regexpExtract": lambda a: (
            f"regexp_extract({a[0]}, {a[1]}, {a[2] if len(a) > 2 else 1})"
        ),
        # lambda-first HOFs (CH argument order: lambda, collection)
        "arrayFirst": _t("get(filter({1}, {0}), 0)"),
        "arrayLast": _t(
            "(CASE WHEN size(filter({1}, {0})) > 0 THEN element_at(filter({1}, {0}), -1) END)"
        ),
        "arrayFirstIndex": _t(
            "coalesce(nullif(array_position(transform({1}, {0}), true), 0), 0)"
        ),
        "arrayLastIndex": _t(
            "(CASE WHEN array_position(reverse(transform({1}, {0})), true) IS NULL "
            "OR array_position(reverse(transform({1}, {0})), true) = 0 THEN 0 "
            "ELSE size({1}) - array_position(reverse(transform({1}, {0})), true) + 1 END)"
        ),
        "arrayFold": _t("aggregate({1}, {2}, {0})"),
        "arrayReduce": _array_reduce,
        "mapFilter": _t("map_filter({1}, {0})"),
        "mapExists": _t("(cardinality(map_filter({1}, {0})) > 0)"),
        "mapAll": _t("(cardinality(map_filter({1}, {0})) = cardinality({1}))"),
        # CH transform = value remap (Spark's transform passes through at 2 args)
        "transform": _ch_transform,
        # JSON standard forms
        "JSON_VALUE": _t("get_json_object({0}, {1})"),
        "JSON_QUERY": _t("get_json_object({0}, {1})"),
        "JSON_EXISTS": _t("(get_json_object({0}, {1}) IS NOT NULL)"),
        "simpleJSONExtractRaw": _t("get_json_object({0}, concat('$.', {1}))"),
        "simpleJSONExtractBool": _t(
            "(get_json_object({0}, concat('$.', {1})) = 'true')"
        ),
        # datetime
        "parseDateTimeInJodaSyntax": _t("to_timestamp({0}, {1})"),
        "dateTrunc": _t("date_trunc({0}, {1})"),
        "age": _date_diff,
        "UTCTimestamp": lambda a: "to_utc_timestamp(current_timestamp(), current_timezone())",
        "timezone": lambda a: "current_timezone()",
        "timezoneOf": lambda a: "current_timezone()",
        "generateUUIDv7": lambda a: "uuid()",
        "toIntervalYear": _t("(({0}) * INTERVAL '1' YEAR)"),
        "toIntervalQuarter": _t("(({0}) * INTERVAL '3' MONTH)"),
        "toIntervalMonth": _t("(({0}) * INTERVAL '1' MONTH)"),
        "toIntervalWeek": _t("(({0}) * INTERVAL '7' DAY)"),
        "toIntervalMinute": _t("(({0}) * INTERVAL '1' MINUTE)"),
        "toIntervalSecond": _t("(({0}) * INTERVAL '1' SECOND)"),
        # misc
        "roundDown": _t(
            "coalesce(array_max(filter({1}, e -> e <= {0})), array_min({1}))"
        ),
        "throwIf": lambda a: (
            f"(CASE WHEN {a[0]} THEN raise_error("
            f"{a[1] if len(a) > 1 else _q('throwIf condition met')}) ELSE 0 END)"
        ),
        "lagInFrame": lambda a: f"lag({', '.join(a)})",
        "leadInFrame": lambda a: f"lead({', '.join(a)})",
        "product": _t(
            "(CASE WHEN sum(CASE WHEN {0} = 0 THEN 1 ELSE 0 END) > 0 THEN 0.0D "
            "ELSE exp(sum(ln(abs({0})))) * (CASE WHEN sum(CASE WHEN {0} < 0 THEN 1 ELSE 0 END) % 2 = 1 THEN -1 ELSE 1 END) END)"
        ),
    }
)

#: reference clickhouse_names DELIBERATELY not SQL-templated, with the
#: reason — the dialect completeness test pins this split so the set
#: cannot drift silently. Every name here still works through the
#: registry's fn() DataFrame API.
_DIALECT_LEDGER: dict[str, str] = {
    # DataFrame-level (TABLE-kind) statistics operators
    "contingency": "TABLE-kind: two-pass contingency matrix (fn() API)",
    "cramersV": "TABLE-kind: two-pass statistic (fn() API)",
    "theilsU": "TABLE-kind: two-pass statistic (fn() API)",
    "rankCorr": "TABLE-kind: rank maps need two passes (fn() API)",
    "kolmogorovSmirnovTest": "TABLE-kind: two-sample sort pass (fn() API)",
    "mannWhitneyUTest": "TABLE-kind: two-sample rank pass (fn() API)",
    "topKWeighted": "TABLE-kind: heavy-hitter sketch (fn() API)",
    "stochasticLinearRegression": "iterative optimizer, not an expression",
    "stochasticLogisticRegression": "iterative optimizer, not an expression",
    # two-pass / window-context aggregates
    "entropy": "nested aggregate (needs group total): two-pass fn() API",
    "exponentialMovingAverage": "parametric ordered aggregate (fn() API)",
    "neighbor": "block-relative offset needs an explicit window in Spark",
    "runningDifferenceStartingWithFirstValue": "block-relative (window) form",
    "lag": "window function — valid with OVER(...), passthrough",
    "lead": "window function — valid with OVER(...), passthrough",
    # pandas-UDF kernels (no pure-SQL closed form)
    "jaroSimilarity": "pandas-UDF kernel (fn() API)",
    "jaroWinklerSimilarity": "pandas-UDF kernel (fn() API)",
    "damerauLevenshteinDistance": "pandas-UDF kernel (fn() API)",
    "normalizeUTF8NFD": "pandas-UDF kernel (fn() API)",
    "JSONAllPaths": "recursive JSON introspection — pandas-UDF kernel",
    "JSONAllPathsWithTypes": "recursive JSON introspection — pandas-UDF kernel",
    "JSONDynamicPaths": "recursive JSON introspection — pandas-UDF kernel",
    "JSONDynamicPathsWithTypes": "recursive JSON introspection — pandas-UDF kernel",
    "JSONSharedDataPaths": "recursive JSON introspection — pandas-UDF kernel",
    "JSONSharedDataPathsWithTypes": "recursive JSON introspection — pandas-UDF kernel",
    "JSONExtractArrayRawCaseInsensitive": "case-insensitive key walk — pandas-UDF kernel",
    "JSONExtractBoolCaseInsensitive": "case-insensitive key walk — pandas-UDF kernel",
    "JSONExtractFloatCaseInsensitive": "case-insensitive key walk — pandas-UDF kernel",
    "JSONExtractIntCaseInsensitive": "case-insensitive key walk — pandas-UDF kernel",
    "JSONExtractKeysCaseInsensitive": "case-insensitive key walk — pandas-UDF kernel",
    "JSONExtractRawCaseInsensitive": "case-insensitive key walk — pandas-UDF kernel",
    "JSONExtractStringCaseInsensitive": "case-insensitive key walk — pandas-UDF kernel",
    "JSONMergePatch": "RFC 7386 deep merge — pandas-UDF kernel",
    # CH lambda-first fill/split family — positional state machines
    "arrayFill": "stateful fill scan — registry fn() API",
    "arrayReverseFill": "stateful fill scan — registry fn() API",
    "arraySplit": "stateful split scan — registry fn() API",
    "arrayReverseSplit": "stateful split scan — registry fn() API",
    "mapApply": "tuple-returning lambda: use transform_keys/transform_values",
    "groupArraySample": "nondeterministic reservoir sample (fn() API)",
    # system introspection / engine internals
    "blockNumber": "engine block internals — no Spark analogue",
    "blockSize": "engine block internals — no Spark analogue",
    "rowNumberInBlock": "engine block internals — no Spark analogue",
    "rowNumberInAllBlocks": "use row_number() OVER (...) explicitly",
    "filesystemAvailable": "host introspection — not meaningful here",
    "filesystemCapacity": "host introspection — not meaningful here",
    "uptime": "host introspection — not meaningful here",
    "sleep": "side-effect function — deliberately not executed",
    "ignore": "engine no-op",
    "isConstant": "analyzer introspection — no Spark analogue",
    "randConstant": "per-block constant — no Spark block analogue",
    "randBinomial": "no closed form over rand()",
    "randPoisson": "no closed form over rand()",
    # geo specials
    "pointInEllipses": "multi-ellipse variadic geometry (fn() API)",
    "pointInPolygon": "ray-casting over nested arrays (fn() API)",
    "IPv4CIDRToRange": "tuple-returning range (fn() API)",
    # format/render internals
    "formatRow": "row formatter — use formats.format_result",
    "formatRowNoNewline": "row formatter — use formats.format_result",
}


def _load_generated_templates() -> None:
    """Wire the auto-derived templates (dialect_gen.TEMPLATES) into _FUNCS.
    Hand-written entries above win; a generated template applies only at
    the arities it was validated for — other arities pass through."""
    import os

    if os.environ.get("CHDB_SPARK_SKIP_GENERATED_TEMPLATES"):
        return  # tools/gen_dialect_templates.py regenerating: avoid self-input
    try:
        from chdb_spark.dialect_gen import TEMPLATES
    except ImportError:  # pragma: no cover — generated file always present
        return

    def make(by_arity: dict[int, str], name: str):
        def render(args: list[str]) -> str:
            tpl = by_arity.get(len(args))
            if tpl is None:  # unvalidated arity: leave the call untouched
                return f"{name}({', '.join(args)})"
            out = tpl
            for i, a in enumerate(args):
                out = out.replace(f"__arg{i}__", a)
            return out

        return render

    for name, by_arity in TEMPLATES.items():
        if name not in _FUNCS and name not in _PARAMETRIC:
            _FUNCS[name] = make(by_arity, name)


# (called below, once _PARAMETRIC exists)


def _window_funnel_sql(params: list[str], args: list[str]) -> str:
    """``windowFunnel(window)(ts, cond1, …, condK)`` → a sort-fold
    aggregate: collect (t, flags) per group, sort by time, fold a struct
    of per-level chain anchors (each anchor carries the chain's step-1
    timestamp, greedy-latest — the same exactness argument as
    operators/events.py funnel_levels). Window is in seconds (the CH
    DateTime contract); timestamps fold as epoch doubles."""
    w = params[0]
    ts, conds = args[0], args[1:]
    k_n = len(conds)
    if k_n < 1:
        raise ValueError("windowFunnel needs at least one condition")
    # double-cast via TIMESTAMP: TIMESTAMP_NTZ sources have no direct
    # numeric cast, TIMESTAMP → DOUBLE is epoch seconds with fraction
    ev_fields = ", ".join(
        [f"CAST(CAST({ts} AS TIMESTAMP) AS DOUBLE) AS t"]
        + [f"({c}) AS c{i}" for i, c in enumerate(conds, 1)]
    )
    zero = ", ".join(f"CAST(NULL AS DOUBLE) AS s{i}" for i in range(1, k_n + 1))
    upd = ["CASE WHEN e.c1 THEN e.t ELSE acc.s1 END AS s1"]
    for k in range(2, k_n + 1):
        upd.append(
            f"CASE WHEN e.c{k} AND acc.s{k-1} IS NOT NULL "
            f"AND e.t <= acc.s{k-1} + ({w}) THEN acc.s{k-1} ELSE acc.s{k} END AS s{k}"
        )
    whens = " ".join(
        f"WHEN acc.s{k} IS NOT NULL THEN {k}" for k in range(k_n, 0, -1)
    )
    return (
        f"aggregate(array_sort(collect_list(struct({ev_fields}))), "
        f"struct({zero}), (acc, e) -> struct({', '.join(upd)}), "
        f"acc -> CASE {whens} ELSE 0 END)"
    )


def _seq_pattern_arity(pattern: str, n_conds: int) -> int:
    """Validate a ``(?1)(?2)…(?K)`` sequence pattern (optionally with
    ``.*`` separators — the default semantics anyway) and return K."""
    body = pattern.replace(".*", "")
    refs = re.findall(r"\(\?(\d+)\)", body)
    if re.sub(r"\(\?\d+\)", "", body).strip():
        raise ValueError(
            f"sequenceMatch pattern {pattern!r}: only plain '(?1)(?2)…' "
            "chains (with optional .*) are SQL-expressible; time-bound "
            "patterns need the DataFrame operator (operators/events.py)"
        )
    if [int(r) for r in refs] != list(range(1, len(refs) + 1)) or len(refs) > n_conds:
        raise ValueError(
            f"sequenceMatch pattern {pattern!r} must reference conditions "
            "1..K in order"
        )
    return len(refs)


def _sequence_match_sql(params: list[str], args: list[str]) -> str:
    """``sequenceMatch('(?1)(?2)')(ts, cond1, cond2)`` → 1 iff an ordered
    chain exists (no time bound): the windowFunnel fold with an infinite
    window, checked at the final level."""
    k_n = _seq_pattern_arity(_str_lit(params[0]) or "", len(args) - 1)
    inner = _window_funnel_sql(["CAST(1e18 AS DOUBLE)"], args[: 1 + k_n])
    return f"(CASE WHEN ({inner}) >= {k_n} THEN 1 ELSE 0 END)"


def _sequence_count_sql(params: list[str], args: list[str]) -> str:
    """``sequenceCount('(?1)(?2)')(ts, cond1, cond2)`` → number of
    NON-OVERLAPPING ordered chains: a sort-fold advancing a progress level
    and counting + resetting on completion (the CH greedy scan)."""
    k_n = _seq_pattern_arity(_str_lit(params[0]) or "", len(args) - 1)
    ts, conds = args[0], args[1 : 1 + k_n]
    ev_fields = ", ".join(
        [f"CAST(CAST({ts} AS TIMESTAMP) AS DOUBLE) AS t"]
        + [f"({c}) AS c{i}" for i, c in enumerate(conds, 1)]
    )
    adv = [f"WHEN acc.lvl = {k_n - 1} AND e.c{k_n} THEN 0"]
    for k in range(k_n - 1):
        adv.append(f"WHEN acc.lvl = {k} AND e.c{k + 1} THEN {k + 1}")
    return (
        f"aggregate(array_sort(collect_list(struct({ev_fields}))), "
        f"struct(0 AS lvl, 0L AS cnt), "
        f"(acc, e) -> struct(CASE {' '.join(adv)} ELSE acc.lvl END AS lvl, "
        f"acc.cnt + CASE WHEN acc.lvl = {k_n - 1} AND e.c{k_n} THEN 1 ELSE 0 END AS cnt), "
        f"acc -> acc.cnt)"
    )


def _parametric_quantile(fn: str) -> Callable[[list[str], list[str]], str]:
    def render(params: list[str], args: list[str]) -> str:
        if len(params) == 1:
            return f"{fn}({args[0]}, {params[0]})"
        return f"{fn}({args[0]}, array({', '.join(params)}))"

    return render


#: parametric aggregates: name(params)(args)
_PARAMETRIC: dict[str, Callable[[list[str], list[str]], str]] = {
    "windowFunnel": _window_funnel_sql,
    "sequenceMatch": _sequence_match_sql,
    "sequenceCount": _sequence_count_sql,
    "quantile": _parametric_quantile("percentile_approx"),
    "quantiles": _parametric_quantile("percentile_approx"),
    "quantileExact": _parametric_quantile("percentile"),
    "quantilesExact": _parametric_quantile("percentile"),
    "quantileTDigest": _parametric_quantile("percentile_approx"),
    "medianExact": _parametric_quantile("percentile"),
    "uniqUpTo": lambda p, a: (
        f"(CASE WHEN count(DISTINCT {a[0]}) <= {p[0]} "
        f"THEN count(DISTINCT {a[0]}) ELSE {p[0]} + 1 END)"
    ),
    "groupArray": lambda p, a: f"slice(collect_list({a[0]}), 1, {p[0]})",
    "groupUniqArray": lambda p, a: f"slice(collect_set({a[0]}), 1, {p[0]})",
    "histogram": lambda p, a: f"histogram_numeric({a[0]}, {p[0]})",
    "topK": lambda p, a: (_ for _ in ()).throw(
        ValueError(
            "topK(N)(x) has no Spark SQL aggregate equivalent; use the "
            "DataFrame form: fn('topK') from chdb_spark.functions, or "
            "GROUP BY x ORDER BY count(*) DESC LIMIT N"
        )
    ),
}

_load_generated_templates()

#: bare identifiers (no call parens) rewritten case-insensitively
_KEYWORDS = {
    "prewhere": "WHERE",
    "final": "",  # MergeTree FINAL: no merge-pending duplicates here
    "global": "",  # GLOBAL IN/JOIN: all joins are "global" in Spark
}

#: bare identifier (exact case) → replacement
_IDENTS = {
    # system.numbers is CH's infinite integer stream; a 2^40 range is lazy
    # (row generation stops at the LIMIT) and far past any practical LIMIT.
    "system.numbers": "(SELECT id AS number FROM range(1099511627776))",
    "system.numbers_mt": "(SELECT id AS number FROM range(1099511627776))",
    "system.one": "(SELECT 0 AS dummy)",
}

# ---------------------------------------------------------------------------
# DDL: CREATE TABLE with CH engines/types → Spark DDL
# ---------------------------------------------------------------------------

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?TABLE\b", re.IGNORECASE
)
_ENGINE_RE = re.compile(r"\bENGINE\s*=", re.IGNORECASE)
_AS_SELECT_RE = re.compile(r"\bAS\s+\(?\s*SELECT\b", re.IGNORECASE)

#: CH column type → Spark DDL type (word-boundary replacement, applied after
#: Nullable()/LowCardinality() unwrapping; Spark columns are nullable anyway)
_CH_DDL_TYPES = {
    "String": "STRING",
    "UInt8": "SMALLINT",
    "UInt16": "INT",
    "UInt32": "BIGINT",
    "UInt64": "BIGINT",
    "Int8": "TINYINT",
    "Int16": "SMALLINT",
    "Int32": "INT",
    "Int64": "BIGINT",
    "Float32": "FLOAT",
    "Float64": "DOUBLE",
    "Date": "DATE",
    "Date32": "DATE",
    "Bool": "BOOLEAN",
    "Boolean": "BOOLEAN",
    "UUID": "STRING",
    "IPv4": "STRING",
    "IPv6": "STRING",
    "JSON": "STRING",
}


def rewrite_ddl(sql: str) -> str:
    """Normalize a CH ``CREATE TABLE`` into Spark DDL: drop the
    ``ENGINE = …`` spec (and its ORDER BY/PARTITION BY/TTL tail — those
    describe MergeTree physical layout; Spark's layout comes from the
    writer), unwrap ``Nullable``/``LowCardinality``, and map CH column
    types to Spark DDL types. Non-CREATE statements pass through."""
    if not _CREATE_RE.match(sql or ""):
        return sql
    m_as = _AS_SELECT_RE.search(sql)
    head, tail = (sql[: m_as.start()], sql[m_as.start() :]) if m_as else (sql, "")
    m_e = _ENGINE_RE.search(head)
    if m_e:
        head = head[: m_e.start()].rstrip() + " "
    return map_ch_types(head) + tail


def map_ch_types(head: str) -> str:
    """Map CH column-type names in a DDL fragment to Spark DDL types
    (shared by CREATE TABLE rewriting and ALTER … ADD COLUMN)."""
    # unwrap wrappers (repeat for nesting like LowCardinality(Nullable(T)))
    for _ in range(3):
        head2 = re.sub(r"\b(?:Nullable|LowCardinality)\(([^()]+)\)", r"\1", head)
        if head2 == head:
            break
        head = head2
    head = re.sub(r"\bFixedString\(\d+\)", "STRING", head)
    head = re.sub(r"\bDateTime64\(\d+(?:\s*,\s*'[^']*')?\)", "TIMESTAMP", head)
    head = re.sub(r"\bDateTime(?:\('[^']*'\))?\b", "TIMESTAMP", head)
    head = re.sub(r"\bEnum(?:8|16)?\([^)]*\)", "STRING", head)
    head = re.sub(r"\bDecimal32\((\d+)\)", r"DECIMAL(9,\1)", head)
    head = re.sub(r"\bDecimal64\((\d+)\)", r"DECIMAL(18,\1)", head)
    head = re.sub(r"\bDecimal128\((\d+)\)", r"DECIMAL(38,\1)", head)
    for _ in range(3):  # Array(Array(T)) nesting
        head2 = re.sub(r"\bArray\(([^()]+)\)", r"ARRAY<\1>", head)
        if head2 == head:
            break
        head = head2
    for ch, sp in _CH_DDL_TYPES.items():
        head = re.sub(rf"\b{ch}\b", sp, head)
    return head


_SETTINGS_RE = re.compile(
    r"\bSETTINGS\s+\w+\s*=\s*(?:'[^']*'|[^,;\s][^,;]*)"
    r"(?:\s*,\s*\w+\s*=\s*(?:'[^']*'|[^,;\s][^,;]*))*\s*;?\s*$",
    re.IGNORECASE,
)


def extract_settings(sql: str) -> tuple[str, dict[str, str]]:
    """Split a trailing ``SETTINGS k=v, ...`` clause off the query text and
    return it as a dict (reference sql_executor.py:2108 _append_settings —
    engine settings ride on the SQL). The rewrite strips the clause anyway;
    this entry point lets callers HONOR the settings that have a Spark-side
    meaning (e.g. output_format_json_quote_64bit_integers → formats)."""
    m = _SETTINGS_RE.search(sql or "")
    if not m:
        return sql, {}
    body = m.group(0)
    body = re.sub(r"^\s*SETTINGS\s+", "", body, flags=re.IGNORECASE).rstrip("; \n\t")
    out: dict[str, str] = {}
    for part in _split_args(body):
        k, _, v = part.partition("=")
        out[k.strip()] = v.strip().strip("'\"")
    return sql[: m.start()].rstrip(), out

_WORD_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def _numbers_tf(args: list[str]) -> str:
    # numbers(N) / numbers(offset, N) / numbers_mt(...) → range TVF.
    # When every value provably fits in INT, surface `number` as INT so
    # CH idioms like `toDate(s) + number` type-check (Spark's date + n
    # coercion requires INT); past 2^31 rows it must stay BIGINT.
    def _fits_int(a: str) -> bool:
        try:
            return float(a) <= 2**31 - 1
        except ValueError:
            return False

    if len(args) == 1:
        cast = "INT" if _fits_int(args[0]) else "BIGINT"
        return f"(SELECT CAST(id AS {cast}) AS number FROM range(CAST({args[0]} AS BIGINT)))"
    try:
        cast = "INT" if float(args[0]) + float(args[1]) <= 2**31 - 1 else "BIGINT"
    except ValueError:
        cast = "BIGINT"
    return (
        f"(SELECT CAST(id AS {cast}) AS number FROM range(CAST({args[0]} AS BIGINT), "
        f"CAST({args[0]} AS BIGINT) + CAST({args[1]} AS BIGINT)))"
    )


_FUNCS["numbers"] = _numbers_tf
_FUNCS["numbers_mt"] = _numbers_tf


# ---------------------------------------------------------------------------
# CH clause forms: LIMIT n BY cols, ARRAY JOIN ... AS alias
# ---------------------------------------------------------------------------

_LIMIT_BY_RE = re.compile(
    r"\bLIMIT\s+(\d+)(?:\s*,\s*(\d+)|\s+OFFSET\s+(\d+))?\s+BY\s+(.+?)(\s+LIMIT\s+\d+)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_ARRAY_JOIN_RE = re.compile(r"\b(LEFT\s+)?ARRAY\s+JOIN\s+", re.IGNORECASE)
_CLAUSE_STOP_RE = re.compile(
    r"\b(WHERE|PREWHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT|UNION|SETTINGS|WINDOW)\b"
    r"|[,)]",
    re.IGNORECASE,
)


def _last_top_level(sql: str, pattern: re.Pattern) -> int:
    """Start index of the last match of ``pattern`` at paren depth 0, or -1."""
    depth = 0
    best = -1
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            i = _end_of_string(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pattern.match(sql, i)
            if m:
                best = i
                i = m.end()
                continue
        i += 1
    return best


def _rewrite_limit_by(sql: str) -> str:
    """``… [ORDER BY o] LIMIT n [OFFSET k] BY cols [LIMIT m]`` → windowed
    row_number filter (CH keeps the first n rows *per distinct BY value*).
    Handles the trailing top-level form — the shape every CH example uses."""
    m = _LIMIT_BY_RE.search(sql)
    if not m:
        return sql
    # confirm the LIMIT ... BY is at top level (not inside a subquery)
    depth = 0
    i = 0
    while i < m.start():
        c = sql[i]
        if c in "'\"`":
            i = _end_of_string(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    if depth != 0:
        return sql
    n_rows = int(m.group(1))
    # CH `LIMIT k, n BY` = offset k; `LIMIT n OFFSET k BY` equivalent
    offset = int(m.group(3) or 0)
    if m.group(2) is not None:
        offset, n_rows = n_rows, int(m.group(2))
    by_cols = m.group(4).strip()
    final_limit = (m.group(5) or "").strip()
    core = sql[: m.start()].rstrip()
    # per-group ordering: the query's own ORDER BY if present (moved into
    # the window + re-applied outside), else the BY cols for determinism
    ob = _last_top_level(core, _ORDER_BY_RE)
    if ob >= 0:
        m_ob = _ORDER_BY_RE.match(core, ob)
        order = core[m_ob.end() :].strip()
        core = core[:ob].rstrip()
    else:
        order = by_cols
    lo, hi = offset, offset + n_rows
    out = (
        f"SELECT * EXCEPT (_lb_rn) FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {by_cols} ORDER BY {order}) AS _lb_rn FROM "
        f"({core}) _lb_sub) WHERE _lb_rn > {lo} AND _lb_rn <= {hi}"
    )
    if ob >= 0:
        out += f" ORDER BY {order}"
    if final_limit:
        out += " " + final_limit
    return out


def _rewrite_array_join(sql: str) -> str:
    """``[LEFT] ARRAY JOIN expr AS alias[, …]`` → ``LATERAL VIEW [OUTER]
    explode(expr) _aj AS alias`` (requires the AS form — the bare CH form
    shadows the source column, which Spark resolves as ambiguous)."""
    counter = 0
    while True:
        # find a top-level-ish ARRAY JOIN outside string literals
        i = 0
        n = len(sql)
        pos = -1
        outer = False
        while i < n:
            c = sql[i]
            if c in "'\"`":
                i = _end_of_string(sql, i)
                continue
            m = _ARRAY_JOIN_RE.match(sql, i)
            if m:
                pos = i
                outer = bool(m.group(1))
                break
            i += 1
        if pos < 0:
            return sql
        m = _ARRAY_JOIN_RE.match(sql, pos)
        # parse comma-separated `expr AS alias` items until a clause keyword
        j = m.end()
        items = []
        start = j
        depth = 0
        while j <= n:
            if j == n:
                items.append(sql[start:j].strip())
                break
            c = sql[j]
            if c in "'\"`":
                j = _end_of_string(sql, j)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    items.append(sql[start:j].strip())
                    break
                depth -= 1
            elif depth == 0:
                if c == ",":
                    items.append(sql[start:j].strip())
                    start = j + 1
                else:
                    ms = _CLAUSE_STOP_RE.match(sql, j)
                    if ms and ms.group(1):
                        items.append(sql[start:j].strip())
                        break
            j += 1
        end = start + len(sql[start:j])
        views = []
        for it in items:
            if not it:
                continue
            ma = re.match(r"(.+?)\s+AS\s+([`\w]+)\s*$", it, re.IGNORECASE | re.DOTALL)
            if not ma:
                raise ValueError(
                    f"ARRAY JOIN needs the `expr AS alias` form (got {it!r}); "
                    "the bare form would shadow the source column"
                )
            expr, alias = ma.group(1).strip(), ma.group(2)
            kw = "LATERAL VIEW OUTER" if outer else "LATERAL VIEW"
            views.append(f"{kw} explode({expr}) _aj{counter} AS {alias}")
            counter += 1
        sql = sql[:pos] + " ".join(views) + " " + sql[end:]


#: maintenance statements with no Spark analogue → harmless empty result
#: (chdb returns an empty result for these; MergeTree part merges and
#: server subsystems don't exist here)
_NOOP_STMT_RE = re.compile(r"^\s*(OPTIMIZE\s+TABLE|SYSTEM)\b", re.IGNORECASE)
_EXPLAIN_KIND_RE = re.compile(
    r"^\s*EXPLAIN\s+(?:(AST|SYNTAX|QUERY\s+TREE|PIPELINE|PLAN|ESTIMATE)\s+)?",
    re.IGNORECASE,
)
_RENAME_RE = re.compile(
    r"^\s*RENAME\s+TABLE\s+([`\w.]+)\s+TO\s+([`\w.]+)\s*;?\s*$", re.IGNORECASE
)
_SAMPLE_RE = re.compile(r"\bSAMPLE\s+(\d*\.?\d+)(?!\s*(?:\)|,|BY\b))", re.IGNORECASE)
_DB_ENGINE_RE = re.compile(
    r"^(\s*CREATE\s+DATABASE\s+(?:IF\s+NOT\s+EXISTS\s+)?[`\w]+)\s+ENGINE\s*=\s*\w+\s*;?\s*$",
    re.IGNORECASE,
)


def _rewrite_sample(sql: str) -> str:
    """CH ``FROM t SAMPLE k`` → Spark TABLESAMPLE. k<1 is a fraction
    (``PERCENT`` form, probabilistic like CH's sampling expression);
    k=1 is CH's coefficient 1 — all data, the clause is dropped;
    k>1 is a row target, mapped to ``TABLESAMPLE (k ROWS)`` — Spark
    takes the first k rows of the scan where CH takes ~k rows spread by
    the table's sampling key. Both are deterministic cheap subsets of
    about the requested size; the prefix bias is the documented
    divergence (CH needs a MergeTree SAMPLE BY key declared up front,
    which parquet lakes don't have)."""

    def repl(m: re.Match) -> str:
        k = float(m.group(1))
        if k == 1:
            # CH: SAMPLE 1 / SAMPLE 1.0 is the coefficient 1 — read ALL
            # data, same as no SAMPLE clause at all.
            return ""
        if k < 1:
            return f"TABLESAMPLE ({k * 100:g} PERCENT)"
        # k > 1 is an approximate row target (integers in CH; round a
        # fractional literal rather than silently truncating it).
        return f"TABLESAMPLE ({round(k)} ROWS)"

    return _SAMPLE_RE.sub(repl, sql)


#: words after which a `[` must be an array literal, not indexing
_PRE_LITERAL_KEYWORDS = frozenset(
    "SELECT FROM WHERE AND OR NOT IN BY ON WHEN THEN ELSE CASE AS HAVING "
    "LIMIT JOIN DISTINCT ALL UNION BETWEEN LIKE ILIKE IS VALUES SETTINGS "
    "OFFSET RETURN USING ARRAY".split()
)


def rewrite(sql: str) -> str:
    """Rewrite ClickHouse-dialect SQL text into Spark SQL.

    Conservative: names Spark SQL already defines are left alone, string
    literals and quoted identifiers pass through untouched, and SQL that is
    already valid Spark comes out byte-identical — so this can run
    unconditionally in front of ``spark.sql``.
    """
    sql = _SETTINGS_RE.sub("", sql or "").rstrip()
    if _NOOP_STMT_RE.match(sql):
        return "SELECT '' AS status WHERE false"
    # CH EXPLAIN kinds → the closest Spark EXPLAIN mode. SYNTAX (CH: the
    # rewritten query text) returns THIS layer's rewrite — the faithful
    # analogue, since the dialect rewrite is the syntax transformation.
    m = _EXPLAIN_KIND_RE.match(sql)
    if m:
        kind = re.sub(r"\s+", " ", m.group(1).upper()) if m.group(1) else ""
        rest = sql[m.end():]
        if kind == "SYNTAX":
            # Spark string literals are backslash-escaped (non-ANSI mode),
            # so both backslashes and quotes must be escaped or a regex
            # pattern inside the explained query loses its backslashes
            body = rewrite(rest).replace("\\", "\\\\").replace("'", "\\'")
            return f"SELECT '{body}' AS explain"
        spark_mode = {
            "": "",
            "PLAN": "",
            "AST": " EXTENDED",
            "QUERY TREE": " EXTENDED",
            "PIPELINE": " FORMATTED",
            "ESTIMATE": " COST",
        }.get(kind)
        if spark_mode is None:  # unknown kind — leave for Spark to report
            spark_mode = f" {kind}"
        return f"EXPLAIN{spark_mode} {rewrite(rest)}"
    m = _RENAME_RE.match(sql)
    if m:
        return f"ALTER TABLE {m.group(1)} RENAME TO {m.group(2)}"
    m = _DB_ENGINE_RE.match(sql)
    if m:
        return m.group(1)
    sql = rewrite_ddl(sql)
    if _WITH_TOTALS_RE.search(sql):
        sql = _rewrite_with_totals(sql)
    if _QUALIFY_RE.search(sql):
        sql = _rewrite_qualify(sql)
    sql = _rewrite_limit_by(sql)
    if _ARRAY_JOIN_RE.search(sql):
        sql = _rewrite_array_join(sql)
    if _SAMPLE_RE.search(sql) and not _CREATE_RE.match(sql):
        sql = _rewrite_sample(sql)
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'`":
            j = _end_of_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        if c == '"':
            # Spark treats double quotes as string literals; CH as
            # identifiers. Literals pass through — only file()/Python()
            # args (handled in resolve_table_functions) accept both.
            j = _end_of_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        if c == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out.append(sql[i:j])
            i = j
            continue
        if c == "[":
            # CH array literal `[1, 2]` → array(1, 2) — but `x[i]` /
            # `m['k']` (prev token is an operand end) is indexing: untouched
            p = i - 1
            while p >= 0 and sql[p].isspace():
                p -= 1
            operand_end = p >= 0 and (sql[p].isalnum() or sql[p] in "_)]`'\"")
            if operand_end and (sql[p].isalnum() or sql[p] == "_"):
                # ...unless the word is a keyword (SELECT [1,2] / IN [..])
                q = p
                while q >= 0 and (sql[q].isalnum() or sql[q] == "_"):
                    q -= 1
                word_before = sql[q + 1 : p + 1].upper()
                operand_end = word_before not in _PRE_LITERAL_KEYWORDS
            if operand_end:
                out.append(c)
                i += 1
                continue
            inner, end = _balanced_brackets(sql, i)
            args = [rewrite_expr(a) for a in _split_args(inner)]
            out.append(f"array({', '.join(args)})")
            i = end
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j] in _WORD_CHARS or sql[j] == "."):
                j += 1
            word = sql[i:j]
            k = j
            while k < n and sql[k].isspace():
                k += 1
            if k < n and sql[k] == "(" and (word in _FUNCS or word in _PARAMETRIC):
                inner, end = _balanced(sql, k)
                args = [rewrite_expr(a) for a in _split_args(inner)]
                k2 = end
                while k2 < n and sql[k2].isspace():
                    k2 += 1
                if word in _PARAMETRIC and k2 < n and sql[k2] == "(":
                    inner2, end2 = _balanced(sql, k2)
                    args2 = [rewrite_expr(a) for a in _split_args(inner2)]
                    out.append(_PARAMETRIC[word](args, args2))
                    i = end2
                    continue
                if word in _FUNCS:
                    out.append(_FUNCS[word](args))
                    i = end
                    continue
                # parametric-only name used plainly (e.g. quantile(x))
                if word in ("quantile", "quantileTDigest"):
                    out.append(f"percentile_approx({args[0]}, 0.5)")
                elif word in ("quantileExact",):
                    out.append(f"percentile({args[0]}, 0.5)")
                elif word == "histogram":
                    out.append(f"histogram_numeric({args[0]}, 10)")
                else:
                    out.append(f"{word}({', '.join(args)})")
                i = end
                continue
            if word in _IDENTS:
                out.append(_IDENTS[word])
                i = j
                continue
            lw = word.lower()
            if lw in _KEYWORDS:
                out.append(_KEYWORDS[lw])
                i = j
                continue
            out.append(word)
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


#: expression-level entry (arguments of calls re-enter here)
rewrite_expr = rewrite


# ---------------------------------------------------------------------------
# table functions that need a SparkSession (file/url/Python)
# ---------------------------------------------------------------------------

_TF_RE = re.compile(
    r"\b(file|url|Python|sqlite|s3|gcs|hdfs|azureBlobStorage|mysql|postgresql"
    r"|remote|remoteSecure|mongodb|iceberg|deltaLake|hudi)\s*\(",
    re.IGNORECASE,
)

#: CH format name (lowercase) → Spark reader format + options
_TF_FORMATS = {
    "parquet": ("parquet", {}),
    # CH's CSV/TSV/TabSeparated are HEADERLESS; only *WithNames carry a
    # header row. header is explicit both ways because read_auto and
    # write_auto default csv header to 'true' (ADVICE r9: file(...,'CSV')
    # wrote a header CH would ingest as a data row).
    "csv": ("csv", {"header": "false", "inferSchema": "true"}),
    "csvwithnames": ("csv", {"header": "true", "inferSchema": "true"}),
    "tsv": ("csv", {"sep": "\t", "header": "false", "inferSchema": "true"}),
    "tabseparated": ("csv", {"sep": "\t", "header": "false", "inferSchema": "true"}),
    "tsvwithnames": ("csv", {"sep": "\t", "header": "true", "inferSchema": "true"}),
    "tabseparatedwithnames": ("csv", {"sep": "\t", "header": "true", "inferSchema": "true"}),
    "json": ("json", {}),
    "jsoneachrow": ("json", {}),
    "ndjson": ("json", {}),
    "orc": ("orc", {}),
    "avro": ("avro", {}),
    "arrow": ("arrow", {}),
    "lineasstring": ("text", {}),
}


def _tf_literal(arg: str) -> str | None:
    """Path/format args accept single quotes, double quotes (the README
    writes ``file("data.parquet", Parquet)``), or a bare word."""
    a = arg.strip()
    if a and a[0] in "'\"" and _end_of_string(a, 0) == len(a):
        return a[1:-1]
    if re.fullmatch(r"[\w./*\-]+", a):
        return a
    return None


def resolve_table_functions(spark, sql: str, namespace: dict | None = None) -> str:
    """Replace ``file(...)``/``url(...)``/``Python(var)`` table functions
    with temp views backed by the matching reader (reference
    datastore/table_functions.py:123,208,1143). ``namespace`` supplies the
    variables ``Python(name)`` may reference (the reference inspects the
    caller's frame; :func:`chdb_spark.session.query` passes it in).

    Only the *reference* of the data moves through the driver — each view
    is a lazy DataFrame whose scan parallelizes like any other source.
    """
    # find candidate call sites with a string-literal-aware scan
    sites: list[tuple[int, int, str]] = []  # (start, open_paren, name)
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            i = _end_of_string(sql, i)
            continue
        m = _TF_RE.match(sql, i)
        if m and (i == 0 or sql[i - 1] not in _WORD_CHARS and sql[i - 1] != "."):
            sites.append((m.start(), m.end() - 1, m.group(1)))
            i = m.end()
            continue
        i += 1
    out = []
    i = 0
    counter = 0
    for start, paren, name in sites:
        if start < i:
            continue  # inside a previously consumed call
        inner, end = _balanced(sql, paren)
        args = _split_args(inner)
        # unique per resolution call: concurrent queries on one session
        # must not overwrite each other's table-function views
        import time as _time

        view = f"_chsql_tf_{_time.monotonic_ns()}_{counter}"
        counter += 1
        if name.lower() == "python":
            var = args[0].strip()
            ns = namespace or {}
            if var not in ns:
                raise NameError(f"Python() table function: no variable {var!r} in scope")
            obj = ns[var]
            from chdb_spark.sources.files import from_arrow, from_pandas

            if hasattr(obj, "toPandas") and hasattr(obj, "sparkSession"):
                df = obj  # already a Spark DataFrame
            elif type(obj).__module__.startswith("pyarrow"):
                df = from_arrow(spark, obj)
            elif isinstance(obj, dict):  # column dict (reference examples.md §4)
                import pandas as _pd

                df = from_pandas(spark, _pd.DataFrame(obj))
            else:
                df = from_pandas(spark, obj)
            df.createOrReplaceTempView(view)
        elif name.lower() == "file":
            path = _tf_literal(args[0])
            if path is None:
                raise ValueError(f"file(): unsupported path argument {args[0]!r}")
            fmt_name = (_tf_literal(args[1]) or "").lower() if len(args) > 1 else ""
            from chdb_spark.sources.files import infer_format, read_auto

            if fmt_name in _TF_FORMATS:
                fmt, opts = _TF_FORMATS[fmt_name]
            else:
                fmt, opts = infer_format(path), {}
            read_auto(spark, path, fmt=fmt, **opts).createOrReplaceTempView(view)
        elif name.lower() in ("s3", "gcs", "hdfs", "azureblobstorage"):
            # s3('url'[, access, secret][, 'Format']) — reference
            # table_functions.py:316+. Credentials belong in cluster conf
            # (the Hadoop FS layer); the URL + optional format are honored.
            path = _tf_literal(args[0])
            fmt_name = ""
            for extra in args[1:]:
                cand = (_tf_literal(extra) or "").lower()
                if cand in _TF_FORMATS:
                    fmt_name = cand
            from chdb_spark.sources.uri import open_uri

            fmt, opts = _TF_FORMATS.get(fmt_name, (None, {}))
            open_uri(spark, path, fmt=fmt, **opts).createOrReplaceTempView(view)
        elif name.lower() in ("remote", "remotesecure"):
            # remote('host:port', 'db', 'table'[, 'user', 'password']) —
            # reference table_functions.py:808. Pure-Python HTTP-interface
            # source (range-partitioned ArrowStream reads); host should be
            # the server's HTTP(S) port (8123/8443), not native 9000.
            from chdb_spark.sources.remote_ch import remote as _remote

            lit_r = [_tf_literal(a) or a.strip().strip("'\"") for a in args]
            database, tbl, user, password = _parse_remote_args(lit_r)
            _remote(
                spark,
                lit_r[0] if lit_r else "",
                database=database,
                table=tbl,
                user=user,
                password=password,
                secure=name.lower() == "remotesecure",
            ).createOrReplaceTempView(view)
        elif name.lower() in ("mysql", "postgresql"):
            # mysql('host:port', 'db', 'table', 'user', 'password') —
            # reference table_functions.py:570+. Routed to the JDBC reader
            # (driver jar required; error message says which).
            host = _tf_literal(args[0]) or ""
            db = _tf_literal(args[1]) or "" if len(args) > 1 else ""
            tbl = _tf_literal(args[2]) or "" if len(args) > 2 else ""
            from chdb_spark.sources.files import read_jdbc

            opts = {}
            if len(args) > 3:
                opts["user"] = _tf_literal(args[3]) or ""
            if len(args) > 4:
                opts["password"] = _tf_literal(args[4]) or ""
            read_jdbc(
                spark, f"jdbc:{name.lower()}://{host}/{db}", tbl, **opts
            ).createOrReplaceTempView(view)
        elif name.lower() == "mongodb":
            # mongodb('host:port', 'db', 'collection', 'user', 'pass',
            # 'structure') — reference table_functions.py:668
            from chdb_spark.sources.nosql import mongodb as _mongo

            _mongo(
                spark,
                host=_tf_literal(args[0]) or "",
                database=_tf_literal(args[1]) or "",
                collection=_tf_literal(args[2]) or "",
                user=(_tf_literal(args[3]) or "") if len(args) > 3 else "",
                password=(_tf_literal(args[4]) or "") if len(args) > 4 else "",
                structure=(_tf_literal(args[5]) or "_id String")
                if len(args) > 5
                else "_id String",
            ).createOrReplaceTempView(view)
        elif name.lower() in ("iceberg", "deltalake", "hudi"):
            fmtname = {"deltalake": "delta"}.get(name.lower(), name.lower())
            path = _tf_literal(args[0])
            # read_auto owns the jar-vs-pure-Python split for delta/hudi
            # (sources/delta_py.py log replay, sources/hudi_py.py CoW
            # file-slice resolution) — the dialect table function works
            # jar-free the same way the reference's delta_scan does
            from chdb_spark.sources.files import read_auto

            read_auto(spark, path, fmt=fmtname).createOrReplaceTempView(view)
        elif name.lower() == "sqlite":
            # sqlite('db_path', 'table') — reference table_functions.py:772
            db = _tf_literal(args[0])
            tbl = _tf_literal(args[1]) if len(args) > 1 else None
            if db is None or tbl is None:
                raise ValueError("sqlite() needs (db_path, table) literals")
            from chdb_spark.sources.sqlite import read_sqlite

            read_sqlite(spark, db, tbl).createOrReplaceTempView(view)
        else:  # url
            path = _tf_literal(args[0])
            fmt_name = (_tf_literal(args[1]) or "").lower() if len(args) > 1 else ""
            from chdb_spark.sources.uri import open_uri

            fmt, opts = _TF_FORMATS.get(fmt_name, (None, {}))
            open_uri(spark, path, fmt=fmt, **opts).createOrReplaceTempView(view)
        out.append(sql[i:start] + view)
        i = end
    out.append(sql[i:])
    return "".join(out)


# ---------------------------------------------------------------------------
# ORDER BY ... WITH FILL (gap filling)
# ---------------------------------------------------------------------------

_WITH_FILL_RE = re.compile(
    # (?!\s+AS\b): a CTE named `fill` (`WITH fill AS (...)`) is valid SQL,
    # not the CH gap-filling modifier — the modifier is never followed by AS
    r"\bWITH\s+FILL\b(?!\s+AS\b)"
    r"(?:\s+FROM\s+(?P<from>'[^']*'|[\w.+-]+))?"
    r"(?:\s+TO\s+(?P<to>'[^']*'|[\w.+-]+))?"
    r"(?:\s+STEP\s+(?P<step>[\w.+-]+))?"
    r"(?:\s+INTERPOLATE\s*\((?P<interp>[^)]*)\))?",
    re.IGNORECASE,
)
_ORDER_BY_KEY_RE = re.compile(
    r"\bORDER\s+BY\s+(?P<key>`[^`]+`|[A-Za-z_]\w*)\s*(?P<dir>ASC|DESC)?\s*$",
    re.IGNORECASE,
)


def extract_with_fill(sql: str) -> tuple[str, dict | None]:
    """Split a trailing top-level ``ORDER BY k [ASC|DESC] WITH FILL [FROM a]
    [TO b] [STEP s]`` (ClickHouse gap-filling ORDER BY modifier) from the
    query text.

    Returns ``(sql_without_with_fill, spec | None)`` where the ORDER BY
    itself stays in the SQL and ``spec`` carries key/direction/bounds for
    the executor to apply (session.query joins a generated key frame and
    fills the gap rows with column defaults, the CH semantics). Text-level
    rewriting cannot express the fill (it needs the result schema), hence
    the split contract — same shape as ``extract_settings``.

    Supported: single-key ORDER BY over an integer/date/timestamp column,
    numeric or ``'...'``-quoted literal bounds, numeric STEP (default 1).
    ``FROM`` is inclusive, ``TO`` exclusive (the CH contract); with no
    bounds the observed min..max of the result is filled inclusively.
    """
    i = _last_top_level(sql, _WITH_FILL_RE)
    if i < 0:
        return sql, None
    m = _WITH_FILL_RE.match(sql, i)
    head, tail = sql[:i].rstrip(), sql[m.end():].strip().rstrip(";").strip()
    km = _ORDER_BY_KEY_RE.search(head)
    if not km:
        raise ValueError(
            "WITH FILL requires a trailing single-column ORDER BY "
            f"(got: ...{head[-60:]!r})"
        )

    def _lit(s: str | None):
        if s is None:
            return None
        if s.startswith("'"):
            return s[1:-1]
        try:
            return int(s)
        except ValueError:
            return float(s)

    interp = [
        c.strip().strip("`")
        for c in (m.group("interp") or "").split(",")
        if c.strip()
    ]
    spec = {
        "key": km.group("key").strip("`"),
        "desc": (km.group("dir") or "").upper() == "DESC",
        "from": _lit(m.group("from")),
        "to": _lit(m.group("to")),
        "step": _lit(m.group("step")) or 1,
        "interpolate": interp,
    }
    rest = (" " + tail) if tail else ""
    return head + rest, spec


# ---------------------------------------------------------------------------
# GROUP BY ... WITH TOTALS
# ---------------------------------------------------------------------------

# (?!\s+AS\b): `WITH totals AS (...)` is a CTE named totals, not the
# CH GROUP BY modifier — the modifier is never followed by AS
_WITH_TOTALS_RE = re.compile(r"\bWITH\s+TOTALS\b(?!\s+AS\b)", re.IGNORECASE)
_GROUP_BY_RE = re.compile(r"\bGROUP\s+BY\b", re.IGNORECASE)


def _rewrite_with_totals(sql: str) -> str:
    """``GROUP BY cols WITH TOTALS`` → ``GROUP BY GROUPING SETS ((cols), ())``.

    The CH totals block is exactly the empty grouping set (one grand-total
    row); key columns come back NULL where CH's formats print the column
    default — the row content (the aggregates) is identical. Handles every
    top-level occurrence (subqueries rewrite too since the scan tracks
    strings, not depth — GROUP BY inside a derived table is still a GROUP BY
    that can carry WITH TOTALS).
    """
    while True:
        i = _last_top_level(sql, _WITH_TOTALS_RE)
        if i < 0:
            # also catch occurrences inside parens (derived tables)
            m = None
            depth_scan = _WITH_TOTALS_RE.search(sql)
            if depth_scan is None:
                return sql
            i = depth_scan.start()
        m = _WITH_TOTALS_RE.match(sql, i)
        # find the GROUP BY that owns this WITH TOTALS: last GROUP BY before i
        gb = None
        for gm in _GROUP_BY_RE.finditer(sql, 0, i):
            gb = gm
        if gb is None:
            raise ValueError("WITH TOTALS without a preceding GROUP BY")
        cols = sql[gb.end():i].strip().rstrip(",")
        sql = (
            sql[: gb.start()]
            + f"GROUP BY GROUPING SETS (({cols}), ())"
            + sql[m.end():]
        )


# ---------------------------------------------------------------------------
# system.* introspection tables (reference agents/tool.py:501-553 queries
# system.tables/system.functions; datastore/core.py:5919 system.tables)
# ---------------------------------------------------------------------------

_SYSTEM_VIEWS = {
    "system.tables": "__system_tables",
    "system.databases": "__system_databases",
    "system.columns": "__system_columns",
    "system.functions": "__system_functions",
    "system.table_functions": "__system_table_functions",
    "system.settings": "__system_settings",
    "system.query_log": "__system_query_log",
}
_IDENTS.update(_SYSTEM_VIEWS)

_SYS_VIEW_RE = re.compile(
    r"\b__system_(tables|databases|columns|functions|table_functions|settings"
    r"|query_log)\b"
)

#: `INSERT INTO [TABLE] FUNCTION name(args) [(cols)] SELECT …` — the CH
#: write-to-table-function statement (reference core.py:5502 emits it for
#: remote writes; examples/example_table_functions.py:358 documents it for
#: file/object-store targets)
_INSERT_TF_RE = re.compile(
    r"(?is)^\s*INSERT\s+INTO\s+(?:TABLE\s+)?FUNCTION\s+(\w+)\s*\("
)


def parse_insert_table_function(sql: str):
    """``(name, args, cols, select_sql)`` for an INSERT INTO [TABLE]
    FUNCTION statement, else None. ``cols`` is the optional column list;
    ``select_sql`` is the SELECT/VALUES tail, untranslated (the caller
    runs it through the full dialect pipeline)."""
    m = _INSERT_TF_RE.match(sql)
    if not m:
        return None
    name = m.group(1)
    # a table literally named "function" (`INSERT INTO function VALUES …`)
    # must fall through to plain SQL — only known table-function names
    # (incl. jar-gated ones, which error loudly in the dispatcher) engage
    if name.lower() not in {n.lower() for n in _TABLE_FUNCTION_NAMES}:
        return None
    inner, end = _balanced(sql, m.end() - 1)
    args = _split_args(inner) if inner.strip() else []
    rest = sql[end:].strip()
    cols: list[str] | None = None
    if rest.startswith("("):
        cinner, cend = _balanced(rest, 0)
        cols = [c.strip().strip("`") for c in _split_args(cinner)]
        rest = rest[cend:].strip()
    rest = rest.rstrip(";").strip()
    if not rest:
        raise ValueError(
            "INSERT INTO TABLE FUNCTION: missing SELECT/VALUES source"
        )
    if re.match(r"(?is)^VALUES\b", rest):
        # VALUES tail → a SELECT the dialect pipeline can run unchanged
        # (Spark SQL accepts inline VALUES as a relation)
        rest = f"SELECT * FROM {rest}"
    return name, args, cols, rest


def _parse_remote_args(lit: list[str]) -> tuple[str, str, str, str]:
    """(database, table, user, password) from remote()/remoteSecure()
    args AFTER the host. CH resolves the dotted form by the SECOND
    argument's shape, not the arg count: remote(host, 'db.table'[,
    user[, pw]]) vs remote(host, db, table[, user[, pw]]) — database
    names cannot contain dots. Shared by the read lane
    (resolve_table_functions) and the write lane (write_table_function)
    so both accept the same shapes."""
    if len(lit) < 2:
        return "default", "", "default", ""
    if "." in lit[1]:
        # Split on the FIRST dot: CH qualified names are exactly
        # db.table, and multi-dot identifiers are a parse error there —
        # rpartition would silently mis-split 'a.b.c' into db='a.b'
        # (ADVICE r9).
        if lit[1].count(".") > 1:
            raise ValueError(
                f"remote(): invalid qualified name {lit[1]!r} — "
                "expected 'database.table' (one dot)"
            )
        database, _, table = lit[1].partition(".")
        database = database or "default"
        tail = lit[2:]
    elif len(lit) > 2:
        database, table = lit[1], lit[2]
        tail = lit[3:]
    else:
        database, table = "default", lit[1]
        tail = lit[2:]
    user = tail[0] if tail else "default"
    password = tail[1] if len(tail) > 1 else ""
    return database, table, user, password


def resolve_write_format(fmt_name: str | None, path: str | None):
    """CH format name → ``(spark_fmt, writer_opts)`` for file-shaped
    write targets. Shared by the SQL lane (INSERT INTO TABLE FUNCTION)
    and the Python-API lane (datastore ``_InsertBuilder``) so both map
    CH-specific names ('CSVWithNames', 'TabSeparated', …) identically —
    including CH's HEADERLESS plain CSV/TSV (ADVICE r10, low: the
    Python lane passed the raw name to the Spark writer, failing for
    every CH name and writing a header CH would ingest as data)."""
    from chdb_spark.sources.files import infer_format

    name = (fmt_name or "").lower()
    if name in _TF_FORMATS:
        fmt, opts = _TF_FORMATS[name]
    elif name in {"parquet", "orc", "json", "csv", "avro", "text",
                  "arrow", "feather", "jsonl"}:
        fmt, opts = name, {}  # write_auto aliases feather/jsonl itself
    elif name:
        # an EXPLICITLY requested format this writer cannot produce must
        # refuse, not silently substitute the path extension's format
        # (r11 review — a consumer expecting Native/Arrow bytes would
        # read garbage)
        raise NotImplementedError(
            f"write format {fmt_name!r}: writable formats are "
            f"{sorted(set(_TF_FORMATS))}"
        )
    else:
        fmt, opts = (infer_format(path) if path else None) or "parquet", {}
    return fmt, {k: v for k, v in opts.items() if k in ("header", "sep")}


def write_table_function(spark, name: str, args: list[str], df,
                         http_factory=None) -> None:
    """Dispatch a DataFrame write to a table-function target — the write
    half of :func:`resolve_table_functions`. CH INSERT semantics: rows
    are APPENDED to the target. Every write stays distributed (Spark
    writers / per-partition HTTP posts / the jar-free lakehouse
    clients); unsupported targets fail loudly."""
    kind = name.lower()
    lit = [_tf_literal(a) or a.strip().strip("'\"") for a in args]
    if kind == "file":
        if not lit:
            raise ValueError("file(): missing path")
        path = lit[0]
        fmt_name = (lit[1] if len(lit) > 1 else "").lower()
        from chdb_spark.sinks import write_auto

        fmt, wopts = resolve_write_format(fmt_name, path)
        write_auto(df, path, fmt, mode="append", **wopts)
    elif kind in ("remote", "remotesecure"):
        from chdb_spark.sources.remote_ch import to_clickhouse

        host = lit[0] if lit else ""
        database, table, user, password = _parse_remote_args(lit)
        if not host or not table:
            raise ValueError(
                "remote(): host and table are required — "
                "remote('host:port', 'db', 'table'[, user[, password]]) "
                "or remote('host:port', 'db.table'[, user[, password]])"
            )
        to_clickhouse(
            df, host, database, table, user=user, password=password,
            secure=(kind == "remotesecure"), if_exists="append",
            http_factory=http_factory,
        )
    elif kind == "deltalake":
        from chdb_spark.sources.delta_py import write_delta_py

        write_delta_py(df, lit[0], mode="append")
    elif kind == "iceberg":
        from chdb_spark.sources.iceberg_py import write_iceberg_py

        write_iceberg_py(df, lit[0], mode="append")
    elif kind == "url":
        from chdb_spark.sources.uri import write_url

        write_url(df, lit[0], lit[1] if len(lit) > 1 else "CSVWithNames")
    elif kind in ("s3", "gcs", "hdfs", "azureblobstorage"):
        # object-store INSERT (reference table_functions.py:316+): write
        # through the Hadoop FS layer WHEN the classpath provides the
        # scheme (jar probe); credentials belong in cluster conf. The
        # write itself is the plain distributed Spark writer.
        from chdb_spark.sinks import write_auto

        target = lit[0] if lit else ""
        if not _hadoop_fs_available(spark, target):
            raise NotImplementedError(
                f"INSERT INTO TABLE FUNCTION {name}({target!r}): no "
                "Hadoop FileSystem for this scheme on the classpath — "
                "add the cloud-storage jars (hadoop-aws / gcs-connector "
                "/ hadoop-azure)"
            )
        fmt_name = ""
        for extra in lit[1:]:
            if (extra or "").lower() in _TF_FORMATS:
                fmt_name = extra.lower()
        fmt, wopts = resolve_write_format(fmt_name, target)
        write_auto(df, target, fmt, mode="append", **wopts)
    else:
        raise NotImplementedError(
            f"INSERT INTO TABLE FUNCTION {name}(...): writable targets "
            "are file/url/remote/remoteSecure/deltaLake/iceberg/"
            "s3/gcs/hdfs/azureBlobStorage (object stores need their "
            "runtime jars; Hudi writes need hudi-spark)"
        )


def _hadoop_fs_available(spark, url: str) -> bool:
    """True when the JVM classpath provides a Hadoop FileSystem for the
    URL's scheme (jar probe — the sandbox has none for cloud schemes,
    so the INSERT surface stays env-gated, not silently broken)."""
    try:
        jvm = spark.sparkContext._jvm
        uri = jvm.java.net.URI(url)
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)
        return True
    except Exception:
        return False


def handle_insert_table_function(sql: str, run_select) -> bool:
    """Shared INSERT-INTO-FUNCTION dispatch for both query lanes
    (session.query and stateful.Session.query): parse, run the SELECT
    through the caller's own pipeline (``run_select(select_sql) ->
    DataFrame``), map the optional column list POSITIONALLY onto the
    SELECT output (CH semantics — names need not match), write, return
    True. Returns False when the statement is not an INSERT-TF."""
    ins = parse_insert_table_function(sql)
    if ins is None:
        return False
    name, args, cols, select_sql = ins
    df = run_select(select_sql)
    if cols:
        if len(cols) != len(df.columns):
            raise ValueError(
                f"INSERT INTO TABLE FUNCTION {name}: column list has "
                f"{len(cols)} names but the source produces "
                f"{len(df.columns)} columns"
            )
        df = df.toDF(*cols)
    write_table_function(df.sparkSession, name, args, df)
    return True


#: names SQL text can call as table functions (the _TF_RE set + generators)
_TABLE_FUNCTION_NAMES = (
    "azureBlobStorage deltaLake file gcs generateRandom hdfs hudi iceberg "
    "mongodb mysql numbers numbers_mt postgresql python redis remote "
    "remoteSecure s3 sqlite url"
).split()


def resolve_system_tables(spark, sql: str) -> str:
    """Materialize any referenced ``system.*`` introspection table as a temp
    view (fresh catalog snapshot per query). ``rewrite`` has already mapped
    ``system.X`` → ``__system_X``; this registers the view content.

    Temp views surface under ``currentDatabase()`` with ``is_temporary=1``
    (CH session tables live in a real database; Spark's catalog reports
    them databaseless — folding them into the current database keeps the
    reference's ``WHERE database = currentDatabase()`` introspection
    working). Catalog sizes are small by nature — these never touch data.
    """
    kinds = set(_SYS_VIEW_RE.findall(sql))
    for kind in kinds:
        rows, schema = _system_view_rows(spark, kind)
        spark.createDataFrame(rows, schema).createOrReplaceTempView(
            f"__system_{kind}"
        )
    return sql


def _system_view_rows(spark, kind: str):
    current = spark.catalog.currentDatabase()
    if kind == "databases":
        return (
            [(db.name, "Memory") for db in spark.catalog.listDatabases()],
            "name string, engine string",
        )
    if kind == "tables":
        rows = []
        for db in spark.catalog.listDatabases():
            for t in spark.catalog.listTables(db.name):
                # listTables(db) repeats every temp view for each db iterated;
                # fold temp views into the current database exactly once
                if t.isTemporary and db.name != current:
                    continue
                rows.append(
                    (
                        t.namespace[0] if t.namespace else current,
                        t.name,
                        "View" if t.tableType in ("VIEW", "TEMPORARY") else "MergeTree",
                        1 if t.isTemporary else 0,
                    )
                )
        return rows, "database string, name string, engine string, is_temporary int"
    if kind == "columns":
        from chdb_spark.formats import ch_type_name

        rows = []
        for t in spark.catalog.listTables(current):
            ref = t.name if t.isTemporary else f"{t.namespace[0]}.{t.name}"
            try:
                schema = spark.table(ref).schema
            except Exception:
                continue
            for pos, f in enumerate(schema.fields, start=1):
                rows.append(
                    (current, t.name, f.name, ch_type_name(f.dataType, f.nullable), pos)
                )
        return rows, "database string, table string, name string, type string, position int"
    if kind == "functions":
        from chdb_spark.functions.registry import all_functions

        return (
            [
                (d.name, 1 if d.kind == "AGGREGATE" else 0)
                for d in all_functions().values()
            ],
            "name string, is_aggregate int",
        )
    if kind == "table_functions":
        return [(n,) for n in _TABLE_FUNCTION_NAMES], "name string"
    if kind == "settings":
        from chdb_spark.formats import _RENDER_SETTINGS

        known = {
            "max_threads": str(spark.sparkContext.defaultParallelism),
            "output_format_json_quote_64bit_integers": "1",
            "format_csv_delimiter": ",",
        }
        rows = [(k, v, 0) for k, v in known.items() if k not in _RENDER_SETTINGS]
        rows += [(k, str(v), 1) for k, v in _RENDER_SETTINGS.items()]
        return rows, "name string, value string, changed int"
    if kind == "query_log":
        # CH's query_log is populated only when the server config enables
        # it; here the switch is chdb_spark.utils.trace.enable_trace() —
        # the log view is empty (not an error) while tracing is off.
        import datetime as _dt

        from chdb_spark.utils import trace

        rows = [
            (
                _dt.datetime.fromtimestamp(e["ts"]),
                e["sql"],
                int(e["elapsed"] * 1000),
                int(e["rows"]),
                "QueryFinish",
            )
            for e in trace.get_trace()
        ]
        return rows, (
            "event_time timestamp, query string, query_duration_ms bigint, "
            "result_rows bigint, type string"
        )
    raise ValueError(f"unknown system view: {kind}")


# ---------------------------------------------------------------------------
# QUALIFY (window-function filtering)
# ---------------------------------------------------------------------------

_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_QUALIFY_STOP_RE = re.compile(
    r"\b(ORDER\s+BY|LIMIT|SETTINGS|UNION|INTERSECT|EXCEPT\s+SELECT|WINDOW)\b",
    re.IGNORECASE,
)
_TOP_FROM_RE = re.compile(r"\bFROM\b", re.IGNORECASE)


def _rewrite_qualify(sql: str) -> str:
    """CH ``QUALIFY <cond>`` (filter on window results) → projected flag +
    outer filter: the window expression becomes an inner column ``__q``,
    the outer query keeps ``SELECT * EXCEPT (__q) WHERE __q`` — identical
    semantics, ordinary Catalyst window + filter plan."""
    i = _last_top_level(sql, _QUALIFY_RE)
    if i < 0:
        return sql
    m = _QUALIFY_RE.match(sql, i)
    # condition runs to the next top-level stop keyword (or end)
    j = m.end()
    stop = len(sql)
    k = j
    while k < len(sql):
        c = sql[k]
        if c in "'\"`":
            k = _end_of_string(sql, k)
            continue
        if c == "(":
            _, k = _balanced(sql, k)
            continue
        sm = _QUALIFY_STOP_RE.match(sql, k)
        if sm:
            stop = k
            break
        k += 1
    cond = sql[j:stop].strip()
    head, tail = sql[:i].rstrip(), sql[stop:].strip()
    f = _last_top_level(head, _TOP_FROM_RE)
    if f < 0:
        raise ValueError("QUALIFY without a FROM clause")
    # ...except the FROM we need is the FIRST top-level one (join ON clauses
    # never contain a bare top-level FROM, so first == the table clause)
    depth = 0
    p = 0
    first = -1
    while p < len(head):
        c = head[p]
        if c in "'\"`":
            p = _end_of_string(head, p)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            fm = _TOP_FROM_RE.match(head, p)
            if fm and (p == 0 or head[p - 1] not in _WORD_CHARS):
                first = p
                break
        p += 1
    inner = f"{head[:first].rstrip()}, ({cond}) AS __q {head[first:]}"
    out = f"SELECT * EXCEPT (__q) FROM ({inner}) __qualify WHERE __q"
    return f"{out} {tail}" if tail else out


# ---------------------------------------------------------------------------
# ASOF JOIN (public ClickHouse join kind the reference engine executes
# natively). Spark has no ASOF join; the naive LATERAL-subquery rewrite
# decorrelates into a BroadcastNestedLoopJoin (measured — forbidden by the
# suite plan pins and O(|B|·|distinct keys|) at scale), so the constrained
# form here routes through operators/asof.merge_asof_backward: one
# union + partitioned window, the shape that survives 100 TB.
# ---------------------------------------------------------------------------

_ASOF_RE = re.compile(
    r"\bFROM\s+([`\w.]+)(?:\s+(?:AS\s+)?(\w+))?"
    r"\s+ASOF\s+(LEFT\s+)?JOIN\s+([`\w.]+)(?:\s+(?:AS\s+)?(\w+))?"
    r"\s+ON\s+(.*?)(?=\s+(?:WHERE|GROUP|ORDER|LIMIT|HAVING|QUALIFY|SETTINGS)\b|\s*;?\s*$)",
    re.IGNORECASE | re.DOTALL,
)

_ASOF_SEQ = [0]


def _replace_idents(sql: str, mapping: dict[str, str]) -> str:
    """Replace identifier references outside string literals.

    Keys may be qualified (``alias.col``) or bare column names; longest
    keys replace first so ``q.ts`` wins over ``ts``.
    """
    if not mapping:
        return sql
    keys = sorted(mapping, key=len, reverse=True)
    pat = re.compile(
        r"(?<![\w.`])(" + "|".join(re.escape(k) for k in keys) + r")(?![\w.`(])"
    )
    out, i, n = [], 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"":
            j = _end_of_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        m = pat.match(sql, i)
        if m:
            out.append(mapping[m.group(1)])
            i = m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out)


def resolve_asof_join(spark, sql: str) -> str:
    from pyspark.sql import functions as F  # text module otherwise — lazy
    """Rewrite ``A ASOF [LEFT] JOIN B ON <equi…> AND <one inequality>``
    into a temp view computed by the union+window as-of operator.

    Supported (the ClickHouse-documented contract): table/view relation
    names on both sides, >=1 equality condition, exactly one inequality
    whose backward orientation is ``right.t <= left.t`` (CH's only
    direction). Right-side columns are exposed to the remaining query as
    ``asof_<col>`` and qualified/bare references are rewritten; a column
    collision or unsupported shape raises with the exact reason.
    """
    m = _ASOF_RE.search(sql)
    if not m:
        return sql
    lname, lalias, left_kw, rname, ralias, conds = m.groups()
    ldf = spark.table(lname.replace("`", ""))
    rdf = spark.table(rname.replace("`", ""))
    lq = {q for q in (lalias, lname) if q}
    rq = {q for q in (ralias, rname) if q}

    def side_of(tok: str) -> tuple[str, str]:
        if "." in tok:
            q, c = tok.rsplit(".", 1)
            if q in lq:
                return "l", c
            if q in rq:
                return "r", c
            raise ValueError(f"ASOF JOIN: unknown qualifier {q!r} in {tok!r}")
        in_l, in_r = tok in ldf.columns, tok in rdf.columns
        if in_l and not in_r:
            return "l", tok
        if in_r and not in_l:
            return "r", tok
        raise ValueError(
            f"ASOF JOIN: ambiguous or unknown column {tok!r} — qualify it"
        )

    equi: list[tuple[str, str]] = []
    ineq: list[tuple[str, str, str]] = []
    for cond in re.split(r"\bAND\b", conds, flags=re.IGNORECASE):
        cm = re.match(
            r"\s*([`\w.]+)\s*(<=|>=|<|>|=)\s*([`\w.]+)\s*$", cond.strip()
        )
        if not cm:
            raise ValueError(f"ASOF JOIN: unsupported condition {cond.strip()!r}")
        a, op, b = cm.groups()
        (sa, ca), (sb, cb) = side_of(a.replace("`", "")), side_of(b.replace("`", ""))
        if {sa, sb} != {"l", "r"}:
            raise ValueError(f"ASOF JOIN: condition {cond.strip()!r} must relate both sides")
        lcol, rcol = (ca, cb) if sa == "l" else (cb, ca)
        if op == "=":
            equi.append((lcol, rcol))
        else:
            # normalize to right-vs-left orientation
            op_rl = op if sa == "r" else {"<": ">", ">": "<", "<=": ">=", ">=": "<="}[op]
            ineq.append((rcol, op_rl, lcol))
    if not equi:
        raise ValueError("ASOF JOIN needs at least one equality condition")
    if len(ineq) != 1:
        raise ValueError("ASOF JOIN needs exactly one inequality condition")
    r_on, op_rl, l_on = ineq[0]
    if op_rl not in ("<=", "<"):
        raise ValueError(
            "ASOF JOIN: only the backward form (right.ts <= left.ts) is "
            "supported — the ClickHouse default direction"
        )

    from chdb_spark.operators.asof import merge_asof_backward

    by = [lc for lc, _ in equi]
    r2 = rdf
    for lc, rc in equi:
        if rc != lc:
            r2 = r2.withColumnRenamed(rc, lc)
    if r_on != l_on:
        if l_on in r2.columns:
            raise ValueError(
                f"ASOF JOIN: right side has a column named {l_on!r} distinct "
                f"from its asof key {r_on!r} — rename one side first"
            )
        r2 = r2.withColumnRenamed(r_on, l_on)
    right_vals = [c for c in r2.columns if c not in by and c != l_on]
    out = merge_asof_backward(ldf, r2, on=l_on, by=by, right_values=right_vals)
    # merge_asof_backward exposes the matched right key as `asof_ts`
    # (operators/asof.py:76) — that IS the right asof column
    if not left_kw:  # inner: drop left rows with no as-of match
        out = out.filter(F.col("asof_ts").isNotNull())

    # expose right columns under their ORIGINAL names when unambiguous
    # (the name CH/DuckDB give them); keep the asof_ prefix on collisions
    renames: dict[str, str] = {}
    for c in rdf.columns:
        if c in by or c == r_on:
            continue
        renames[c] = c if c not in ldf.columns else f"asof_{c}"
    for orig, target in renames.items():
        if f"asof_{orig}" != target:
            out = out.withColumnRenamed(f"asof_{orig}", target)
    r_on_target = r_on if r_on not in ldf.columns else f"asof_{r_on}"
    if r_on_target != "asof_ts" and r_on_target not in out.columns:
        out = out.withColumnRenamed("asof_ts", r_on_target)
    else:
        r_on_target = "asof_ts"

    _ASOF_SEQ[0] += 1
    view = f"__asof_join_{_ASOF_SEQ[0]}"
    out.createOrReplaceTempView(view)

    # splice the FROM segment, then re-qualify the remaining references
    mapping: dict[str, str] = {}
    for q in lq:
        for c in ldf.columns:
            mapping[f"{q}.{c}"] = c
    for q in rq:
        for lc, rc in equi:
            mapping[f"{q}.{rc}"] = lc  # r.k == l.k by construction
        mapping[f"{q}.{r_on}"] = r_on_target
        for c in rdf.columns:
            if c not in by and c != r_on:
                mapping.setdefault(f"{q}.{c}", renames[c])
    head = sql[: m.start()] + f"FROM {view}"
    rest = sql[m.end():]
    return _replace_idents(head, mapping) + _replace_idents(rest, mapping)


# ---------------------------------------------------------------------------
# ANY JOIN (public ClickHouse join strictness: at most one right row per
# left row). ClickHouse picks an ARBITRARY matching row; that is
# unreproducible across engines, so this rewrite uses the deterministic
# refinement "smallest right tuple" (all right columns ascending, NULLS
# LAST) — a documented divergence (COVERAGE.md) that is a valid ANY
# answer and lets an oracle replay it bit-for-bit.
# ---------------------------------------------------------------------------

_ANY_RE = re.compile(
    r"\b(?:(LEFT|INNER|RIGHT)\s+ANY|ANY\s+(LEFT|INNER|RIGHT)?)\s*JOIN\s+([`\w.]+)"
    r"(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+(.*?)"
    r"(?=\s+(?:WHERE|GROUP|ORDER|LIMIT|HAVING|QUALIFY|SETTINGS|LEFT|RIGHT|INNER|CROSS|JOIN|UNION)\b|\s*;?\s*$)",
    re.IGNORECASE | re.DOTALL,
)


def resolve_any_join(spark, sql: str) -> str:
    """Rewrite ``[LEFT|INNER] ANY JOIN rel ON <equi conds>`` to a plain
    join against the right side deduplicated to one row per join key
    (deterministic smallest-tuple pick via a partitioned row_number —
    a per-key-bounded window, no global sort)."""
    m = _ANY_RE.search(sql)
    if not m:
        return sql
    kind = (m.group(1) or m.group(2) or "INNER").upper()
    if kind == "RIGHT":
        raise ValueError(
            "RIGHT ANY JOIN is not supported — swap the sides and use "
            "LEFT ANY JOIN (the deduped side must be the right operand)"
        )
    rname = m.group(3).replace("`", "")
    ralias = m.group(4) or rname
    conds = m.group(5)
    rcols = spark.table(rname).columns
    keys = []
    for cond in re.split(r"\bAND\b", conds, flags=re.IGNORECASE):
        cm = re.match(r"\s*([`\w.]+)\s*=\s*([`\w.]+)\s*$", cond.strip())
        if not cm:
            raise ValueError(
                f"ANY JOIN: only equality conditions are supported, got "
                f"{cond.strip()!r}"
            )
        for tok in cm.groups():
            tok = tok.replace("`", "")
            if "." in tok:
                q, c = tok.rsplit(".", 1)
                if q in (ralias, rname):
                    keys.append(c)
            elif tok in rcols:
                keys.append(tok)
    if not keys:
        raise ValueError("ANY JOIN: no right-side equality key found")
    order = ", ".join(f"{c} ASC NULLS LAST" for c in rcols)
    proj = ", ".join(rcols)
    dedup = (
        f"(SELECT {proj} FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {', '.join(dict.fromkeys(keys))} ORDER BY {order}) "
        f"AS __rn FROM {rname}) WHERE __rn = 1) AS {ralias}"
    )
    joined = f" {'LEFT' if kind == 'LEFT' else 'INNER'} JOIN {dedup} ON {conds}"
    out = sql[: m.start()] + joined + sql[m.end():]
    # there may be several ANY JOINs — resolve the rest recursively
    return resolve_any_join(spark, out)
