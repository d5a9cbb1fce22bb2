"""Auto-derive ClickHouse-dialect SQL templates from the function registry.

The registry (chdb_spark/functions/) holds a pyspark Column builder for all
~810 reference clickhouse_names; the dialect's hand-written _FUNCS map only
covers ~280 as SQL text. This tool closes the gap mechanically (VERDICT r4
item 1): for each uncovered name it applies the registry builder to marker
expressions, serializes the resulting Catalyst tree back to SQL via
``Column._jc.node().sql()``, substitutes test arguments, and VALIDATES the
rendered SQL by executing both forms (spark.sql text vs DataFrame builder)
on a typed test relation and comparing values. Only validated (name, arity)
templates are emitted to ``chdb_spark/dialect_gen.py``; failures land in a
ledger with the failure class so the completeness test can pin the split.

Run: python tools/gen_dialect_templates.py   (writes dialect_gen.py)
"""

from __future__ import annotations

import inspect
import math
import os
import re
import sys

sys.path.insert(0, "/root/repo")
# regenerating: the dialect must NOT preload the previous generated
# templates, or they'd drop out of the candidate set and be lost
os.environ["CHDB_SPARK_SKIP_GENERATED_TEMPLATES"] = "1"

MARKERS = [f"__arg{i}__" for i in range(6)]

#: typed test columns for validation (3 rows, NULLs included)
TEST_DDL = """
SELECT * FROM VALUES
  (1L, 3L, 1.5D, 'hello world', 'lo', array(3L, 1L, 2L), array(1.0D, 2.0D),
   map('a', 1L, 'b', 2L), timestamp'2024-03-15 10:30:00', date'2024-03-15',
   '{"a": 1, "b": {"c": "x"}}', '192.168.1.10', true),
  (2L, 5L, 2.5D, 'Spark SQL', 'ar', array(5L, 4L), array(3.0D, 4.0D),
   map('c', 3L), timestamp'2024-06-01 00:00:00', date'2024-06-01',
   '{"a": 2, "b": {"c": "y"}}', '10.0.0.1', false),
  (4L, 2L, 4.0D, 'abc', 'b', array(7L), array(6.0D),
   map('d', 4L), timestamp'2023-12-31 23:59:59', date'2023-12-31',
   '{"a": 3}', '8.8.8.8', true)
  AS t(i1, i2, d1, s1, s2, arr1, darr1, mp1, ts1, dt1, js1, ip1, b1)
"""

#: candidate argument tuples per arity — column names from the test
#: relation plus literal ints (for count/scale-style positions)
POOL1 = ["s1", "i1", "d1", "arr1", "darr1", "ts1", "dt1", "js1", "ip1", "mp1", "b1", "3", "s2"]
POOL2 = [
    ("s1", "s2"), ("s1", "3"), ("i1", "i2"), ("i1", "3"), ("d1", "3"),
    ("arr1", "3"), ("arr1", "i1"), ("arr1", "arr1"), ("darr1", "darr1"),
    ("ts1", "3"), ("ts1", "ts1"), ("dt1", "dt1"), ("js1", "s2"),
    ("mp1", "s2"), ("s1", "i1"), ("d1", "d1"), ("ts1", "s2"), ("dt1", "3"),
    ("i1", "b1"), ("d1", "b1"), ("s2", "s1"), ("'%Y'", "ts1"),
    ("mp1", "mp1"), ("darr1", "3"),
]
POOL3 = [
    ("s1", "s2", "3"), ("s1", "s2", "s2"), ("s1", "3", "3"), ("i1", "i2", "3"),
    ("arr1", "3", "3"), ("arr1", "i1", "i2"), ("d1", "3", "3"),
    ("ts1", "ts1", "3"), ("js1", "s2", "s2"), ("d1", "d1", "d1"),
    ("darr1", "darr1", "3"),
    ("i1", "i2", "b1"), ("3", "i1", "i2"), ("ts1", "3", "s2"),
    ("dt1", "dt1", "3"), ("s1", "s2", "i1"),
]
POOL4 = [
    ("s1", "s2", "3", "3"), ("i1", "i2", "3", "3"), ("d1", "d1", "d1", "d1"),
    ("i1", "i2", "i1", "i2"), ("arr1", "3", "3", "3"),
]
POOL5 = [
    ("3", "3", "3", "3", "3"), ("d1", "d1", "d1", "d1", "d1"),
    ("i1", "i2", "3", "3", "3"), ("0.1", "0.2", "0.05", "0.8", "0.05"),
]
POOL6 = [
    ("2024", "3", "15", "10", "30", "0"), ("d1", "d1", "d1", "d1", "d1", "d1"),
]
POOLS = {1: [(a,) for a in POOL1], 2: POOL2, 3: POOL3, 4: POOL4, 5: POOL5, 6: POOL6}

# Catalyst prints UNRESOLVED binary operators prefix-style (`+(a, b)`); make
# them infix so the template re-parses. String literals are skipped.
_PREFIX_OPS = ("<=>", "==", ">=", "<=", "!=", "+", "-", "*", "/", "%", "&",
               "|", "^", "=", "<", ">")


def _fix_prefix_ops(sql: str) -> str:
    import chdb_spark.dialect as D

    i = 0
    out = []
    n = len(sql)
    while i < n:
        c = sql[i]
        if c in "'`":
            j = D._end_of_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        hit = None
        for op in _PREFIX_OPS:
            if sql.startswith(op + "(", i):
                prev = sql[i - 1] if i else ""
                if prev == "" or prev in " (,[":
                    hit = op
                break
        if hit is None:
            out.append(c)
            i += 1
            continue
        inner, end = D._balanced(sql, i + len(hit))
        args = [_fix_prefix_ops(a) for a in D._split_args(inner)]
        if len(args) == 2:
            out.append(f"({args[0]} {hit} {args[1]})")
        elif len(args) == 1 and hit == "-":
            out.append(f"(- {args[0]})")
        else:  # unexpected shape — leave as-was; validation will reject
            out.append(f"{hit}({', '.join(args)})")
        i = end
    return "".join(out)

#: names whose output is nondeterministic — validate parse+type only
NONDET_PREFIXES = ("rand", "generate", "now", "today", "yesterday", "uptime",
                   "filesystem", "sleep", "UUID", "serverUUID",
                   "arrayShuffle", "arrayPartialShuffle")

_DEC_LIT_RE = re.compile(r"(?<![\w.'])(\d+\.\d+)(?![\w.eED])")


def _fix_double_literals(sql: str) -> str:
    """Builders write Python floats; the unresolved printer emits `0.0`,
    which Spark SQL parses as DECIMAL(1,1) and breaks type-strict HOFs
    (aggregate's zero must match the merge type). Suffix bare decimal
    literals outside strings with D (double)."""
    import chdb_spark.dialect as D

    out, i, n = [], 0, len(sql)
    while i < n:
        if sql[i] in "'`":
            j = D._end_of_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        m = _DEC_LIT_RE.match(sql, i)
        if m:
            out.append(m.group(1) + "D")
            i = m.end()
            continue
        out.append(sql[i])
        i += 1
    return "".join(out)


def _plausible_arities(fn) -> list[int]:
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return [1, 2, 3]
    required = 0
    optional = 0
    varargs = False
    for p in sig.parameters.values():
        if p.kind in (p.VAR_POSITIONAL,):
            varargs = True
        elif p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            if p.default is p.empty:
                required += 1
            else:
                optional += 1
    if varargs:
        return sorted({max(1, required), required + 1, required + 2})
    hi = min(required + optional, 6)
    return list(range(max(1, required), max(1, hi) + 1))


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_values_equal(a[k], b[k]) for k in a)
    return a == b


def main() -> None:
    import chdb_spark.dialect as D
    from chdb_spark.functions import registry
    from chdb_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    test_df = spark.sql(TEST_DDL)
    test_df.createOrReplaceTempView("__gen_t")

    ref_names = set(
        re.findall(
            r"clickhouse_name\s*=\s*'([^']+)'",
            open("/root/reference/datastore/function_definitions.py").read(),
        )
    )
    handled = set(D._FUNCS) | set(D._PARAMETRIC)
    spark_native = {
        r.function.lower() for r in spark.sql("SHOW FUNCTIONS").collect()
    }
    all_defs = registry.all_functions()
    candidates = sorted(
        n for n in ref_names if n not in handled and n in all_defs
    )
    print(f"{len(candidates)} candidate names", flush=True)

    templates: dict[str, dict[int, str]] = {}
    ledger: dict[str, str] = {}

    for name in candidates:
        if name.lower() in spark_native:
            # rewrite() must stay the identity on valid Spark SQL: native
            # names pass through; true semantic mismatches (position-style
            # arg swaps, CH transform) are HAND-written in dialect._FUNCS
            continue
        d = all_defs[name]
        if d.kind == "TABLE":
            ledger[name] = "TABLE-kind: DataFrame-level operator (registry fn() API)"
            continue
        if d.is_udf:
            ledger[name] = "Python-UDF-backed: no SQL-text form"
            continue
        builder = d.func
        got_any = False
        last_err = ""
        for k in _plausible_arities(builder):
            try:
                col = builder(*[F.expr(m) for m in MARKERS[:k]])
                sql = _fix_double_literals(_fix_prefix_ops(col._jc.node().sql()))
            except Exception as e:
                last_err = f"build@{k}: {type(e).__name__}"
                continue
            if any(m not in sql for m in MARKERS[:k]):
                last_err = f"arity@{k}: marker dropped"
                continue
            if "namedlambdavariable" in sql or "lambdafunction" in sql:
                last_err = "HOF lambda not serializable to SQL text"
                continue
            if "columnnodeexpression" in sql.lower():
                last_err = "pandas-UDF kernel — no SQL-text form"
                continue
            # validate: substitute candidate args, run both forms, compare
            validated = False
            nondet = name.startswith(NONDET_PREFIXES)
            for args in POOLS.get(k, []):
                rendered = sql
                for i, a in enumerate(args):
                    rendered = rendered.replace(MARKERS[i], a)
                try:
                    got = spark.sql(
                        f"SELECT {rendered} AS v FROM __gen_t"
                    ).collect()
                except Exception:
                    continue
                if nondet:
                    validated = True
                    break
                try:
                    exp_col = builder(*[F.expr(a) for a in args])
                    exp = test_df.select(exp_col.alias("v")).collect()
                except Exception:
                    continue
                if len(got) == len(exp) and all(
                    _values_equal(g["v"], e["v"]) for g, e in zip(got, exp)
                ):
                    validated = True
                    break
            if validated:
                templates.setdefault(name, {})[k] = sql
                got_any = True
            else:
                last_err = last_err or f"validate@{k}: no arg tuple matched"
        if not got_any:
            ledger[name] = last_err or "no arity produced serializable SQL"

    # ---- emit ---------------------------------------------------------
    out = [
        '"""AUTO-GENERATED by tools/gen_dialect_templates.py — do not edit.',
        "",
        "SQL-text rewrite templates derived from the function registry's",
        "Column builders (Catalyst tree -> .sql()), validated by executing",
        "template vs builder on a typed relation and comparing values.",
        "Markers __argN__ are replaced with the (already-rewritten) call",
        'arguments at rewrite time. LEDGER holds names deliberately not'
        ' templated, with the reason."""',
        "",
        "TEMPLATES: dict[str, dict[int, str]] = {",
    ]
    for name in sorted(templates):
        out.append(f"    {name!r}: {{")
        for k in sorted(templates[name]):
            out.append(f"        {k}: {templates[name][k]!r},")
        out.append("    },")
    out.append("}")
    out.append("")
    out.append("LEDGER: dict[str, str] = {")
    for name in sorted(ledger):
        out.append(f"    {name!r}: {ledger[name]!r},")
    out.append("}")
    out.append("")
    with open("/root/repo/chdb_spark/dialect_gen.py", "w") as f:
        f.write("\n".join(out))
    print(
        f"templates: {len(templates)}  ledger: {len(ledger)}  "
        f"(spark-native passthrough: "
        f"{len([n for n in ref_names - handled if n not in all_defs or n.lower() in spark_native])})"
    )
    from collections import Counter

    print(Counter(v.split(":")[0] for v in ledger.values()))


if __name__ == "__main__":
    main()
