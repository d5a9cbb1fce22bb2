"""Schema-evolution union — align heterogeneous snapshots of one logical
table (missing columns → NULL, compatible types widened) and read them as
one relation.

A corpus accumulated over years never has ONE schema: early crawl shards
lack columns added later, a counter migrated int32 → int64, a score
float → double. Spark's reader handles the file-level case
(``mergeSchema``) and ``unionByName(allowMissingColumns=True)`` the
missing-column case, but neither reconciles *types* — a long column in one
snapshot and an int in another fails the union. The reference absorbs this
inside its engine's type unification when UNIONing subqueries (CH
``least_supertype``); :func:`union_by_name_widen` is the explicit
DataFrame-level counterpart:

* columns are matched BY NAME across all inputs (order-free);
* a column absent from an input becomes NULL there;
* each output column gets the least common *widened* type — numeric
  ladder byte→short→int→long, float→double, integer+fractional→double,
  decimal(p,s) pairs→decimal(max(p−s),max(s)) recombined, date→timestamp;
* genuinely incompatible pairs (string vs int, array vs map) raise
  rather than silently stringify — schema drift that changes a column's
  *kind* should fail loudly in a pipeline.

Scale: the operator is pure metadata (schema reconciliation on the
driver) + per-input ``select`` casts — no shuffle, no data movement beyond
the scan itself; column pruning and filter pushdown pass straight through
the casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chdb_spark.queries import defquery, table

_INT_LADDER = ["byte", "short", "integer", "long"]
_SIMPLE = {t: i for i, t in enumerate(_INT_LADDER)}


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common widened type for one column across two inputs."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    if an in _SIMPLE and bn in _SIMPLE:
        return (a, b)[_SIMPLE[bn] > _SIMPLE[an]]
    frac = {"float", "double"}
    if an in frac and bn in frac:
        return T.DoubleType()
    # integer + fractional/decimal → double (standard SQL UNION promotion)
    if (an in _SIMPLE and bn in frac) or (an in frac and bn in _SIMPLE):
        return T.DoubleType()
    if an == "decimal" and bn == "decimal":
        ip = max(a.precision - a.scale, b.precision - b.scale)
        s = max(a.scale, b.scale)
        return T.DecimalType(min(ip + s, 38), s)
    if an == "decimal" and bn in _SIMPLE or bn == "decimal" and an in _SIMPLE:
        d = a if an == "decimal" else b
        ip = max(d.precision - d.scale, 20)
        return T.DecimalType(min(ip + d.scale, 38), d.scale)
    if an == "decimal" and bn in frac or bn == "decimal" and an in frac:
        return T.DoubleType()
    if {an, bn} == {"date", "timestamp"}:
        return T.TimestampType()
    raise TypeError(
        f"union_by_name_widen: incompatible types for one column: "
        f"{a.simpleString()} vs {b.simpleString()} — a kind change "
        "(not a widening) needs an explicit migration cast"
    )


def union_by_name_widen(dfs: list[DataFrame]) -> DataFrame:
    """Union heterogeneous-schema relations by column name: missing columns
    NULL-filled, compatible types widened to the least common type, column
    order = first appearance across inputs."""
    if not dfs:
        raise ValueError("union_by_name_widen: no inputs")
    order: list[str] = []
    types: dict[str, T.DataType] = {}
    for df in dfs:
        for f in df.schema.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
            else:
                types[f.name] = _widen(types[f.name], f.dataType)
    out = None
    for df in dfs:
        have = set(df.columns)
        cols = [
            (F.col(c) if c in have else F.lit(None)).cast(types[c]).alias(c)
            for c in order
        ]
        part = df.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out


@defquery(
    "se1_schema_evolution",
    """
    WITH legacy AS (
      SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars,
             CAST(NULL AS VARCHAR) AS source
      FROM documents WHERE doc_id % 2 = 0
    ), current_snap AS (
      SELECT doc_id, lang, n_chars, source
      FROM documents WHERE doc_id % 2 = 1
    ), unioned AS (
      SELECT * FROM legacy UNION ALL SELECT * FROM current_snap
    )
    SELECT lang,
           count(*) AS n_docs,
           count(n_chars) AS n_with_len,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT source) AS n_sources
    FROM unioned
    GROUP BY lang ORDER BY lang
    """,
    doc="schema-evolution read: a legacy snapshot (doc_id as INT, no "
        "n_chars/source columns) unions with the current snapshot via "
        "union_by_name_widen — missing columns NULL-fill, doc_id widens "
        "int→bigint, and the aggregate sees one relation. The oracle "
        "replays the union with explicit NULL columns in ANSI SQL. Pure "
        "metadata + cast-only projections: no shuffle added, pushdown "
        "intact — the years-of-drift 100 TB read path.",
)
def se1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    legacy = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id").cast("int").alias("doc_id"), "lang")
    )
    current = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars", "source"
    )
    merged = union_by_name_widen([legacy, current])
    return (
        merged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("n_chars").alias("n_with_len"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )
