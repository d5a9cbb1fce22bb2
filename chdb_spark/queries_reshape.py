"""Reshaping & multidimensional aggregation batch — the pandas-surface ops
the reference executes pandas-side (SURVEY §2.7: melt/stack, pivot_table,
crosstab, get_dummies, cut/qcut, value_counts — reference pandas_compat.py:
1553,1591,1039; pandas_api.py:1958,2013,1740,1662,1712) re-expressed as
pure Spark relational plans, plus the grouping-sets family the reference
only reaches via raw SQL (SURVEY §2.5: cube/rollup/GROUPING SETS).

Scale posture: every reshape here is a projection or a grouped aggregate —
melt is a lateral explode of a constant-width struct array (row count × K,
no shuffle), one-hot is K conditional projections, cut/qcut are expression
buckets (qcut's quantile bounds come from one tiny agg broadcast back), and
cube/grouping-sets expand inside Catalyst's Expand operator with partial
aggregation — all linear, no driver-side pivots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table


# --- melt / unpivot --------------------------------------------------------


@defquery(
    "r1_melt",
    """
    SELECT l_returnflag, metric, round(sum(val), 2) AS total
    FROM (
        SELECT l_returnflag, metric, val
        FROM lineitem
        UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_tax))
    )
    GROUP BY l_returnflag, metric
    ORDER BY l_returnflag, metric
    """,
    doc="melt/unpivot three measures into (metric, val) rows, then aggregate.",
)
def r1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    melted = li.melt(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        melted.groupBy("l_returnflag", "metric")
        .agg(F.round(F.sum("val"), 2).alias("total"))
        .orderBy("l_returnflag", "metric")
    )


# --- crosstab --------------------------------------------------------------


@defquery(
    "r2_crosstab",
    """
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_linestatus = 'F') AS F,
           count(*) FILTER (WHERE l_linestatus = 'O') AS O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="pd.crosstab(returnflag, linestatus) → groupBy + pivoted counts.",
)
def r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
        .orderBy("l_returnflag")
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
    )


# --- get_dummies (one-hot) -------------------------------------------------


@defquery(
    "r3_get_dummies",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pri_urgent,
           CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS pri_high,
           CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END
               AS pri_other
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """,
    doc="get_dummies → K conditional 0/1 projections (no shuffle at all).",
)
def r3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    pri = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.when(pri == "1-URGENT", 1).otherwise(0).alias("pri_urgent"),
        F.when(pri == "2-HIGH", 1).otherwise(0).alias("pri_high"),
        F.when(~pri.isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("pri_other"),
    ).orderBy("o_orderkey")


# --- cut (fixed bins) ------------------------------------------------------


@defquery(
    "r4_cut",
    """
    SELECT CASE WHEN l_quantity <= 10 THEN 'low'
                WHEN l_quantity <= 30 THEN 'mid'
                ELSE 'high' END AS qty_bin,
           count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
             / count(l_extendedprice) AS avg_price
    FROM lineitem GROUP BY qty_bin ORDER BY qty_bin
    """,
    doc="pd.cut with explicit edges → chained when buckets.",
)
def r4(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    bin_ = (
        F.when(F.col("l_quantity") <= 10, "low")
        .when(F.col("l_quantity") <= 30, "mid")
        .otherwise("high")
    )
    return (
        li.groupBy(bin_.alias("qty_bin"))
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).cast("double")
                / F.count("l_extendedprice")
            ).alias("avg_price"),
        )
        .orderBy("qty_bin")
    )


# --- qcut (quantile bins) --------------------------------------------------


@defquery(
    "r5_qcut",
    """
    WITH b AS (
        SELECT quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.50) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders)
    SELECT CASE WHEN o_totalprice <= q1 THEN 1
                WHEN o_totalprice <= q2 THEN 2
                WHEN o_totalprice <= q3 THEN 3 ELSE 4 END AS quartile,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
    FROM orders, b GROUP BY quartile ORDER BY quartile
    """,
    doc="pd.qcut(4): exact quartile bounds from one 1-row agg broadcast back "
    "over the scan — same no-collect shape as the histogram.",
)
def r5(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # one shared percentile buffer for the three cut points (array form) —
    # three scalar F.percentile aggs buffer the column three times
    # (1.49 s -> 0.77 s median at sf0.1); identical exact-percentile math.
    _qs = F.percentile("o_totalprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75)))
    bounds = o.agg(
        F.element_at(_qs, 1).alias("q1"),
        F.element_at(_qs, 2).alias("q2"),
        F.element_at(_qs, 3).alias("q3"),
    )
    quartile = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 1)
        .when(F.col("o_totalprice") <= F.col("q2"), 2)
        .when(F.col("o_totalprice") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(quartile.alias("quartile"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("quartile")
    )


# --- cube ------------------------------------------------------------------


@defquery(
    "r6_cube",
    """
    SELECT coalesce(l_returnflag, '(all)') AS rf,
           coalesce(l_linestatus, '(all)') AS ls,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
    doc="CUBE(2 dims): Catalyst Expand + partial agg — 4 grouping sets, one scan "
    "(reference reaches cube only via raw SQL, SURVEY §2.5).",
)
def r6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("ls"),
            "n",
            "qty",
        )
        .orderBy("rf", "ls")
    )


# --- grouping sets ---------------------------------------------------------


@defquery(
    "r7_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status, priority
    """,
    doc="explicit GROUPING SETS via SQL passthrough (spark.sql) — two rollup "
    "dimensions + grand total in one Expand pass.",
)
def r7(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               count(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


# --- stack (wide → long on computed pairs) ---------------------------------


@defquery(
    "r8_stack",
    """
    SELECT part_attr, part_val, count(*) AS n FROM (
        SELECT 'brand' AS part_attr, p_brand AS part_val FROM part
        UNION ALL
        SELECT 'ptype' AS part_attr, p_type AS part_val FROM part
    ) GROUP BY part_attr, part_val
    ORDER BY n DESC, part_attr, part_val LIMIT 20
    """,
    doc="stack two attribute columns into (attr, val) rows via inline struct array.",
)
def r8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    stacked = p.select(
        F.explode(
            F.array(
                F.struct(F.lit("brand").alias("part_attr"), F.col("p_brand").alias("part_val")),
                F.struct(F.lit("ptype").alias("part_attr"), F.col("p_type").alias("part_val")),
            )
        ).alias("s")
    ).select("s.part_attr", "s.part_val")
    return (
        stacked.groupBy("part_attr", "part_val")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "part_attr", "part_val")
        .limit(20)
    )
