"""Aggregate-breadth batch — drives the §2.5 families of SURVEY.md that the
TPC-H/ClickBench suites don't reach, each shape against a DuckDB oracle:
conditional aggs (countIf/sumIf/avgIf, reference function_definitions.py:
4919-4979), array aggs (groupArray/groupConcat, :2520-2534), weighted/ratio
aggs (avgWeighted/boundingRatio/sem, :9561-9960), deterministic mode/topK
(:2666), entropy (:9806), equi-width histogram (:5023), linear regression
(:5178), bit aggs (:5123-5151), Welch t-test (:9862-9904), and the full
ranking-window family (§2.6).

Scale posture: every query is expressible as 1-2 hash aggregations (partial+
final) or a single window pass; the only data-size-proportional state is the
per-group accumulator. The histogram and t-test use a 1-row global aggregate
broadcast back over the scan — the same no-collect pattern as TPC-H q11/q15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chdb_spark.queries import defquery, table


# --- conditional aggregates (countIf / sumIf / avgIf) ----------------------


@defquery(
    "g2_conditional_aggs",
    """
    SELECT l_returnflag,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
           CAST(sum(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice END
                         AS DECIMAL(18,2))) AS DOUBLE) AS sum_discounted,
           CAST(sum(CAST(CASE WHEN l_tax > 0.04 THEN l_extendedprice END
                         AS DECIMAL(18,2))) AS DOUBLE)
             / count(CASE WHEN l_tax > 0.04 THEN l_extendedprice END)
               AS avg_taxed,
           floor(min(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END)
                 * 100 + 0.5) / 100 AS min_finished
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="countIf/sumIf/avgIf/minIf → count_if + agg(when(cond, x)); one "
        "grouped pass. Driver-proofing (VERDICT r5): double sums go through "
        "DECIMAL(18,2) — exact AND summation-order-independent, so neither "
        "Spark-vs-DuckDB .xx5 rounding nor parallel reduce order can flip a "
        "digit; the avg derives from the exact sum by one identical IEEE "
        "division; min uses the floor-scaling idiom (see COVERAGE.md "
        "'Documented divergences').",
)
def g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    taxed = F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
            F.sum(dec(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))))
            .cast("double")
            .alias("sum_discounted"),
            (F.sum(dec(taxed)).cast("double") / F.count(taxed)).alias("avg_taxed"),
            (
                F.floor(
                    F.min(F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice")))
                    * 100
                    + 0.5
                )
                / 100
            ).alias("min_finished"),
        )
        .orderBy("l_returnflag")
    )


# --- array aggregates (groupArraySorted / groupConcat) ---------------------


@defquery(
    "g3_group_arrays",
    """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           len(list_sort(list(n_name))) AS n_arr,
           count(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    doc="groupArraySorted → array_sort(collect_list); groupConcat → "
        "concat_ws(sorted). Driver-proofing (VERDICT r5 g3): no raw "
        "array/map column in the checked output — the driver's "
        "canonicalizer can't sort unhashable list cells — so the array agg "
        "is exercised but emitted as its CSV string plus its length.",
)
def g3(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
                "nations_csv"
            ),
            F.size(F.array_sort(F.collect_list("n_name"))).cast("long").alias("n_arr"),
            F.count("*").alias("n"),
        )
        .orderBy("r_name")
    )


# --- weighted / ratio aggregates ------------------------------------------


@defquery(
    "g4_weighted_stats",
    """
    SELECT l_linestatus,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                    * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE)
             / CAST(sum(CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE)
               AS avg_weighted_price,
           round(stddev_samp(l_extendedprice) / sqrt(count(l_extendedprice)), 4)
               AS sem_price,
           round((max(l_extendedprice) - min(l_extendedprice))
                 / (max(l_quantity) - min(l_quantity)), 4) AS bounding_ratio
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    doc="avgWeighted / sem / boundingRatio as agg-expression compositions.",
)
def g4(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_linestatus")
        .agg(
            (
                F.sum(
                    price.cast("decimal(14,2)") * qty.cast("decimal(4,0)")
                ).cast("double")
                / F.sum(qty.cast("decimal(4,0)")).cast("double")
            ).alias("avg_weighted_price"),
            F.round(F.stddev_samp(price) / F.sqrt(F.count(price)), 4).alias(
                "sem_price"
            ),
            F.round((F.max(price) - F.min(price)) / (F.max(qty) - F.min(qty)), 4).alias(
                "bounding_ratio"
            ),
        )
        .orderBy("l_linestatus")
    )


# --- deterministic mode (top-1 by frequency, ties broken by value) --------


@defquery(
    "g5_mode_per_group",
    """
    SELECT event_type, k AS mode_k, n AS mode_count FROM (
        SELECT event_type, k, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, k) AS rn
        FROM (SELECT event_type,
                     CAST(json_extract(props, '$.k') AS BIGINT) % 20 AS k,
                     count(*) AS n
              FROM events GROUP BY event_type, k)
    ) WHERE rn = 1 ORDER BY event_type
    """,
    doc="mode/topK scalable path: groupBy-count + row_number top-1 (deterministic ties).",
)
def g5(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long") % 20
    counts = ev.groupBy("event_type", k.alias("k")).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), "k")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("k").alias("mode_k"), F.col("n").alias("mode_count"))
        .orderBy("event_type")
    )


# --- entropy (two-level aggregation, the 100 TB-scalable form) ------------


@defquery(
    "g6_entropy",
    """
    SELECT user_id % 8 AS user_bucket,
           round(entropy(event_type), 6) AS type_entropy,
           count(*) AS n
    FROM events GROUP BY user_bucket ORDER BY user_bucket
    """,
    doc="Shannon entropy per group: groupBy(key,val).count → -Σ p·log2 p.",
)
def g6(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy((F.col("user_id") % 8).alias("user_bucket"), "event_type").agg(
        F.count("*").alias("cnt")
    )
    tot = Window.partitionBy("user_bucket")
    p = F.col("cnt") / F.sum("cnt").over(tot)
    return (
        counts.withColumn("p", p)
        .groupBy("user_bucket")
        .agg(
            F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("type_entropy"),
            F.sum("cnt").alias("n"),
        )
        .orderBy("user_bucket")
    )


# --- equi-width histogram (global bounds broadcast over the scan) ---------


@defquery(
    "g7_histogram",
    """
    WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 10.0)), 9) AS BIGINT)
               AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS bucket_lo,
           round(max(o_totalprice), 2) AS bucket_hi
    FROM orders, b
    GROUP BY bucket ORDER BY bucket
    """,
    doc="histogram(10): 1-row min/max agg broadcast → floor-bucket groupBy; no collect.",
)
def g7(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10.0)
        ),
        F.lit(9),
    ).cast("long")
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_lo"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_hi"),
        )
        .orderBy("bucket")
    )


# --- simple linear regression (closed form) -------------------------------


@defquery(
    "g8_linear_regression",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="simpleLinearRegression → regr_slope/intercept/r2 (single-pass moments).",
)
def g8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 2).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --- bit aggregates --------------------------------------------------------


@defquery(
    "g9_bit_aggs",
    """
    SELECT o_orderstatus,
           bit_and(o_custkey) AS and_key,
           bit_or(o_custkey) AS or_key,
           bit_xor(o_custkey) AS xor_key
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="groupBitAnd/Or/Xor → bit_and/bit_or/bit_xor.",
)
def g9(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_custkey").alias("and_key"),
            F.bit_or("o_custkey").alias("or_key"),
            F.bit_xor("o_custkey").alias("xor_key"),
        )
        .orderBy("o_orderstatus")
    )


# --- Welch two-sample t-test (closed form from grouped moments) -----------


@defquery(
    "g10_welch_ttest",
    """
    SELECT CAST(sum(CAST(floor(CASE WHEN event_type = 'click' THEN value END
                               * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             / count(CASE WHEN event_type = 'click' THEN value END)
               AS mean_click,
           CAST(sum(CAST(floor(CASE WHEN event_type = 'view' THEN value END
                               * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             / count(CASE WHEN event_type = 'view' THEN value END)
               AS mean_view,
           round((avg(CASE WHEN event_type = 'click' THEN value END)
                  - avg(CASE WHEN event_type = 'view' THEN value END))
                 / sqrt(var_samp(CASE WHEN event_type = 'click' THEN value END)
                        / count(CASE WHEN event_type = 'click' THEN value END)
                        + var_samp(CASE WHEN event_type = 'view' THEN value END)
                        / count(CASE WHEN event_type = 'view' THEN value END)), 4)
               AS t_stat
    FROM events WHERE event_type IN ('click', 'view')
    """,
    doc="welchTTest → closed-form t-statistic from conditional moments, one pass "
    "(reference :9862-9904; no scipy, no applyInPandas needed).",
)
def g10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    t = (F.avg(click) - F.avg(view)) / F.sqrt(
        F.var_samp(click) / F.count(click) + F.var_samp(view) / F.count(view)
    )
    return ev.agg(
        (
            F.sum(F.floor(click * 100 + 0.5)).cast("double") / 100.0 / F.count(click)
        ).alias("mean_click"),
        (
            F.sum(F.floor(view * 100 + 0.5)).cast("double") / 100.0 / F.count(view)
        ).alias("mean_view"),
        F.round(t, 4).alias("t_stat"),
    )


# --- full ranking-window family -------------------------------------------


@defquery(
    "w4_ranking_family",
    """
    SELECT n_name, c_name,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           nth_value(c_name, 2) OVER (PARTITION BY n_name
               ORDER BY c_acctbal DESC, c_name
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_richest
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_nationkey < 5
    WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_name)
    ORDER BY n_name, rnk, c_name
    """,
    doc="rank/dense_rank/ntile/percent_rank/cume_dist/nth_value in one window pass.",
)
def w4(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    n = F.broadcast(table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_name")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        c.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "c_name",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.nth_value("c_name", 2).over(wf).alias("second_richest"),
        )
        .orderBy("n_name", "rnk", "c_name")
    )
