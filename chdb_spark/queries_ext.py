"""Extended query batch — exercises the function-registry surface end-to-end
(JSON, string, datetime, statistics, pivot/reshape, set ops, quantiles),
each with a DuckDB oracle. These are the §2.8 function families of SURVEY.md
driven through real queries rather than unit calls, so the driver's
correctness gate covers the registry the way users hit it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table


# --- JSON (SURVEY §2.8-JSON; reference function_definitions.py:3896-4324) ---


@defquery(
    "f1_json_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           round(avg(value), 2) AS avg_value
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY k_mod ORDER BY k_mod
    """,
    doc="get_json_object → numeric extraction, grouped aggregation.",
)
def f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    # k%10 is NULL iff k is NULL, so dropping the NULL group AFTER the
    # aggregation is row-identical to the WHERE — and parses the JSON
    # ONCE per row (a pre-agg filter makes Filter and Project each
    # evaluate get_json_object: no cross-operator subexpression
    # elimination in codegen). Measured 0.87 → 0.68 s at sf0.1.
    return (
        ev.groupBy((k % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 2).alias("avg_value"))
        .filter(F.col("k_mod").isNotNull())
        .orderBy("k_mod")
    )


# --- STRING (reference :61-1051) ---


@defquery(
    "f2_string_funcs",
    """
    SELECT upper(substr(c_name, 1, 8)) AS prefix,
           min(length(c_name))::BIGINT AS min_len,
           max(length(replace(c_name, '0', ''))) ::BIGINT AS max_len_no0,
           count(*) AS n
    FROM customer
    WHERE c_name LIKE 'CUST%' AND ends_with(c_name, '1')
    GROUP BY prefix ORDER BY prefix LIMIT 20
    """,
    doc="upper/substring/length/replace/like/endsWith through a grouped scan.",
)
def f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").like("CUST%") & F.col("c_name").endswith("1"))
        .groupBy(F.upper(F.substring("c_name", 1, 8)).alias("prefix"))
        .agg(
            F.min(F.length("c_name")).cast("long").alias("min_len"),
            F.max(F.length(F.replace(F.col("c_name"), F.lit("0"), F.lit("")))).cast("long").alias("max_len_no0"),
            F.count("*").alias("n"),
        )
        .orderBy("prefix")
        .limit(20)
    )


# --- DATETIME (reference :1077-1826) ---


@defquery(
    "f3_datetime_funcs",
    """
    SELECT EXTRACT(year FROM o_orderdate)::INT AS yr,
           EXTRACT(quarter FROM o_orderdate)::INT AS qtr,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE EXTRACT(dow FROM o_orderdate) NOT IN (0, 6)
    GROUP BY yr, qtr ORDER BY yr, qtr
    """,
    doc="year/quarter/dayofweek extraction + weekday filter (toYear/toQuarter/toDayOfWeek).",
)
def f3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dow: 0=Sunday..6=Saturday
    dow = F.dayofweek("o_orderdate") - 1
    return (
        o.filter(~dow.isin(0, 6))
        .groupBy(F.year("o_orderdate").alias("yr"), F.quarter("o_orderdate").alias("qtr"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("yr", "qtr")
    )


# --- statistics (reference :2451-2679,12300-12454) ---


@defquery(
    "f4_stats_aggs",
    """
    SELECT l_returnflag,
           round(stddev_pop(l_quantity), 4)  AS std_qty,
           round(var_samp(l_extendedprice), 2) AS var_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_pop(l_quantity, l_discount), 6) AS covar_qty_disc,
           -- Spark's skewness/kurtosis are POPULATION moments (m3/m2^1.5,
           -- m4/m2^2 - 3); DuckDB's are sample-corrected → spell out moments
           round((avg(l_quantity*l_quantity*l_quantity)
                  - 3*avg(l_quantity)*avg(l_quantity*l_quantity)
                  + 2*avg(l_quantity)^3)
                 / (avg(l_quantity*l_quantity) - avg(l_quantity)^2)^1.5, 4) AS skew_qty,
           round((avg(l_quantity*l_quantity*l_quantity*l_quantity)
                  - 4*avg(l_quantity)*avg(l_quantity*l_quantity*l_quantity)
                  + 6*avg(l_quantity)^2*avg(l_quantity*l_quantity)
                  - 3*avg(l_quantity)^4)
                 / (avg(l_quantity*l_quantity) - avg(l_quantity)^2)^2 - 3, 4) AS kurt_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="stddevPop/varSamp/corr/covarPop/skewPop/kurtPop in one grouped pass "
    "(population-moment semantics, documented divergence from sample-corrected variants).",
)
def f4(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_pop("l_quantity"), 4).alias("std_qty"),
            F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
            F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
        )
        .orderBy("l_returnflag")
    )


# --- quantiles (reference :4994-5008,7226-7282) ---


@defquery(
    "f5_quantiles_exact",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="exact continuous percentiles (quantileExact family → percentile).",
)
def f5(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # ONE percentile buffer for all three points (array form), not three:
    # each scalar F.percentile is its own ObjectHashAggregate buffer over
    # every value — 1.24 s -> 0.80 s median at sf0.1; exact same
    # sorted-buffer math, so values are bit-identical to the scalar form.
    qs = F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.element_at(qs, 1), 2).alias("p50"),
            F.round(F.element_at(qs, 2), 2).alias("p90"),
            F.round(F.element_at(qs, 3), 2).alias("p99"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("o_orderpriority")
    )


# --- argMin/argMax (reference :2890-2905) ---


@defquery(
    "f6_argminmax",
    """
    SELECT n_name,
           arg_max(c_name, c_acctbal) AS richest_customer,
           round(max(c_acctbal), 2) AS top_balance,
           arg_min(c_name, c_acctbal) AS poorest_customer
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    doc="argMax/argMin → max_by/min_by with broadcast dim join.",
)
def f6(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", "c_acctbal").alias("richest_customer"),
            F.round(F.max("c_acctbal"), 2).alias("top_balance"),
            F.min_by("c_name", "c_acctbal").alias("poorest_customer"),
        )
        .orderBy("n_name")
    )


# --- pivot (reference pandas_api.py:1958 pivot_table) ---


@defquery(
    "f7_pivot",
    """
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS F,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="pivot_table → groupBy().pivot().agg() (values pinned for plan stability).",
)
def f7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .orderBy("l_returnflag")
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("O"),
    )


# --- set ops (SURVEY §2.7: intersect/except Spark-native) ---


@defquery(
    "f8_setops",
    """
    SELECT 'both' AS bucket, count(*) AS n FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'f_only' AS bucket, count(*) AS n FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    ORDER BY bucket
    """,
    doc="INTERSECT / EXCEPT exposed natively (reference reaches them only via raw SQL).",
)
def f8(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f_cust.intersect(o_cust).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    f_only = f_cust.exceptAll(o_cust).agg(F.count("*").alias("n")).select(
        F.lit("f_only").alias("bucket"), "n"
    )
    return both.unionByName(f_only).orderBy("bucket")


# --- explode / arrays (reference arrayJoin :3136) ---


@defquery(
    "f9_explode_tokens",
    """
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents)
    WHERE length(tok) > 4
    GROUP BY tok ORDER BY n DESC, tok LIMIT 15
    """,
    doc="arrayJoin/explode → token frequency top-15 (explode + groupBy + TakeOrdered).",
)
def f9(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 4)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(15)
    )


# --- CASE WHEN / multiIf (reference case_when.py:41) ---


@defquery(
    "f10_case_when",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           o_orderstatus,
           count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY bucket, o_orderstatus
    ORDER BY bucket, o_orderstatus
    """,
    doc="multiIf/CaseWhen → chained F.when, grouped.",
)
def f10(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("bucket", "o_orderstatus")
    )


# --- hash functions (reference :3059-3101) ---


@defquery(
    "f11_hash_bucketing",
    """
    SELECT ('0x' || substr(md5(c_name), 1, 12))::BIGINT % 8 AS bucket,
           count(*) AS n
    FROM customer GROUP BY bucket ORDER BY bucket
    """,
    doc="md5-prefix48 bucketing — the engine-portable hash primitive, used for salting/sharding.",
)
def f11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators.text import md5_prefix48

    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy((md5_prefix48(F.col("c_name")) % 8).alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# --- cumulative / frame windows over events value stream ---


@defquery(
    "f12_moving_avg",
    """
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ma4
    FROM events WHERE user_id <= 10
    ORDER BY user_id, event_id
    """,
    doc="rolling(4).mean() → rowsBetween(-3, 0) frame window (SURVEY §2.6 rolling).",
)
def f12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return ev.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 4).alias("ma4")
    ).orderBy("user_id", "event_id")
