"""Statistical-analytics query suite — the batch-3 aggregate surface under
the DuckDB correctness oracle.

Each query exercises one reference aggregate family end-to-end (hypothesis
tests, rank statistics, weighted quantiles, sequence/delta analytics,
association measures, fuzzy matching) with an exact ANSI-SQL oracle.
Reference anchors: datastore/function_definitions.py studentTTest :9862,
rankCorr :12300, quantileExactWeighted :12487, deltaSumTimestamp :9561,
sequenceMatch :9721, cramersV :9820, jaro/damerau string metrics.

Determinism rules (the driver hash-compares): doubles rounded identically on
both sides; anything order-ambiguous (ties in a cumulative) is expressed on
both sides over the same deterministic ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.functions import fn
from chdb_spark.queries import defquery, table

# ---------------------------------------------------------------------------
# st1 — Student t-test (closed-form agg, one pass; no sort, no Python)
# ---------------------------------------------------------------------------


@defquery(
    "st1_student_ttest",
    oracle="""
    WITH s AS (
      SELECT
        count(*) FILTER (t)      AS n1, avg(value) FILTER (t)      AS m1,
        var_samp(value) FILTER (t) AS v1,
        count(*) FILTER (NOT t)  AS n0, avg(value) FILTER (NOT t)  AS m0,
        var_samp(value) FILTER (NOT t) AS v0
      FROM (SELECT value, event_type IN ('click','purchase') AS t FROM events)
    )
    SELECT
      round((m1-m0)/sqrt(((n1-1)*v1+(n0-1)*v0)/(n1+n0-2)*(1.0/n1+1.0/n0)), 4) AS t_stat,
      CAST(n1+n0-2 AS BIGINT) AS dof
    FROM s
    """,
    doc="studentTTest as a pure aggregate expression (reference :9862): "
        "conditional moments only — partial+final hash agg, zero shuffles "
        "beyond the single agg exchange at any scale.",
)
def st1_student_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    is_t = F.col("event_type").isin("click", "purchase")
    out = ev.agg(fn("studentTTest")(F.col("value"), is_t).alias("s"))
    return out.select(
        F.round(F.col("s.t_statistic"), 4).alias("t_stat"),
        F.col("s.degrees_of_freedom").cast("long").alias("dof"),
    )


# ---------------------------------------------------------------------------
# st2 — Spearman rank correlation (distinct-value rank maps, no row sort)
# ---------------------------------------------------------------------------


@defquery(
    "st2_rank_corr",
    oracle="""
    WITH rx AS (
      SELECT l_quantity AS xv,
             sum(c) OVER (ORDER BY l_quantity ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS below
      FROM (SELECT l_quantity, count(*) AS c FROM lineitem GROUP BY 1)
    ), ry AS (
      SELECT l_extendedprice AS yv,
             sum(c) OVER (ORDER BY l_extendedprice ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS below
      FROM (SELECT l_extendedprice, count(*) AS c FROM lineitem GROUP BY 1)
    )
    SELECT round(corr(COALESCE(rx.below,0)+1, COALESCE(ry.below,0)+1), 4) AS rank_corr
    FROM lineitem
    JOIN rx ON lineitem.l_quantity = rx.xv
    JOIN ry ON lineitem.l_extendedprice = ry.yv
    """,
    doc="rankCorr (reference :12300). Scale path: ranks computed on the "
        "DISTINCT value tables (groupBy first), broadcast-joined back — the "
        "only global cumulative touches |distinct| rows, never |rows|.",
)
def st2_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table_rows_upper_bound

    li = table(spark, sf_dir, "lineitem")
    # parquet footer row count bounds both distinct-value sets — the rank
    # cumulatives skip their checkpoint + lane-pick count jobs
    out = fn("rankCorr")(
        li, "l_quantity", "l_extendedprice",
        input_rows=table_rows_upper_bound(sf_dir, "lineitem"),
    )
    return out.select(F.round("rank_corr", 4).alias("rank_corr"))


# ---------------------------------------------------------------------------
# st3 — Mann-Whitney U (mid-ranks from per-value counts)
# ---------------------------------------------------------------------------


@defquery(
    "st3_mann_whitney",
    oracle="""
    WITH counts AS (
      SELECT value, count(*) AS c, count(*) FILTER (event_type = 'click') AS c1
      FROM events GROUP BY value
    ), mid AS (
      SELECT c, c1,
             COALESCE(sum(c) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS r
      FROM counts
    ), a AS (
      SELECT sum(r * c1) AS r1, sum(c1) AS n1, sum(c - c1) AS n2 FROM mid
    )
    SELECT
      round(r1 - n1*(n1+1)/2.0, 2) AS u_stat,
      round((r1 - n1*(n1+1)/2.0 - n1*n2/2.0) / sqrt(n1*n2*(n1+n2+1)/12.0), 4) AS z_score
    FROM a
    """,
    doc="mannWhitneyUTest (reference :9862): mid-rank of a value derives "
        "from cumulative distinct-value counts — identical tie handling on "
        "both engines by construction.",
)
def st3_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table_rows_upper_bound

    ev = table(spark, sf_dir, "events")
    out = fn("mannWhitneyUTest")(
        ev.withColumn("is_click", F.col("event_type") == "click"), "value", "is_click",
        input_rows=table_rows_upper_bound(sf_dir, "events"),
    )
    return out.select(
        F.round("u_statistic", 2).alias("u_stat"),
        F.round("z_score", 4).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# st4 — Kolmogorov-Smirnov (ECDF sup at distinct values)
# ---------------------------------------------------------------------------


@defquery(
    "st4_ks_test",
    oracle="""
    WITH counts AS (
      SELECT value,
             count(*) FILTER (event_type = 'click')  AS c1,
             count(*) FILTER (event_type <> 'click') AS c2
      FROM events GROUP BY value
    ), cum AS (
      SELECT sum(c1) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a1,
             sum(c2) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a2
      FROM counts
    ), tot AS (
      SELECT count(*) FILTER (event_type = 'click') AS n1,
             count(*) FILTER (event_type <> 'click') AS n2
      FROM events
    )
    SELECT floor(max(abs(a1 * 1.0 / n1 - a2 * 1.0 / n2)) * 10000 + 0.5) / 10000
               AS d_stat
    FROM cum, tot
    """,
    doc="kolmogorovSmirnovTest (reference :9890): the ECDF sup is attained "
        "at a step, so evaluating at distinct values is exact — and keeps "
        "the global cumulative small.",
)
def st4_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table_rows_upper_bound

    ev = table(spark, sf_dir, "events")
    out = fn("kolmogorovSmirnovTest")(
        ev.withColumn("is_click", F.col("event_type") == "click"), "value", "is_click",
        input_rows=table_rows_upper_bound(sf_dir, "events"),
    )
    return out.select(
        (F.floor(F.col("d_statistic") * 10000 + 0.5) / 10000).alias("d_stat")
    )


# ---------------------------------------------------------------------------
# st5 — exact weighted median per group
# ---------------------------------------------------------------------------


@defquery(
    "st5_weighted_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_extendedprice AS v,
             sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_quantity
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag, round(min(v), 2) AS wmedian
    FROM c WHERE cw >= tw * 0.5
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="quantileExactWeighted (reference :12487): first value whose "
        "cumulative weight reaches half the group total; both sides walk "
        "the identical (value, weight) order. Crossing-bucket refinement "
        "(grouped_weighted_quantile): bucket weight totals collapse "
        "map-side, a bounded window finds each group's crossing bucket, "
        "and only ~1/n_buckets of the rows are walked exactly — no "
        "full-table running sum, no separate totals scan, no group ever "
        "on one reducer. The collect_list agg variant "
        "(fn('quantileExactWeighted'), kept for small groups) would "
        "buffer a whole group per row at scale.",
)
def st5_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.functions.aggregate_ext import grouped_weighted_quantile

    li = table(spark, sf_dir, "lineitem")
    # l_quantity is integer-valued, so bucket-offset sums are exact and
    # the oracle comparison is safe. 10% bounds sample: the input is a
    # RAW-table projection (caching it would pin a 100 TB scan), and
    # bounds only steer where the refinement looks, never the result.
    # No input_rows hint — the r11 footer-bound hint routed st5 through
    # the plain grouped-window lane (3 returnflag groups → 200k rows per
    # reducer, the single-reducer shape this operator exists to remove),
    # a measured loss in the settled r11 artifacts (1.24→1.78 s) and at
    # best a wash in this round's cold/warm ABAB; the refinement path is
    # also the only shape that scales, so it runs unconditionally here.
    med = grouped_weighted_quantile(
        li.select(
            "l_returnflag",
            F.col("l_extendedprice").alias("v"),
            "l_quantity",
        ),
        value_col="v",
        weight_col="l_quantity",
        group_cols=["l_returnflag"],
        q=0.5,
        extra_order=["l_quantity"],
        sketch_fraction=0.1,
        out_col="_wm",
    )
    return med.select(
        "l_returnflag", F.round(F.col("_wm"), 2).alias("wmedian")
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# st6 — deltaSumTimestamp over per-user event series
# ---------------------------------------------------------------------------


@defquery(
    "st6_delta_sum",
    oracle="""
    WITH d AS (
      SELECT user_id,
             value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, value) AS dv
      FROM events
    )
    SELECT round(sum(CASE WHEN dv > 0 THEN dv ELSE 0 END), 2) AS total_delta,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM d
    """,
    doc="deltaSumTimestamp (reference :9561): positive deltas of value in "
        "ts order per user; per-group state shuffles on user_id and stays "
        "distributed. Tie order pinned to (ts, value) on both sides.",
)
def st6_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        fn("deltaSumTimestamp")(F.col("value"), F.col("ts")).alias("d")
    )
    return per_user.agg(
        F.round(F.sum("d"), 2).alias("total_delta"),
        F.count("user_id").cast("long").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# st7 — Cramér's V between event type and day-of-week
# ---------------------------------------------------------------------------


@defquery(
    "st7_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT event_type AS a, CAST(dayofweek(ts) + 1 AS BIGINT) AS b, count(*) AS o
      FROM events GROUP BY 1, 2
    ), tot AS (SELECT sum(o) * 1.0 AS n FROM cells),
    rm AS (SELECT a, sum(o) * 1.0 AS ra FROM cells GROUP BY a),
    cm AS (SELECT b, sum(o) * 1.0 AS cb FROM cells GROUP BY b),
    chi AS (
      SELECT sum(pow(o - ra*cb/n, 2) / (ra*cb/n)) AS chi2,
             max(n) AS n,
             count(DISTINCT cells.a) AS ka, count(DISTINCT cells.b) AS kb
      FROM cells JOIN rm USING (a) JOIN cm USING (b) CROSS JOIN tot
    )
    SELECT round(sqrt(chi2 / (n * (least(ka, kb) - 1))), 4) AS cramers_v
    FROM chi
    """,
    doc="cramersV (reference :9820): one shuffle for the contingency cells, "
        "marginals broadcast back — cells ≪ rows at any scale.",
)
def st7_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("dow", F.dayofweek("ts"))
    out = fn("cramersV")(ev, "event_type", "dow")
    return out.select(F.round("cramers_v", 4).alias("cramers_v"))


# ---------------------------------------------------------------------------
# sq1 — two-step sequence match (view → later purchase) per user
# ---------------------------------------------------------------------------


@defquery(
    "sq1_view_then_purchase",
    oracle="""
    WITH u AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'view')     AS first_view,
             max(ts) FILTER (event_type = 'purchase') AS last_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) FILTER (first_view < last_purchase) AS BIGINT) AS converted,
           CAST(count(*) AS BIGINT) AS total_users
    FROM u
    """,
    doc="sequenceMatch('(?1)(?2)') (reference :9721): for a 2-step pattern "
        "the subsequence automaton is equivalent to first(view) < "
        "last(purchase) — the oracle states it that way; the Spark side "
        "runs the general automaton.",
)
def sq1_view_then_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        fn("sequenceMatch")(
            F.col("ts"), F.col("event_type") == "view", F.col("event_type") == "purchase"
        ).alias("m")
    )
    return per_user.agg(
        F.count(F.when(F.col("m"), 1)).cast("long").alias("converted"),
        F.count("*").cast("long").alias("total_users"),
    )


# ---------------------------------------------------------------------------
# sq2 — retention columns (view cohort; purchase / signup retained)
# ---------------------------------------------------------------------------


@defquery(
    "sq2_retention_cols",
    oracle="""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS r1,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r2,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r3
      FROM events GROUP BY user_id
    )
    SELECT CAST(sum(r1) AS BIGINT) AS cohort,
           CAST(sum(r2) AS BIGINT) AS did_purchase,
           CAST(sum(r3) AS BIGINT) AS did_signup
    FROM u
    """,
    doc="retention(c1..cN) (reference :9721): r[i] = max(c1 AND ci) per "
        "user — pure max aggregates, partial-aggregatable everywhere.",
)
def sq2_retention_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        fn("retention")(
            F.col("event_type") == "view",
            F.col("event_type") == "purchase",
            F.col("event_type") == "signup",
        ).alias("r")
    )
    return per_user.agg(
        F.sum(F.element_at("r", 1)).cast("long").alias("cohort"),
        F.sum(F.element_at("r", 2)).cast("long").alias("did_purchase"),
        F.sum(F.element_at("r", 3)).cast("long").alias("did_signup"),
    )


# ---------------------------------------------------------------------------
# fz1 — fuzzy name matching (jaro-winkler / damerau-levenshtein)
# ---------------------------------------------------------------------------


@defquery(
    "fz1_fuzzy_name_match",
    oracle="""
    SELECT
      CAST(count(*) FILTER (damerau_levenshtein(c_name, 'Customer#000000042') <= 2) AS BIGINT)
        AS near_names,
      round(avg(jaro_winkler_similarity(c_name, 'Customer#000000042')), 4) AS avg_jw
    FROM customer
    """,
    doc="jaroWinklerSimilarity / damerauLevenshteinDistance (reference "
        "string metrics): Arrow-batched pandas_udfs — the marked slow path; "
        "at scale, prefilter candidates by length/prefix blocking first.",
)
def fz1_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.functions.scalar_ext2 import allow_unblocked

    cust = table(spark, sf_dir, "customer")
    target = F.lit("Customer#000000042")
    # probe-vs-literal is the acknowledged O(n) shape — one map-side pass,
    # no pair join; the registry guard warns on unacknowledged uses
    with allow_unblocked():
        return cust.agg(
            F.count(
                F.when(fn("damerauLevenshteinDistance")(F.col("c_name"), target) <= 2, 1)
            ).cast("long").alias("near_names"),
            F.round(F.avg(fn("jaroWinklerSimilarity")(F.col("c_name"), target)), 4).alias("avg_jw"),
        )
