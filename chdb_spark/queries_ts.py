"""Time-series / ordered-op query suite — drives the DataStore surface
(rolling, expanding, ewm, resample, interpolate, duplicated, merge_ordered)
end-to-end under the DuckDB oracle, plus aggregate-family stragglers
(uniqUpTo, boundingRatio, groupConcat).

Reference anchors: rolling/expanding/ewm/resample pandas_compat.py:1782-1848,
interpolate pandas_compat.py:1239, duplicated pandas_compat.py:1182,
merge_ordered pandas_api.py:1245-1290, uniqUpTo function_definitions.py:7198,
boundingRatio :9561-9663 family, groupConcat :5108.

All of these are window/agg compositions — no Python in the row path, and
each one's shuffle story is stated in its docstring (the 100 TB posture:
windows partition by an entity key so state stays distributed; the only
global windows run at day-grain where cardinality is bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.datastore import DataStore
from chdb_spark.queries import defquery, table

# ---------------------------------------------------------------------------
# ts1 — rolling mean (trailing 7 rows per user)
# ---------------------------------------------------------------------------


@defquery(
    "ts1_rolling_avg",
    oracle="""
    SELECT user_id, event_id,
           round(CASE WHEN count(value) OVER w >= 7 THEN avg(value) OVER w END, 2)
             AS roll_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="DataStore.rolling(7).mean per user (reference pandas_compat.py:1813). "
        "One shuffle on user_id; window state is 7 rows per task regardless "
        "of total scale.",
)
def ts1_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = DataStore(table(spark, sf_dir, "events"))
    out = ds.rolling(7, "value", "mean", order_by="event_id", partition_by=["user_id"])
    return out.df.select(
        "user_id", "event_id", F.round("value_rolling_mean", 2).alias("roll_avg")
    )


# ---------------------------------------------------------------------------
# ts2 — expanding max per user
# ---------------------------------------------------------------------------


@defquery(
    "ts2_expanding_max",
    oracle="""
    SELECT user_id, event_id,
           max(value) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS exp_max
    FROM events
    """,
    doc="DataStore.expanding('max') (reference pandas_compat.py:1840). "
        "Running max is an O(1)-state frame — Spark evaluates it without "
        "buffering the partition.",
)
def ts2_expanding_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = DataStore(table(spark, sf_dir, "events"))
    out = ds.expanding("value", "max", order_by="event_id", partition_by=["user_id"])
    return out.df.select(
        "user_id", "event_id", F.col("value_expanding_max").alias("exp_max")
    )


# ---------------------------------------------------------------------------
# ts3 — resample to 15-minute buckets
# ---------------------------------------------------------------------------


@defquery(
    "ts3_resample_15min",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS ts,
           round(sum(value), 2) AS value_sum,
           count(event_id)      AS event_id_count
    FROM events GROUP BY 1
    """,
    doc="DataStore.resample('15 minutes') → groupBy(window(ts)) (reference "
        "pandas_compat.py:1782). Tumbling-window groupBy: partial aggregation "
        "map-side, one shuffle keyed by bucket — the same plan shape a "
        "streaming ingest would use.",
)
def ts3_resample_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = DataStore(table(spark, sf_dir, "events"))
    out = ds.resample("ts", "15 minutes", {"value": "sum", "event_id": "count"})
    return out.df.select(
        "ts",
        F.round("value_sum", 2).alias("value_sum"),
        F.col("event_id_count").cast("long").alias("event_id_count"),
    )


# ---------------------------------------------------------------------------
# ts4 — linear interpolation of masked values
# ---------------------------------------------------------------------------


@defquery(
    "ts4_interpolate_linear",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ), num AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM base
    ), m AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER wb AS pv,
        first_value(v IGNORE NULLS) OVER wf AS nv,
        last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS prn,
        first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wf AS nrn
      FROM num
      WINDOW wb AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id,
           floor((CASE WHEN v IS NOT NULL THEN v
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv) * ((rn - prn) / (nrn - prn))
                  END) * 100 + 0.5) / 100 AS v_interp
    FROM m
    """,
    doc="DataStore.interpolate(method='linear') (reference "
        "pandas_compat.py:1239): nulls land on the line between surrounding "
        "non-nulls. Two frames (backward + forward) over one user_id "
        "partitioning — a single shuffle, both windows share the sort.",
)
def ts4_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.when(F.col("event_type") != "error", F.col("value")).alias("value"),
    )
    out = DataStore(ev).interpolate("value", order_by="event_id", partition_by=["user_id"])
    # floor(x*100+.5)/100 instead of round(): both engines follow IEEE double
    # arithmetic exactly, while round(double, 2) disagrees between Spark
    # (Java BigDecimal HALF_UP on the shortest decimal repr) and DuckDB at
    # .xx5-boundary values like 28.794999999999998.
    return out.df.select(
        "user_id",
        "event_id",
        (F.floor(F.col("value") * 100 + 0.5) / 100).alias("v_interp"),
    )


# ---------------------------------------------------------------------------
# ts5 — exponentially weighted mean
# ---------------------------------------------------------------------------


@defquery(
    "ts5_ewm_mean",
    oracle="""
    WITH num AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    )
    SELECT user_id, event_id,
           round(sum(value * power(0.5, -rn)) OVER w
                 / sum(power(0.5, -rn)) OVER w, 2) AS ewm
    FROM num
    WINDOW w AS (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="DataStore.ewm(alpha=.5) — closed form over two cumulative sums of "
        "the scaled series (reference pandas_compat.py:1848 runs pandas; "
        "here it's pure window algebra, JVM-side). exponentialMovingAverage "
        "analogue (function_definitions.py:9960 family).",
)
def ts5_ewm_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = DataStore(table(spark, sf_dir, "events"))
    out = ds.ewm("value", alpha=0.5, order_by="event_id", partition_by=["user_id"])
    return out.df.select("user_id", "event_id", F.round("value_ewm", 2).alias("ewm"))


# ---------------------------------------------------------------------------
# ag1 — uniqUpTo + boundingRatio per event_type
# ---------------------------------------------------------------------------


@defquery(
    "ag1_uniq_upto_bounding",
    oracle="""
    SELECT event_type,
           least(count(DISTINCT user_id), 10) AS uniq_upto_10,
           round((arg_max(value, event_id) - arg_min(value, event_id))
                 / (max(event_id) - min(event_id)), 6) AS bounding_ratio
    FROM events GROUP BY event_type
    """,
    doc="uniqUpTo(10)(user_id) = least(countDistinct, 10) (reference "
        "function_definitions.py:7198) and boundingRatio — the slope "
        "between the first and last point of the series (reference :9663 "
        "family) via max_by/min_by over the unique event_id axis. Pure "
        "hash-agg: partial map-side, one exchange on event_type.",
)
def ag1_uniq_upto_bounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.least(F.count_distinct("user_id"), F.lit(10)).cast("long").alias("uniq_upto_10"),
        F.round(
            (F.max_by("value", "event_id") - F.min_by("value", "event_id"))
            / (F.max("event_id") - F.min("event_id")),
            6,
        ).alias("bounding_ratio"),
    )


# ---------------------------------------------------------------------------
# ag2 — groupConcat of each user's distinct event types
# ---------------------------------------------------------------------------


@defquery(
    "ag2_group_concat",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
    FROM events GROUP BY user_id
    """,
    doc="groupConcat / groupUniqArray-then-join (reference "
        "function_definitions.py:5108, :2534): collect_set → array_sort → "
        "concat_ws keeps the result deterministic under parallel "
        "aggregation order.",
)
def ag2_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types")
    )


# ---------------------------------------------------------------------------
# ag3 — duplicated-row flags
# ---------------------------------------------------------------------------


@defquery(
    "ag3_duplicated_flag",
    oracle="""
    SELECT event_id,
           (row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY event_id) > 1) AS duplicated
    FROM events
    """,
    doc="DataStore.duplicated(subset, keep='first') (reference "
        "pandas_compat.py:1182) — row_number over the subset key, "
        "deterministic via the explicit event_id order.",
)
def ag3_duplicated_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = DataStore(table(spark, sf_dir, "events"))
    out = ds.duplicated(subset=["user_id", "event_type"], keep="first", order_by="event_id")
    return out.df.select("event_id", "duplicated")


# ---------------------------------------------------------------------------
# mo1 — merge_ordered with forward-fill
# ---------------------------------------------------------------------------


@defquery(
    "mo1_merge_ordered",
    oracle="""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             round(sum(o_totalprice), 2) AS order_total
      FROM orders GROUP BY 1
    ), e AS (
      SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS event_value
      FROM events GROUP BY 1
    ), m AS (
      SELECT COALESCE(o.day, e.day) AS day, order_total, event_value
      FROM o FULL OUTER JOIN e ON o.day = e.day
    )
    SELECT day,
      last_value(order_total IGNORE NULLS) OVER w AS order_total,
      last_value(event_value IGNORE NULLS) OVER w AS event_value
    FROM m
    WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="DataStore.merge_ordered(fill_method='ffill') (reference "
        "pandas_api.py:1245-1290): outer join of two day-grain rollups, "
        "forward-filled in key order. The global ffill window is safe "
        "because day-grain cardinality is bounded (~10^4 rows at any data "
        "scale); the raw tables never pass through a single partition.",
)
def mo1_merge_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    events = table(spark, sf_dir, "events")
    o = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("order_total")
    )
    e = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("event_value")
    )
    return DataStore(o).merge_ordered(DataStore(e), on="day", fill_method="ffill").df


@defquery(
    "ts6_ohlc_resample",
    """
    SELECT user_id,
           time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
           round(arg_min(value, ts + to_microseconds(event_id)), 4)  AS open,
           round(max(value), 4)   AS high,
           round(min(value), 4)   AS low,
           round(arg_max(value, ts + to_microseconds(event_id)), 4)  AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE user_id < 5
    GROUP BY user_id, bucket
    ORDER BY user_id, bucket
    """,
    doc="OHLC/candlestick resample (pandas df.resample('1h').ohlc(), "
        "reference pandas_compat resample family): open/close via "
        "min_by/max_by over a composite (ts, event_id) tiebreak — one "
        "partial+final hash aggregate keyed by (user, bucket); no window, "
        "no sort of the raw stream.",
)
def ts6(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    # deterministic within-bucket order: (ts, event_id) composite
    tb = F.date_trunc("hour", F.col("ts")).alias("bucket")
    order = F.col("ts") + F.make_interval(secs=F.col("event_id") / 1_000_000)
    return (
        ev.groupBy("user_id", tb)
        .agg(
            F.round(F.min_by("value", order), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", order), 4).alias("close"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "bucket")
    )


@defquery(
    "ts7_range_interval_frame",
    """
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT)      AS n_prev_10min,
           round(sum(value) OVER w, 4)          AS sum_prev_10min
    FROM events
    WHERE user_id < 3
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
    """,
    doc="RANGE INTERVAL frame (time-based sliding window, SURVEY §2.6 "
        "frames): per-user 10-minute trailing count/sum — partitioned by "
        "user so no global sort; the frame is value-based (RangeFrame in "
        "the plan), not row-counted.",
)
def ts7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 3)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_prev_10min"),
        F.round(F.sum("value").over(w), 4).alias("sum_prev_10min"),
    ).orderBy("user_id", "ts", "event_id")
