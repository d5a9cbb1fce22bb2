"""As-of join — merge_asof(backward) semantics without a range-join blowup.

Reference: pandas_api.py:1176-1242 — ``merge_asof`` (backward/forward/
nearest, tolerance, by-groups), executed there by materializing into pandas.
Here it is distributed: the classic union+window trick (SURVEY.md §2.4):

  1. UNION the right side (tagged 0) and left side (tagged 1) into one
     stream keyed by the `by` columns.
  2. One window per key ordered by (ts, side): ``last(right_value,
     ignorenulls=True)`` over rows-unbounded-preceding carries the most
     recent right-side row forward onto each left row.
  3. Filter back to left rows.

Cost: ONE shuffle on the by-key (vs a range join's quadratic per-key pair
expansion). At 100 TB this is the difference between a sort within each
user partition and an O(n·m) explosion.

Equal timestamps count as "prior" (side 0 sorts before side 1) — matching
pandas merge_asof's default ``allow_exact_matches=True`` and DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chdb_spark.queries import defquery, table


def merge_asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_values: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    right.on <= left.on within the same `by` group (and within `tolerance`
    if given, e.g. '1 hour')."""
    lcols = [c for c in left.columns]
    l = left.select(*lcols, F.lit(1).alias("_side"))
    r = right.select(
        *by,
        F.col(on),
        *[F.col(c).alias(f"_r_{c}") for c in right_values],
        F.lit(0).alias("_side"),
    )
    for c in lcols:
        if c not in by and c != on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_values:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[c for c in l.columns if not c.startswith("_r_") and c != "_side"],
        F.col("_side"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_values],
        F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias("_asof_ts"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        within = F.col("_asof_ts").isNotNull() & (F.col(on) <= F.col("_asof_ts") + tol)
        for c in right_values:
            out = out.withColumn(f"asof_{c}", F.when(within, F.col(f"asof_{c}")))
    return out.withColumnRenamed("_asof_ts", "asof_ts")


@defquery(
    "a1_asof_purchase_view",
    """
    WITH v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
         p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           round(p.value, 2) AS purchase_value,
           round(v.value, 2) AS last_view_value,
           date_diff('second', v.ts, p.ts)::BIGINT AS gap_s
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
    doc="merge_asof(backward, by=user): each purchase ← latest prior view (union+window, 1 shuffle).",
)
def a1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = merge_asof_backward(purchases, views, on="ts", by=["user_id"], right_values=["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("asof_value", 2).alias("last_view_value"),
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")).cast("long").alias("gap_s"),
    ).orderBy("event_id")
