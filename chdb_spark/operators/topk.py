"""Top-K-by-frequency / heavy-hitter operators.

The reference exposes ``topK(N)(x)`` / ``topKWeighted`` as approximate
most-frequent-value aggregates (reference function_definitions.py:2666 —
a SpaceSaving sketch inside one process). On Spark the same question has
two scale regimes:

* :func:`top_k_by_frequency` — EXACT. ``groupBy(value).count`` benefits
  from map-side partial aggregation, so the shuffle carries one row per
  distinct value per map task, not one per input row; the final
  ``orderBy(count).limit(k)`` is a TakeOrdered (per-partition heap +
  driver merge of k rows), never a global sort. This is the right plan
  whenever |distinct values| is disk-sized — at 100 TB that covers
  event types, domains, languages, status codes, most real columns.
* :func:`approx_heavy_hitters` — BOUNDED-STATE. When the value column is
  near-unique (URLs, full texts) the exact path's shuffle is sized by the
  distinct count. Misra-Gries summaries of ``capacity`` entries per input
  partition (one Arrow pass, no shuffle) merge by value into ≤
  partitions x capacity rows — metadata-sized — and any value with true
  frequency > N/capacity is guaranteed to survive (standard MG merge
  bound: undercount ≤ N/capacity). Counts are lower bounds; the returned
  ``count_lb``/``err_ub`` bracket the true frequency.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chdb_spark.queries import defquery, table


def top_k_by_frequency(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    by: list[str] | None = None,
) -> DataFrame:
    """Exact top-``k`` most frequent values, overall or per ``by`` group.

    Ties break on the value itself (ascending) so results are
    deterministic. Global form: hash agg (map-side combined) + TakeOrdered
    — k rows to the driver. Grouped form: one shuffle on
    (by…, value) for the count, one on (by…) for the rank window; the
    window input is already collapsed to distinct values, not raw rows.
    """
    counts = df.groupBy(*(by or []), value_col).agg(F.count("*").alias("freq"))
    if not by:
        return counts.orderBy(F.desc("freq"), F.col(value_col).asc()).limit(k)
    w = Window.partitionBy(*by).orderBy(F.desc("freq"), F.col(value_col).asc())
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
        .orderBy(*by, F.desc("freq"), F.col(value_col).asc())
    )


def approx_heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    capacity: int = 1024,
) -> DataFrame:
    """Misra-Gries heavy hitters with per-task state ≤ ``capacity`` entries.

    Phase 1 (map-only, zero shuffle): each input partition folds its rows
    through a Misra-Gries summary — increment if tracked, insert if free
    slot, else decrement all (implemented as the standard offset trick) —
    and emits its ≤ capacity (value, count) survivors. Phase 2 merges the
    partials with a hash agg over ≤ n_partitions x capacity rows and takes
    the top k by merged lower-bound count. Every value with true frequency
    > N/capacity is present; ``err_ub`` = N/capacity bounds the undercount.
    """
    total = df.count()

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[value_col]:
                if v is None or (isinstance(v, float) and v != v):
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all: drop the min count from every counter
                    dec = min(counters.values())
                    counters = {x: c - dec for x, c in counters.items() if c > dec}
                    if len(counters) < capacity:
                        counters[v] = 1
        yield pd.DataFrame(
            {value_col: list(counters), "partial": list(counters.values())}
        )

    field = df.schema[value_col]
    partials = df.select(value_col).mapInPandas(
        mg, schema=f"`{value_col}` {field.dataType.simpleString()}, partial long"
    )
    return (
        partials.groupBy(value_col)
        .agg(F.sum("partial").alias("count_lb"))
        .orderBy(F.desc("count_lb"), F.col(value_col).asc())
        .limit(k)
        .withColumn("err_ub", F.lit(total // capacity).cast("long"))
    )


@defquery(
    "tk1_topk_frequency",
    """
    SELECT event_type, freq FROM (
      SELECT event_type, count(*) AS freq,
             row_number() OVER (ORDER BY count(*) DESC, event_type ASC) AS rk
      FROM events GROUP BY event_type
    ) WHERE rk <= 5 ORDER BY freq DESC, event_type ASC
    """,
    doc="exact top-5 most frequent event types: map-side-combined hash agg "
        "(shuffle carries distinct values, not rows) + TakeOrdered — the "
        "exact regime of the reference's topK() sketch aggregate; "
        "deterministic value-asc tiebreak on both sides.",
)
def tk1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_k_by_frequency(table(spark, sf_dir, "events"), "event_type", k=5)


@defquery(
    "tk2_grouped_topk",
    """
    SELECT l_returnflag, l_suppkey, freq FROM (
      SELECT l_returnflag, l_suppkey, count(*) AS freq,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY count(*) DESC, l_suppkey ASC) AS rk
      FROM lineitem GROUP BY l_returnflag, l_suppkey
    ) WHERE rk <= 3 ORDER BY l_returnflag, freq DESC, l_suppkey ASC
    """,
    doc="per-group top-3 suppliers by line frequency: count collapses to "
        "distinct (flag, suppkey) pairs before the rank window, so window "
        "partitions hold |suppliers| rows each regardless of table size.",
)
def tk2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_k_by_frequency(
        table(spark, sf_dir, "lineitem"), "l_suppkey", k=3, by=["l_returnflag"]
    )
