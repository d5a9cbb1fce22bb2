"""Skew-handling operators — salted two-phase aggregation and bucketed
co-located joins.

At 100 TB the two classic shuffle killers are (a) aggregation onto a
handful of hot keys — every row for one key lands on ONE reducer no matter
how many executors exist — and (b) repeated fact-x-fact joins re-shuffling
the same tables every query. AQE solves join-side skew at runtime
(session.py DEFAULT_CONFS), but agg-side hot keys and cross-query shuffle
reuse need these two patterns:

* :func:`salted_aggregate` — phase 1 groups by (key, salt) so a hot key's
  rows spread over ``salt_buckets`` reducers; phase 2 merges the partials
  by key. Exact for every algebraic aggregate (sum/count/min/max — and avg
  via sum+count merge), which is why the API takes named algebraic specs
  instead of arbitrary expressions.
* :func:`write_bucketed` / co-located joins — Spark bucketing
  (``bucketBy(n, key).sortBy(key)`` + ``saveAsTable``): both sides of a
  key-equi-join pre-hashed into the same bucket layout join with ZERO
  exchange (plan-asserted in tests/test_plan_shapes.py) — the multi-query
  amortization story for a fact table that is joined on the same key all
  day.

The reference gets (a) for free inside one process (no distribution) and
has no analogue of (b); both are Spark-native answers to Spark-scale
problems, required by the 100 TB design point rather than the reference's
API surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table

#: algebraic agg name → (phase-1 partial, phase-2 merge) builders
_ALGEBRAIC = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salt on the grouping key.

    ``aggs`` maps output column → (fn, input_col) with fn in
    sum/count/min/max/avg. avg decomposes into (sum, count) partials and a
    final division — exact, not approximate.

    Phase 1 shuffles on (keys…, salt): a key holding 50% of a 100 TB table
    spreads over ``salt_buckets`` reducers instead of one. Phase 2 shuffles
    ≤ |distinct keys| x salt_buckets partial rows — metadata-sized. Total:
    same two-exchange count as a plain partial+final agg, but the heavy
    exchange is skew-free by construction.
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")
    phase1_cols = []
    phase2_cols = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            phase1_cols += [
                F.sum(col).alias(f"_s_{out}"),
                F.count(col).alias(f"_c_{out}"),
            ]
            phase2_cols.append(
                (F.sum(f"_s_{out}") / F.sum(f"_c_{out}")).alias(out)
            )
            continue
        if fn not in _ALGEBRAIC:
            raise ValueError(
                f"salted_aggregate: {fn!r} is not algebraic "
                f"(have {sorted(_ALGEBRAIC)} + avg); holistic aggregates "
                "(quantiles, distinct counts) need their dedicated operators"
            )
        partial, merge = _ALGEBRAIC[fn]
        phase1_cols.append(partial(col).alias(f"_p_{out}"))
        phase2_cols.append(merge(f"_p_{out}").alias(out))
    partials = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_cols)
    return partials.groupBy(*keys).agg(*phase2_cols)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table: joins and
    aggregations on ``bucket_cols`` against this table skip their exchange
    (and with ``sort_cols`` the sort) — pre-paying one shuffle at write
    time for every subsequent query. The 100 TB pattern for a fact table
    that is equi-joined on the same key by many queries."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(name)


@defquery(
    "sk1_salted_hot_key_agg",
    """
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 2) AS total,
           round(avg(value), 4) AS mean_v,
           round(max(value), 2) AS max_v
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="salted two-phase aggregation over a 5-hot-key stream (the agg-side "
        "skew pattern AQE does not cover): phase 1 shuffles on (key, salt) "
        "— skew-free by construction — phase 2 merges bounded partials. "
        "Exact algebraic merge, proven against the plain-GROUP BY oracle.",
)
def sk1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": ("count", "event_id"),
            "total": ("sum", "value"),
            "mean_v": ("avg", "value"),
            "max_v": ("max", "value"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round("total", 2).alias("total"),
        F.round("mean_v", 4).alias("mean_v"),
        F.round("max_v", 2).alias("max_v"),
    ).orderBy("event_type")
