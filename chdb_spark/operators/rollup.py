"""Mergeable partial-aggregate states — the AggregatingMergeTree /
materialized-view rollup algebra as DataFrame operators.

The reference's incremental-aggregation story is ClickHouse's ``-State`` /
``-Merge`` combinator pair: a materialized view stores *partial aggregate
states* at a fine grain (reference datastore/core.py:6004 — target engine
``"AggregatingMergeTree()" together with -State aggregate functions in the
SELECT``), and queries re-aggregate those states to any coarser grain with
``<f>Merge`` — never re-scanning the raw table. That is exactly the
two-level aggregation a 100 TB event log needs: the raw log is scanned
ONCE into hourly states (tiny — |keys| x hours rows), and every
daily/weekly/monthly query is an aggregation over states, not data.

Spark-first representation — states are plain columns, not opaque blobs:

========== ============================== ======================= =========
kind       partial state                  merge                   finalize
========== ============================== ======================= =========
count      ``count(x)`` (bigint)          ``sum``                 identity
sum        ``sum(x)`` (input sum type)    ``sum``                 identity
min / max  ``min(x)`` / ``max(x)``        ``min`` / ``max``       identity
avg        ``struct(s=sum(x), c=count)``  field-wise ``sum``      ``s / c``
uniq_exact ``collect_set(x)``             distinct set union      ``size``
uniq       ``hll_sketch_agg(x)`` (binary) ``hll_union_agg``       estimate
var        exact moments                  field-wise ``sum``      var_samp
           ``struct(n, Σx, Σx²)``
hist       exact bucket-count array over  elementwise ``sum``     identity
           a fixed (lo, hi, buckets) grid
========== ============================== ======================= =========

Every kind is *algebraic*: ``merge(partials)`` is exactly equal to the
direct aggregate for count/sum/min/max/avg/uniq_exact, and
estimate-identical for the HLL ``uniq`` (union of sketches is the sketch
of the union). merge is associative, so states roll up hour → day → month
without touching raw data. The SQL-dialect counterpart (``sumState`` /
``sumMerge`` … in CH query text) lives in dialect.py — same algebra, same
plain-value state representation; byte-compat with a ClickHouse *server's*
serialized states is explicitly out of scope.

Scale contracts (100 TB):
- partial_states is one shuffle on the fine-grain keys with map-side
  combine; the state table is |fine keys| rows — metadata-sized next to
  the raw log.
- merge_states shuffles only state rows. ``uniq_exact`` states grow with
  per-group cardinality (a set per group) — its contract is
  bounded-cardinality groups (users per type-day, not global uniques);
  for unbounded cardinality use ``uniq`` (fixed ~1.5 KB HLL sketch per
  group, any cardinality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table

#: kind → (partial builder, merge builder, finalize builder)
_KINDS: dict = {
    "count": (
        lambda c: F.count(c if c is not None else F.lit(1)),
        F.sum,
        lambda s: s,
    ),
    "sum": (F.sum, F.sum, lambda s: s),
    "min": (F.min, F.min, lambda s: s),
    "max": (F.max, F.max, lambda s: s),
    "avg": (
        lambda c: F.struct(F.sum(c).alias("s"), F.count(c).alias("c")),
        lambda s: F.struct(
            F.sum(s.getField("s")).alias("s"), F.sum(s.getField("c")).alias("c")
        ),
        lambda s: s.getField("s").cast("double") / s.getField("c"),
    ),
    "uniq_exact": (
        F.collect_set,
        lambda s: F.array_distinct(F.flatten(F.collect_list(s))),
        lambda s: F.size(s).cast("long"),
    ),
    "uniq": (
        F.hll_sketch_agg,
        F.hll_union_agg,
        F.hll_sketch_estimate,
    ),
    # sample variance from exact moments (n, Σx, Σx²) — feed a DECIMAL
    # column and the moments are exact, so the double-precision finalize
    # is identical no matter how the partials were merged (the float-
    # cancellation caveat of the textbook formula disappears when the
    # sums themselves carry no rounding).
    "var": (
        lambda c: F.struct(
            F.count(c).alias("n"),
            F.sum(c).alias("s"),
            F.sum(c * c).alias("q"),
        ),
        lambda s: F.struct(
            F.sum(s.getField("n")).alias("n"),
            F.sum(s.getField("s")).alias("s"),
            F.sum(s.getField("q")).alias("q"),
        ),
        lambda s: (
            (
                s.getField("q").cast("double")
                - s.getField("s").cast("double")
                * s.getField("s").cast("double")
                / s.getField("n")
            )
            / (s.getField("n") - 1)
        ),
    ),
}

#: out column → (kind, input column or Column; None only for count) with an
#: optional third params dict (only ``hist`` takes one)
AggSpec = dict[str, tuple]


def _input(col):
    if col is None:
        return F.lit(1)
    return F.col(col) if isinstance(col, str) else col


def _hist_kind(params: dict):
    """Fixed equi-width histogram — the mergeable quantile-family state
    (CH quantileState's role): the partial is an exact bucket-count array,
    merge is elementwise sum (associative), and any quantile estimate
    interpolates the merged counts. Unlike a sketch, the counts themselves
    are EXACT for the declared (lo, hi, buckets) grid — so the state is
    oracle-checkable, and the only approximation lives in the final
    interpolation step the caller chooses to apply."""
    lo, hi, n = float(params["lo"]), float(params["hi"]), int(params["buckets"])
    if not (hi > lo and n > 0):
        raise ValueError(f"hist: need hi > lo and buckets > 0, got {params}")
    width = (hi - lo) / n

    def partial(c):
        idx = F.least(
            F.lit(n - 1), F.greatest(F.lit(0), F.floor((c - lo) / width))
        )
        return F.array(
            *[
                F.sum(
                    F.when(c.isNotNull() & (idx == i), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ).cast("long")
                for i in range(n)
            ]
        )

    def merge(s):
        return F.array(
            *[F.sum(F.element_at(s, i + 1)).cast("long") for i in range(n)]
        )

    return partial, merge, lambda s: s


def _resolve(spec: tuple):
    """(kind, col[, params]) → (partial, merge, finalize, input column)."""
    kind, col = spec[0], spec[1]
    params = spec[2] if len(spec) > 2 else None
    if kind == "hist":
        return (*_hist_kind(params or {}), col)
    if kind not in _KINDS:
        raise ValueError(
            f"unknown kind {kind!r} (have {sorted(_KINDS) + ['hist']})"
        )
    return (*_KINDS[kind], col)


def partial_states(df: DataFrame, group_cols: list, aggs: AggSpec) -> DataFrame:
    """ONE scan of ``df`` → one mergeable state row per fine-grain group.

    ``group_cols`` entries may be names or aliased Column expressions
    (e.g. ``date_trunc('hour', ts).alias('hour')``). This is the
    materialized-view build: persist the result and answer every coarser
    aggregation from it via :func:`merge_states`.
    """
    exprs = []
    for out, spec in aggs.items():
        partial, _, _, col = _resolve(spec)
        exprs.append(partial(_input(col)).alias(out))
    return df.groupBy(*group_cols).agg(*exprs)


def merge_states(states: DataFrame, group_cols: list, aggs: AggSpec) -> DataFrame:
    """Re-aggregate a state table to a coarser grain — state rows in,
    state rows out (associative: chain hour → day → month freely).

    ``group_cols`` may be expressions over the fine-grain keys (e.g.
    ``to_date(hour).alias('day')``). Only state columns named in ``aggs``
    are carried."""
    exprs = []
    for out, spec in aggs.items():
        _, merge, _, _ = _resolve(spec)
        exprs.append(merge(F.col(out)).alias(out))
    return states.groupBy(*group_cols).agg(*exprs)


def finalize_states(states: DataFrame, aggs: AggSpec) -> DataFrame:
    """States → final values (avg's division, set size, HLL estimate);
    non-state columns pass through unchanged."""
    state_cols = set(aggs)
    out = []
    for name in states.columns:
        if name in state_cols:
            _, _, finalize, _ = _resolve(aggs[name])
            out.append(finalize(F.col(name)).alias(name))
        else:
            out.append(F.col(name))
    return states.select(*out)


@defquery(
    "ru1_rollup_merge",
    """
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum,
           min(value) AS val_min,
           max(value) AS val_max,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
               AS val_avg,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ORDER BY event_type, day
    """,
    doc="AggregatingMergeTree rollup algebra (reference datastore/"
        "core.py:6004 -State MV pattern): the event log is scanned ONCE "
        "into hourly partial states (count/sum/min/max/avg-struct/"
        "distinct-set), then the daily answer is computed ONLY from "
        "states — merge is algebraic and associative, so the oracle "
        "(direct daily aggregation over raw rows) must match EXACTLY. "
        "Sums ride DECIMAL(18,2) so partial-merge order cannot perturb "
        "bits (the g2 lesson). At 100 TB the state table is |type x hour| "
        "rows — every daily/weekly query aggregates metadata, not data.",
)
def ru1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    aggs: AggSpec = {
        "cnt": ("count", None),
        "val_sum": ("sum", F.col("value").cast("decimal(18,2)")),
        "val_min": ("min", "value"),
        "val_max": ("max", "value"),
        "val_avg": ("avg", F.col("value").cast("decimal(18,2)")),
        "n_users": ("uniq_exact", "user_id"),
    }
    hourly = partial_states(
        ev, ["event_type", F.date_trunc("hour", "ts").alias("hour")], aggs
    )
    daily = merge_states(
        hourly, ["event_type", F.to_date("hour").alias("day")], aggs
    )
    return (
        finalize_states(daily, aggs)
        .withColumn("val_sum", F.col("val_sum").cast("double"))
        .select(
            "event_type", "day", "cnt", "val_sum", "val_min", "val_max",
            "val_avg", "n_users",
        )
        .orderBy("event_type", "day")
    )


@defquery(
    "ru2_hist_rollup",
    """
    WITH b AS (
      SELECT event_type,
             CAST(least(19, greatest(0, CAST(floor(value / 2.5) AS BIGINT)))
                  AS INT) AS bucket
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, bucket, count(*) AS cnt
    FROM b GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    doc="mergeable histogram state (the quantileState analogue): hourly "
        "partial bucket-count arrays over a fixed [0,50)x20 grid merge "
        "elementwise to per-type totals; the counts are EXACT for the "
        "declared grid, so the oracle is a plain bucketed GROUP BY — no "
        "sketch tolerance needed. Clamp (least/greatest) is identical "
        "IEEE math on both sides. At 100 TB the state is 20 int64s per "
        "(type, hour); any quantile estimate interpolates merged counts "
        "without re-touching raw rows.",
)
def ru2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    aggs: AggSpec = {
        "h": ("hist", "value", {"lo": 0.0, "hi": 50.0, "buckets": 20}),
    }
    hourly = partial_states(
        ev, ["event_type", F.date_trunc("hour", "ts").alias("hour")], aggs
    )
    per_type = merge_states(hourly, ["event_type"], aggs)
    return (
        finalize_states(per_type, aggs)
        .select(
            "event_type",
            F.posexplode("h").alias("bucket", "cnt"),
        )
        .filter(F.col("cnt") > 0)
        .orderBy("event_type", "bucket")
    )


def hist_quantile(state, q: float, lo: float, hi: float, buckets: int):
    """Quantile estimate from a merged ``hist`` state — pure Column
    expression (one ``aggregate`` fold over the bucket array, no data
    access): finds the bucket where the cumulative count crosses
    ``q * total`` and interpolates linearly inside it. Error is bounded by
    one bucket width — the caller chose that resolution when declaring the
    grid, and merging states never widens it. This is the read side of the
    quantile-over-states story: at 100 TB the estimate costs a fold over
    ``buckets`` int64s per group."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"hist_quantile: q must be in [0,1], got {q}")
    s = F.col(state) if isinstance(state, str) else state
    width = (hi - lo) / buckets
    total = F.aggregate(s, F.lit(0).cast("long"), lambda a, e: a + e)
    target = F.lit(q) * total
    pairs = F.arrays_zip(
        s.alias("c"), F.sequence(F.lit(0), F.lit(buckets - 1)).alias("i")
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("double").alias("ans"),
    )

    def step(acc, p):
        c = p.getField("c")
        i = p.getField("i")
        crossing = acc.getField("ans").isNull() & (acc.getField("cum") + c >= target)
        frac = (target - acc.getField("cum")) / c
        est = F.lit(lo) + F.lit(width) * (i.cast("double") + frac)
        return F.struct(
            (acc.getField("cum") + c).alias("cum"),
            F.when(crossing & (c > 0), est)
            .otherwise(acc.getField("ans"))
            .alias("ans"),
        )

    return F.aggregate(pairs, zero, step, lambda acc: acc.getField("ans"))
