"""Range (point-in-interval) joins without the nested-loop trap.

A non-equi join like ``p.ts BETWEEN i.lo AND i.hi`` has no equi key, so
open-source Spark plans BroadcastNestedLoopJoin — O(|points| x
|intervals|) comparisons — and the suite-wide plan pin forbids exactly
that shape. :func:`range_join` restores an equi key by bucketizing the
range dimension:

* each point lands in exactly ONE bucket (``floor(p / width)``);
* each interval explodes to every bucket it overlaps
  (``ceil(len / width) + 1`` rows — pick ``width`` near the typical
  interval length and that is ~2);
* an equi-join on the bucket key + the residual ``lo <= p <= hi``
  filter gives exact semantics, and because the point's bucket is
  unique no (point, interval) pair can match twice — no post-join
  dedup needed.

Shuffle volume: |points| + ~2|intervals| rows on an integer key, AQE
skew-splittable. The same trick Databricks' range-join hint applies,
expressed with public explode + equi-join primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table


def _ordinal(df: DataFrame, name: str) -> Column:
    """Range-dimension ordinal of ``df[name]``: date→epoch days,
    timestamp→epoch seconds, numerics cast to long. Used for the bucket id
    only — the residual predicate compares the original values."""
    dt = dict(df.dtypes)[name]
    c = F.col(name)
    if dt == "date":
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("long")
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_timestamp(c)
    return c.cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int | None = None,
    how: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join ``points`` to ``intervals`` on ``lo <= point <= hi`` (closed).

    ``bucket_width`` is in the range dimension's ordinal units (days for
    dates, seconds for timestamps, the value itself for numerics). When
    omitted it is derived from the intervals' median length — one tiny
    aggregate over the (usually dimension-sized) intervals side.

    ``how`` supports ``inner`` and ``left`` (points matching no interval
    survive with NULL interval columns; the unmatched set is recovered
    with a bucketed left_anti against the matched keys, so every join in
    the plan stays equi-keyed).

    ``broadcast_intervals`` (default True) pins the exploded interval
    side as the hash-join BUILD side. Without the pin, Catalyst sizes
    the narrow point projection under the broadcast threshold and
    builds the POINTS side — broadcasting the fact table, which
    collects it to the driver locally and is exactly the wrong side at
    scale (the interval side is dimension-sized by this operator's
    contract; a genuinely large interval table can opt out).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner|left, got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"range_join: overlapping column names {sorted(overlap)}")

    if bucket_width is None:
        lengths = intervals.select(
            (_ordinal(intervals, hi_col) - _ordinal(intervals, lo_col)).alias("_len")
        )
        med = lengths.agg(F.percentile_approx("_len", F.lit(0.5)).alias("m")).first()["m"]
        bucket_width = max(int(med or 1), 1)

    pts = points.withColumn(
        "_bucket", F.floor(_ordinal(points, point_col) / bucket_width)
    )
    ivs = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_ordinal(intervals, lo_col) / bucket_width),
                F.floor(_ordinal(intervals, hi_col) / bucket_width),
            )
        ),
    )
    residual = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    if broadcast_intervals:
        ivs = F.broadcast(ivs)
    matched = pts.join(ivs, on=["_bucket"], how="inner").where(residual).drop("_bucket")
    if how == "inner":
        return matched
    # left: points minus the matched point rows (anti-join on the full
    # point row, so duplicates in `points` keep their multiplicity iff
    # the duplicate rows are identical — documented closed-world caveat)
    matched_pts = matched.select(*points.columns).distinct()
    missing = points.join(matched_pts, on=list(points.columns), how="left_anti")
    for c in intervals.columns:
        missing = missing.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(missing)


_PROMOS_SQL = """
    SELECT * FROM (VALUES
      ('launch',   DATE '1995-03-01', DATE '1995-09-30'),
      ('holiday1', DATE '1995-11-15', DATE '1996-01-15'),
      ('summer96', DATE '1996-06-01', DATE '1996-08-31'),
      ('overlap',  DATE '1996-07-15', DATE '1997-02-28'),
      ('century',  DATE '1999-10-01', DATE '2000-03-31')
    ) AS promos(promo, start_d, end_d)
"""


def _promos(spark: SparkSession) -> DataFrame:
    import datetime as dt

    rows = [
        ("launch", dt.date(1995, 3, 1), dt.date(1995, 9, 30)),
        ("holiday1", dt.date(1995, 11, 15), dt.date(1996, 1, 15)),
        ("summer96", dt.date(1996, 6, 1), dt.date(1996, 8, 31)),
        ("overlap", dt.date(1996, 7, 15), dt.date(1997, 2, 28)),
        ("century", dt.date(1999, 10, 1), dt.date(2000, 3, 31)),
    ]
    return spark.createDataFrame(rows, "promo string, start_d date, end_d date")


@defquery(
    "rj1_range_join_promos",
    f"""
    WITH promos AS ({_PROMOS_SQL})
    SELECT promo, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN promos
      ON CAST(o_orderdate AS DATE) BETWEEN start_d AND end_d
    GROUP BY promo ORDER BY promo
    """,
    doc="point-in-interval join of orders onto overlapping promo windows "
        "via bucketized equi-join (explode intervals to day-buckets, "
        "equi-join on bucket + residual BETWEEN) — the plan the suite-wide "
        "CartesianProduct/BNLJ pin requires; revenue summed as exact "
        "DECIMAL then cast once, order-independent on both sides.",
)
def rj1(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").withColumn(
        "o_orderdate_d", F.col("o_orderdate").cast("date")
    )
    out = range_join(
        orders, _promos(spark), "o_orderdate_d", "start_d", "end_d", bucket_width=120
    )
    return (
        out.groupBy("promo")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("promo")
    )
