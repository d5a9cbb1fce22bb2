"""chdb_spark.operators — composite operators beyond single expressions.

Everything here is a DataFrame→DataFrame transform built from built-in ops
(SURVEY.md §4.2: zero custom physical operators needed; composition first,
Pandas UDF only where semantics demand). Modules register their headline
queries into chdb_spark.queries via ``register_operator_queries()``.
"""

from __future__ import annotations

_REGISTERED = False


def _repartition_feature_pass(sel):
    """Round-robin a (id, payload) projection to full parallelism ahead of an
    Arrow map pass. Unconditional by design: checking the current partition
    count via ``df.rdd`` would force a driver-side plan→RDD conversion just
    to maybe skip one exchange. Opt out with
    ``spark.conf.set("spark.chdb.featurePass.repartition", "false")`` when
    the scan's file splits already provide >= core parallelism."""
    spark = sel.sparkSession
    if spark.conf.get("spark.chdb.featurePass.repartition", "true") == "false":
        return sel
    return sel.repartition(spark.sparkContext.defaultParallelism)


def register_operator_queries() -> None:
    """Idempotently import operator modules that carry @defquery entries."""
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    from chdb_spark.operators import dedup  # noqa: F401
    from chdb_spark.operators import similarity  # noqa: F401
    from chdb_spark.operators import text  # noqa: F401
    from chdb_spark.operators import events  # noqa: F401
    from chdb_spark.operators import asof  # noqa: F401
    from chdb_spark import queries_ext  # noqa: F401
    from chdb_spark import queries_tpch2  # noqa: F401
    from chdb_spark import queries_clickbench  # noqa: F401
    from chdb_spark import queries_aggs  # noqa: F401
    from chdb_spark import queries_reshape  # noqa: F401
    from chdb_spark import queries_stats  # noqa: F401
    from chdb_spark import queries_ts  # noqa: F401
    from chdb_spark import queries_funcs2  # noqa: F401
    from chdb_spark import queries_dialect  # noqa: F401
