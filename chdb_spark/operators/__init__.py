"""chdb_spark.operators — composite operators beyond single expressions.

Everything here is a DataFrame→DataFrame transform built from built-in ops
(SURVEY.md §4.2: zero custom physical operators needed; composition first,
Pandas UDF only where semantics demand). Modules register their headline
queries into chdb_spark.queries via ``register_operator_queries()``.
"""

from __future__ import annotations

_REGISTERED = False


def scratch_dir(prefix: str, key: str) -> str:
    """Session-stable scratch path under the system tempdir for operators
    that materialize an artifact (index, re-shard, clustered copy).

    Keyed by a hash of the FULL resolved ``key`` (not its basename) so two
    datasets that happen to share a directory name never collide."""
    import hashlib
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"chdb_spark_{prefix}_"
        + hashlib.sha1(os.path.abspath(key).encode()).hexdigest()[:12],
    )


def scratch_complete(path: str) -> bool:
    """True only when ``path`` holds a COMPLETE Spark write.

    ``os.path.isdir`` alone is the wrong reuse guard: a crashed or
    interrupted write leaves a partial parquet directory that would then
    be silently reused forever, feeding truncated input. Spark's file
    committer drops a ``_SUCCESS`` marker only after the job commits —
    gate reuse on it and rewrite otherwise."""
    import os

    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _repartition_feature_pass(sel):
    """Round-robin a (id, payload) projection to full parallelism ahead of an
    Arrow map pass — but only when the scan itself can't parallelize.

    Metadata-conditional: ``inputFiles()`` is a file-index lookup (no
    plan→RDD conversion, no job). When the source already has >= one file
    per core — the normal case for a real multi-file dataset; a 100 TB
    table is tens of thousands of splits — the exchange is pure overhead
    and is skipped. The single-file/small-test case (one split feeding 32
    cores) keeps the repartition so the Arrow pass uses every core. Opt
    out entirely with
    ``spark.conf.set("spark.chdb.featurePass.repartition", "false")``."""
    spark = sel.sparkSession
    if spark.conf.get("spark.chdb.featurePass.repartition", "true") == "false":
        return sel
    par = spark.sparkContext.defaultParallelism
    try:
        n_files = len(sel.inputFiles())
    except Exception:
        n_files = 0  # non-file-backed plan — no cheap metadata, repartition
    if n_files >= par:
        return sel
    return sel.repartition(par)


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
    from chdb_spark import queries_sources  # noqa: F401
    from chdb_spark.operators import skew  # noqa: F401
    from chdb_spark.operators import topk  # noqa: F401
    from chdb_spark.operators import rangejoin  # noqa: F401
    from chdb_spark.operators import linkage  # noqa: F401
    from chdb_spark.operators import profile  # noqa: F401
    from chdb_spark.operators import layout  # noqa: F401
    from chdb_spark.operators import pipeline  # noqa: F401
    from chdb_spark.operators import graph  # noqa: F401
    from chdb_spark.operators import rollup  # noqa: F401
    from chdb_spark.operators import cdc  # noqa: F401
    from chdb_spark.operators import evolve  # noqa: F401
    from chdb_spark.operators import drift  # noqa: F401
