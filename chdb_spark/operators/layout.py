"""Data-layout optimization — Z-order clustering for scan pruning.

At 100 TB the cheapest rows are the ones never read: parquet readers skip
whole row groups/files whose min/max column statistics exclude the
filter. That only works if the writer CLUSTERED the data so each file
covers a small region of the filter columns. Z-ordering (bit-interleaved
space-filling curve — the public technique behind Delta's OPTIMIZE
ZORDER BY and ClickHouse's mortonEncode ORDER BY) gives multi-column
locality: sort by the interleaved key and both columns' per-file ranges
shrink like 1/sqrt(n_files) instead of one column hogging the sort.

Everything is Column arithmetic (shiftleft/bitwise or) — codegen'd,
map-only except the one range shuffle any clustered write needs. This is
a beyond-reference pipeline operator (the reference, like chDB, inherits
ClickHouse's ORDER-BY-clustered MergeTree parts; this is the equivalent
lever for a parquet lake).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton (Z-curve) key over ``cols``: each column is min/max-scaled
    to ``bits`` bits, then bit-interleaved. ``bounds`` overrides the
    per-column (min, max) — pass precomputed bounds to keep the key a
    pure per-row expression; otherwise one tiny agg computes them.
    """
    if bounds is None:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
        ).first()
        bounds = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = bounds[c]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / span * top),
            ),
        ).cast("long")
        scaled.append(q)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(scaled):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return z


def zorder_write(
    df: DataFrame, cols: list[str], path: str,
    n_files: int = 16, bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``:
    range-partition by the interleaved key (one shuffle — the same
    shuffle ANY clustered write pays) and sort within partitions so
    row-group min/max stats are tight. Readers filtering on any prefix
    of ``cols`` then skip most files/row groups via plain predicate
    pushdown — no index structure to maintain."""
    z = zorder_key(df, cols, bits=bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


from pyspark.sql import SparkSession  # noqa: E402

from chdb_spark.queries import defquery, table  # noqa: E402


@defquery(
    "zo1_zorder_rectangle",
    """
    SELECT count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_custkey BETWEEN 1000 AND 2000
      AND o_totalprice BETWEEN 50000 AND 150000
    """,
    doc="Z-order clustered write + rectangle scan: orders re-written "
        "parquet clustered on the Morton key of (o_custkey, o_totalprice), "
        "then a 2-D range filter aggregates over the clustered copy. "
        "Results are layout-invariant (the oracle reads the original "
        "table); the POINT of the layout — most files skipped via "
        "min/max stats — is pinned by "
        "tests/test_operators.py::test_zorder_tightens_file_stats.",
)
def zo1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.operators.layout import zorder_write

    o = table(spark, sf_dir, "orders")
    out_dir = scratch_dir("zo1", sf_dir)
    zorder_write(o, ["o_custkey", "o_totalprice"], out_dir, n_files=16)
    clustered = spark.read.parquet(out_dir)
    return clustered.where(
        (F.col("o_custkey").between(1000, 2000))
        & (F.col("o_totalprice").between(50000, 150000))
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


def sample_rows_spread(
    spark: SparkSession,
    path: str,
    k: int,
    seed: int = 42,
    margin: float = 4.0,
) -> DataFrame:
    """~``k`` rows SPREAD across a parquet lake without a full scan —
    the parquet-lake analogue of ClickHouse's MergeTree ``SAMPLE k``
    (which reads only a slice of the ``SAMPLE BY`` key space; reference
    SQL surface, COVERAGE divergence ledger: the TABLESAMPLE (k ROWS)
    mapping returns the FIRST k scan rows, biased to the first file).

    Mechanics: per-file row counts come from parquet FOOTERS (one
    driver-side metadata pass — the same O(files) walk any scan plans);
    a seeded shuffle picks just enough files to cover ``margin × k``
    rows, a Bernoulli sample thins them to ~margin-fold over-draw, and
    ``limit(k)`` trims exactly. At 100 TB the data read is
    ``O(k × avg_row_size × margin)`` — independent of table size —
    while first-k sampling concentrates on one file and a plain
    ``df.sample(k/N)`` scans EVERY file.

    Deterministic for a fixed (seed, file set). Returns ≤ k rows (ties
    of tiny inputs); raises if the lake holds no parquet files."""
    import glob as _glob
    import os
    import random

    import pyarrow.parquet as _pq

    if k <= 0:
        raise ValueError(f"sample_rows_spread: k must be positive, got {k}")
    files = sorted(
        _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ) or ([path] if os.path.isfile(path) else [])
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    counts = {fp: _pq.read_metadata(fp).num_rows for fp in files}
    total = sum(counts.values())
    rng = random.Random(seed)
    shuffled = list(files)
    rng.shuffle(shuffled)
    picked, covered = [], 0
    target = min(total, int(margin * k))
    for fp in shuffled:
        picked.append(fp)
        covered += counts[fp]
        if covered >= target:
            break
    df = spark.read.parquet(*sorted(picked))
    if covered > k:
        df = df.sample(fraction=min(1.0, margin * k / covered), seed=seed)
    # Spark's limit() consumes partitions INCREMENTALLY — a bare
    # limit(k) would take all k rows from the first file and undo the
    # spread. Ordering the ~margin×k over-draw by a content hash first
    # trims uniformly across files; the sort is k-bounded, never
    # table-sized.
    return df.orderBy(F.xxhash64(F.struct(*df.columns))).limit(k)


@defquery(
    "sp1_spread_sample",
    """
    SELECT CAST(200 AS BIGINT) AS n_rows, CAST(1 AS BIGINT) AS files_ge2
    """,
    doc="spread-k sampled read (MergeTree `SAMPLE k` analogue for "
        "parquet lakes — COVERAGE divergence ledger: TABLESAMPLE (k "
        "ROWS) is first-k-biased; this reads O(k) rows from seeded "
        "randomly-chosen FILES via footer row counts, table-size-"
        "independent). The fixture re-shards documents into 16 range "
        "files; the query asserts the contract the oracle constants "
        "pin: exactly k rows, drawn from ≥2 distinct files. "
        "Deterministic: fixed seed over a fixed file set.",
)
def sp1(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from chdb_spark.operators import scratch_complete, scratch_dir

    docs = table(spark, sf_dir, "documents")
    tmp = scratch_dir("spread16", sf_dir)
    if not scratch_complete(tmp):  # _SUCCESS-gated: partial writes rewrite
        docs.repartitionByRange(16, "doc_id").write.mode(
            "overwrite"
        ).parquet(tmp)
    sampled = sample_rows_spread(spark, tmp, k=200).select(
        "doc_id", F.col("_metadata.file_name").alias("_f")
    )
    return sampled.agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.countDistinct("_f") >= 2).cast("long").alias("files_ge2"),
    )
