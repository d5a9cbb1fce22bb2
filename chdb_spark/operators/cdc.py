"""Snapshot diff and version-collapse — the change-data-capture primitives
of an incremental ingestion pipeline.

A 100 TB corpus is not rebuilt nightly; it is *refreshed*: today's snapshot
of an upstream table arrives, and the pipeline needs exactly the rows that
changed — inserts re-enter dedup/quality scoring, deletes retire documents,
updates invalidate downstream artifacts. The reference reaches this shape
through its engine's table semantics (ReplacingMergeTree versions +
``FINAL``, reference datastore/core.py CREATE TABLE ENGINE surface;
dialect.py strips ``FINAL`` as a no-op because Spark tables have no
merge-pending duplicates — :func:`latest_by_version` is the executable
analogue when the duplicates are real). Both operators are Spark-first
compositions — one shuffle each, no UDFs:

* :func:`snapshot_diff` — FULL OUTER JOIN of old/new snapshots on the key,
  classify ``insert`` / ``delete`` / ``update`` (any non-key column
  IS DISTINCT FROM its counterpart), drop unchanged rows.
* :func:`latest_by_version` — collapse multi-version rows to the winner per
  key (max version; deterministic tie-break on the remaining columns) —
  ReplacingMergeTree(ver) ``FINAL`` semantics over an append-only log.

Scale contracts (100 TB):
- snapshot_diff is ONE shuffle join keyed by the primary key on each side.
  Both snapshots co-bucketed on the key (operators/skew.py write_bucketed)
  → zero-exchange diff, the nightly-refresh amortization. Unchanged rows
  (the overwhelming majority of a refresh) are dropped BEFORE any
  downstream work; with ``compare_cols`` the inequality check reads only
  the named columns, so Parquet column pruning keeps the scan narrow.
- latest_by_version is one window pass partitioned by key — per-task state
  is one key's versions; no global sort, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows that changed between two snapshots sharing a primary key.

    Returns one row per changed key with ``change_type`` in
    ``insert`` / ``delete`` / ``update``, the key columns, and for every
    compared column an ``old_<col>`` / ``new_<col>`` pair (NULL on the
    absent side of inserts/deletes). Unchanged keys are dropped.

    ``compare_cols`` defaults to every shared non-key column. Comparison is
    null-safe (``IS DISTINCT FROM``): NULL → value and value → NULL count
    as updates, NULL → NULL does not.
    """
    missing = [k for k in keys if k not in old.columns or k not in new.columns]
    if missing:
        raise ValueError(f"snapshot_diff: key columns missing: {missing}")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    if not compare_cols:
        raise ValueError("snapshot_diff: no columns to compare")

    # Side presence is a LITERAL marker column, not key nullness: inferring
    # presence from `keys[0] IS NOT NULL` misclassified NULL-key rows (an
    # old-only NULL-key row surfaced as 'insert'). Key matching is
    # null-SAFE (<=>): in a keyed snapshot NULL is a key value, so an
    # identical NULL-key row present in both snapshots pairs up and drops
    # as unchanged — diff(x, x) is empty for ANY x (property-pinned), and
    # apply_snapshot_diff's anti join uses the same <=> semantics. <=> is
    # still an equi-join key: this stays one hash-shuffle join.
    o = old.select(*keys, *compare_cols, F.lit(True).alias("_present")).alias("o")
    n = new.select(*keys, *compare_cols, F.lit(True).alias("_present")).alias("n")
    cond = None
    for k in keys:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    old_present = F.col("o._present").isNotNull()
    new_present = F.col("n._present").isNotNull()
    differs: Column = F.lit(False)
    for c in compare_cols:
        # IS DISTINCT FROM == NOT eqNullSafe
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    out_cols = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ]
    out_cols.append(change.alias("change_type"))
    for c in compare_cols:
        out_cols.append(F.col(f"o.{c}").alias(f"old_{c}"))
        out_cols.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return j.select(*out_cols).filter(F.col("change_type").isNotNull())


def apply_snapshot_diff(
    old: DataFrame, diff: DataFrame, keys: list[str]
) -> DataFrame:
    """Upsert a :func:`snapshot_diff` result onto the old snapshot — the
    MERGE INTO analogue without a lakehouse format: deletes and updates
    retire the old row (one LEFT ANTI join), inserts and updates add the
    new-side row (a union). ``apply_snapshot_diff(old, snapshot_diff(old,
    new, keys), keys)`` reconstructs ``new`` exactly (pinned by test).

    ``old`` must carry exactly the key + compared columns the diff was
    built from (select them first otherwise). One shuffle (the anti join,
    keyed like the diff itself — co-bucketing applies identically)."""
    new_cols = [c[4:] for c in diff.columns if c.startswith("new_")]
    # The diff feeds BOTH branches below; without a plan boundary Catalyst
    # embeds its subtree (for a snapshot_diff input: the full-outer join)
    # twice and executes it twice. Project to the consumed columns (keys,
    # change_type, new_*) and lazily checkpoint — the diff is computed
    # once, and only changed rows (diff-sized, not snapshot-sized) land in
    # executor block storage.
    diff = diff.select(
        *keys, "change_type", *[f"new_{c}" for c in new_cols]
    ).localCheckpoint(eager=False)
    removals = diff.filter(
        F.col("change_type").isin("delete", "update")
    ).select(*keys)
    # eqNullSafe, not a plain key list: snapshot_diff emits NULL-key
    # delete/insert rows, and a null-unsafe anti join never retires the
    # old NULL-key row — breaking the round-trip invariant pinned below.
    # <=> is still an equi-join key, so this stays a hash join.
    o, r = old.alias("_cdc_o"), removals.alias("_cdc_r")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"_cdc_o.{k}").eqNullSafe(F.col(f"_cdc_r.{k}"))
    kept = o.join(r, cond, "left_anti").select(
        *[F.col(f"_cdc_o.{c}").alias(c) for c in old.columns]
    )
    additions = diff.filter(
        F.col("change_type").isin("insert", "update")
    ).select(*keys, *[F.col(f"new_{c}").alias(c) for c in new_cols])
    return kept.unionByName(additions)


def latest_by_version(
    df: DataFrame,
    keys: list[str],
    version_col: str,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Collapse an append-only multi-version log to the latest row per key
    — ReplacingMergeTree(ver) ``FINAL`` semantics, executable.

    The winner is the max ``version_col`` per key; exact duplicates of the
    max version tie-break deterministically on ``tie_break`` (default: all
    remaining columns, descending) so the result is stable across runs and
    partitionings — CH FINAL keeps an arbitrary max-version row, same
    ledgered determinism refinement as ANY JOIN."""
    from pyspark.sql.window import Window

    others = tie_break or [
        c for c in df.columns if c not in set(keys) and c != version_col
    ]
    order = [F.col(version_col).desc()] + [
        F.col(c).desc_nulls_last() for c in others
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@defquery(
    "cd1_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 3
                  THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 10 <> 7
    ), new AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 10 <> 5
    )
    SELECT COALESCE(new.o_orderkey, old.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                WHEN new.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           old.o_totalprice AS old_o_totalprice,
           new.o_totalprice AS new_o_totalprice,
           old.o_orderstatus AS old_o_orderstatus,
           new.o_orderstatus AS new_o_orderstatus
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_totalprice IS DISTINCT FROM new.o_totalprice
       OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
    ORDER BY o_orderkey
    """,
    doc="change-data-capture between two snapshots of `orders` (old: keys "
        "%10==7 absent + %10==3 prices stale; new: keys %10==5 retired): "
        "ONE full-outer shuffle join on the key classifies insert/delete/"
        "update via null-safe column compares and drops the unchanged "
        "majority before anything downstream sees it. The oracle replays "
        "the identical FULL OUTER JOIN in ANSI SQL. The +1.0 perturbation "
        "is the same IEEE double op on both sides — bit-identical. At "
        "100 TB both snapshots co-bucketed on the key make this "
        "zero-exchange (write_bucketed); compare_cols keeps the scan "
        "pruned to the columns the diff actually reads.",
)
def cd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    old = base.filter(F.col("o_orderkey") % 10 != 7).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 3, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    new = base.filter(F.col("o_orderkey") % 10 != 5)
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    ).orderBy("o_orderkey")


@defquery(
    "cd2_apply_diff",
    """
    WITH new AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 10 <> 5
    )
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM new
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="MERGE INTO analogue closing the CDC loop: the cd1 diff applied "
        "back onto the old snapshot (LEFT ANTI retire + union of new-side "
        "rows) must reconstruct the new snapshot EXACTLY — the oracle "
        "aggregates the new-snapshot definition directly, so any row the "
        "upsert loses, duplicates, or corrupts breaks the hash. Decimal "
        "sums keep the checksum order-independent.",
)
def cd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    old = base.filter(F.col("o_orderkey") % 10 != 7).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 3, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    new = base.filter(F.col("o_orderkey") % 10 != 5)
    diff = snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])
    rebuilt = apply_snapshot_diff(old, diff, ["o_orderkey"])
    return (
        rebuilt.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )
