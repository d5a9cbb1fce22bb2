"""Entity resolution / record linkage — all-pairs fuzzy matching without
the cartesian product.

The reference exposes pairwise string metrics (editDistance /
levenshteinDistance, datastore/function_definitions.py:8959-8966) but a
user who wants "find every pair of records whose names are within edit
distance k" has to write the O(n²) self-join themselves — at 100 TB that
is never going to run. :func:`fuzzy_self_join` restores an equi key with
**deletion-neighborhood blocking** (the FastSS family of algorithms,
Bocek et al. 2007, public):

* every string generates its deletion-1 neighborhood — itself plus the
  ``len(s)`` strings obtained by deleting one character;
* two strings with ``levenshtein(s, t) <= 1`` ALWAYS share at least one
  variant (substitution → both delete the differing position; indel →
  the shorter string is literally in the longer one's neighborhood);
* an equi-join on the variant key + the residual
  ``levenshtein(a, b) <= max_dist`` filter gives exact semantics.

Shuffle volume is Σ(len+1) rows keyed by variant strings — a plain
bucketed hash join, AQE-skew-splittable, no CartesianProduct /
BroadcastNestedLoopJoin anywhere (the suite-wide plan pin forbids both).
Everything is built-in Columns (transform/sequence/substring/explode/
levenshtein) — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table


def deletion_variants(col: str, *, include_self: bool = True) -> F.Column:
    """Array of deletion-1 variants of string column ``col``.

    Element 0 is the string itself (so distance-0/substitution pairs
    block together); elements 1..len are the string with character i
    removed. Pure Column expression — evaluated JVM-side in codegen.
    """
    lo = 0 if include_self else 1
    return F.expr(
        f"transform(sequence({lo}, length({col})), i -> "
        f"  case when i = 0 then {col} "
        f"       else concat(substring({col}, 1, i - 1), substring({col}, i + 1)) end)"
    )


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs ``(a, b)`` with ``a.key < b.key`` and
    ``levenshtein(a.name, b.name) <= max_dist``, without a cartesian.

    ``max_dist`` must be 1 for exact recall (the deletion-1 neighborhood
    guarantees co-blocking only up to distance 1; higher distances would
    need the deletion-k neighborhood). The residual filter keeps
    precision exact: sharing a variant only implies distance <= 2, so
    false candidates are dropped by the final ``levenshtein`` check.

    Scale: |variants| = Σ(len+1) rows shuffled on a string key. Hot
    variants (many records collapsing to one variant) grow blocks
    quadratically — at most ``alphabet × positions`` true matches share
    a variant, and AQE skew-join splits oversized candidate buckets.
    """
    if max_dist > 1:
        raise ValueError(
            "fuzzy_self_join: deletion-1 blocking is exact only for max_dist<=1"
        )
    # array_distinct: a run of k identical characters yields k identical
    # deletion variants — without dedup a candidate pair sharing that
    # variant joins k_a x k_b times and the duplicates are only crunched
    # AFTER the join. Deduping before explode shrinks both the shuffle
    # and the join output (el1 at sf0.1: 395k -> 253k candidate rows).
    sel = df.select(
        F.col(key_col).alias("_k"),
        F.col(name_col).alias("_n"),
        F.explode(F.array_distinct(deletion_variants(name_col))).alias("_variant"),
    )
    right = (
        sel.select(
            F.col("_k").alias("_k2"), F.col("_n").alias("_n2"), F.col("_variant")
        )
    )
    # Banded levenshtein (threshold form) BEFORE the dedup: the bounded DP
    # early-exits past max_dist (O(len*max_dist) not O(len^2)), and the
    # selective filter leaves the dropDuplicates shuffle only true matches
    # instead of every candidate (el1 at sf0.1: 3.49 s -> 1.67 s median).
    pairs = (
        sel.join(right, on="_variant", how="inner")
        .where(F.col("_k") < F.col("_k2"))
        .select(
            "_k",
            "_n",
            "_k2",
            "_n2",
            F.levenshtein(F.col("_n"), F.col("_n2"), max_dist).alias("_dist"),
        )
        .where(F.col("_dist") >= 0)  # threshold form returns -1 above max_dist
        # one row per pair; _n/_n2/_dist are functionally dependent on the keys
        .dropDuplicates(["_k", "_k2"])
    )
    return pairs.select(
        F.col("_k").alias(f"{key_col}_a"),
        F.col("_k2").alias(f"{key_col}_b"),
        F.col("_n").alias(f"{name_col}_a"),
        F.col("_n2").alias(f"{name_col}_b"),
        F.col("_dist").alias("dist"),
    )


@defquery(
    "el1_entity_resolution",
    """
    SELECT a.c_custkey AS c_custkey_a, b.c_custkey AS c_custkey_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM (SELECT * FROM customer WHERE c_custkey < 5000) a
    JOIN (SELECT * FROM customer WHERE c_custkey < 5000) b
      ON a.c_custkey < b.c_custkey
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY c_custkey_a, c_custkey_b
    """,
    doc="record linkage: every customer-name pair within edit distance 1, "
        "via deletion-neighborhood (FastSS) blocking — explode each name "
        "to its len+1 deletion-1 variants, equi-join on the variant, "
        "residual levenshtein filter. The oracle is the brute-force O(n²) "
        "definition, so BOTH sides bound the slice to c_custkey < 5000 — "
        "a no-op at sf0.01 (1500 keys) that keeps the quadratic ORACLE "
        "tractable at bench scale; the Spark operator itself needs no "
        "bound (shuffle on variant keys, no BNLJ/cartesian — the plan "
        "that survives 100 TB). Reference pairwise metric: "
        "datastore/function_definitions.py:8959 (editDistance) — this "
        "operator is the scalable all-pairs form.",
)
def el1(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 5000)
    return (
        fuzzy_self_join(cust, "c_custkey", "c_name", max_dist=1)
        .select("c_custkey_a", "c_custkey_b", "dist")
        .orderBy("c_custkey_a", "c_custkey_b")
    )
