"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference demos LSH/ANN patterns in SQL (examples/chDB_vector_search.ipynb)
and ships hash primitives (function_definitions.py:3059-3101 cityHash64/
sipHash64/xxHash64); these operators compose the same primitives into the
dedup pipelines a training-data system needs.

Scale design (the whole point — 100 TB posture):

* Signatures (minhash / simhash) are computed **per row** with higher-order
  array functions (`transform`/`aggregate` over the shingle array) — pure
  JVM codegen, O(K x shingles) per doc, NO explode of the signature and no
  Python. A 100 TB corpus computes signatures embarrassingly parallel.
* The only shuffles are (a) the LSH **band-bucket** exchange — rows keyed by
  (band_idx, band_hash), tiny payloads (doc_id + hash), and (b) the
  candidate-pair verification join, which touches only colliding pairs,
  never the full N^2.
* Verification joins shingle arrays back by doc_id — at scale this is a
  shuffle join on doc_id; candidates are a vanishing fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.operators import _repartition_feature_pass
from chdb_spark.queries import defquery, table

# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def tokens(col) -> F.Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(F.trim(col), r"\s+")


def shingles(col, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array column — per-row JVM math."""
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # docs shorter than n tokens yield no shingles (oracle parity)
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_hashes(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) → distinct (doc_id, h) exploded shingle hashes.

    The array-building ``shingles()`` HOF lambda runs interpreted (Spark does
    not codegen higher-order functions) — measured ~15x slower than this
    path: posexplode tokens → lead(n-1) window → concat_ws → xxhash64 →
    distinct, every step whole-stage-codegen. One shuffle keyed by doc_id
    (the window), one for the distinct — both scale linearly at 100 TB.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, n)]
    # gram AND the tail marker must be projected in the SAME plan node: a
    # window expression referenced after the filter would be re-evaluated
    # over the filtered rows, corrupting the tail shingles.
    grams = toks.select(
        "doc_id",
        F.concat_ws(" ", F.col("tok"), *leads).alias("g"),
        leads[-1].alias("_last"),
    )
    # Dedup per (doc_id, h): groupBy(doc_id, h) hash-agg (codegen'd) rather
    # than collect_set-per-doc (ObjectHashAggregate, no codegen — measured
    # 20% slower end-to-end despite saving an exchange).
    return (
        grams.filter(F.col("_last").isNotNull())
        .select("doc_id", F.xxhash64("g").alias("h"))
        .distinct()
    )


def verify_pairs(cand: DataFrame, ex: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs via the inverted index.

    |A∩B| = equi-join match count on (doc, h); |A∪B| = |A|+|B|-|A∩B|.
    Joins touch only candidate rows — at scale the candidate set is a
    vanishing fraction of the corpus, so this is the cheap step.
    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "h")
    b = ex.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def verify_pairs_arrays(cand: DataFrame, feats: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs via per-doc hash ARRAYS.

    Joins the (small) candidate set against the feature table twice and
    computes |A∩B| with native array_intersect — no explode, no
    count-groupBy; per-pair work is O(|hs|) on arrays bounded by document
    length. Faster than the inverted-index join (verify_pairs) whenever
    candidates ≪ corpus, which LSH guarantees; the inverted-index form
    remains for corpora whose per-doc arrays would not be memory-bounded.
    """
    fa = feats.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    fb = feats.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    jac = inter.cast("double") / union.cast("double")
    # Lazy checkpoint between the jaccard projection and the threshold
    # filter: without the boundary Catalyst pushes the θ-filter into the
    # pair join's condition AND re-inlines the jaccard alias in the final
    # projection, so array_intersect over the per-doc hash arrays is
    # evaluated ~4x per candidate pair (measured 1.62 s -> 0.62 s at
    # sf0.1 for 56k simhash candidates). The materialized relation is
    # (doc_a, doc_b, jaccard) — no arrays — computed in the same job that
    # first consumes it (lazy, not eager), executor-side blocks released
    # by ContextCleaner.
    pairs = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .localCheckpoint(eager=False)
    )
    return (
        pairs.filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def _perm_consts(k: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash constants (a_j odd, b_j) for k
    permutations, derived from a fixed-seed LCG — no RNG state at runtime."""
    out = []
    x = 0x9E3779B97F4A7C15
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x | 1) % (1 << 61)
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = x % (1 << 61)
        out.append((a, b))
    return out


_FNV = np.uint64(1099511628211)
_FNV_OFF = np.uint64(14695981039346656037)


def doc_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 128,
    bands: int = 32,
    with_minhash: bool = True,
    with_simhash: bool = True,
    hs_filter=None,
) -> DataFrame:
    """One Arrow-batched map pass over documents → per-doc dedup features:
    distinct shingle hashes ``hs``, MinHash LSH band hashes ``band_hashes``,
    SimHash64 fingerprint ``fp``.

    This is the zero-shuffle formulation: every feature derives from one
    document alone, so the whole stage is map-only (mapInPandas, Arrow
    batches, vectorized numpy inside) — at 100 TB it scales embarrassingly
    parallel with NO exchange, versus the explode→window→distinct→groupBy
    composition (kept below as the pure-JVM reference path) which shuffles
    the full shingle set twice and pays ~4 s of janino compile for its
    128-aggregate plan. Hash = pandas' deterministic siphash-based
    hash_array (stable across sessions); candidate recall does not depend
    on which 64-bit hash family is used, and precision is restored by exact
    verification either way.

    ``hs_filter`` (optional): vectorized predicate over a doc's int64 hash
    array, applied to the EMITTED ``hs`` column only — band/simhash
    features still derive from the full array. Lets a caller fuse a
    membership test (e.g. a broadcast Bloom filter) into this map pass
    instead of paying a second JVM↔Python crossing over the exploded
    gram stream (guide §4.1); must be cloudpickle-safe by value.
    """
    perms = np.array(_perm_consts(k), dtype=np.uint64)
    a_c, b_c = perms[:, 0], perms[:, 1]
    r = k // bands
    id_a = id_col

    def _starts(lens: np.ndarray) -> np.ndarray:
        s = np.zeros(lens.size, dtype=np.int64)
        np.cumsum(lens[:-1], out=s[1:])
        return s

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_a].to_numpy()
            ndocs = len(ids)
            tok_lists = [t.strip().split() for t in pdf[text_col]]
            # distinct shingle hashes per doc: hash every gram of the batch
            # in ONE hash_array call, then unique per doc slice. Gram
            # strings come from map(join, zip(tk, tk[1:], ...)) — the
            # zip walks n offset views in C instead of paying a Python
            # slice + bounds check per gram (measured ~10x less Python
            # time than the per-index form for the same strings); zip
            # yields len(tk)-n+1 tuples and nothing when len(tk) < n,
            # exactly the old guard.
            _join = " ".join
            gram_lists = [
                list(map(_join, zip(*(tk[i:] for i in range(n)))))
                for tk in tok_lists
            ]
            glens = np.array([len(g) for g in gram_lists], dtype=np.int64)
            flat = [g for gl in gram_lists for g in gl]
            allg = (
                pd.util.hash_array(np.asarray(flat, dtype=object))
                if flat
                else np.empty(0, dtype=np.uint64)
            )
            gs = _starts(glens)
            hs_list = [
                np.unique(allg[s : s + l]) if l else np.empty(0, dtype=np.uint64)
                for s, l in zip(gs, glens)
            ]

            if with_minhash:
                hlens = np.array([h.size for h in hs_list], dtype=np.int64)
                nz = hlens > 0
                bh_all = np.empty((ndocs, bands), dtype=np.uint64)
                if nz.any():
                    # Per-doc (|hs|, k) slab, min-reduced immediately — NOT a
                    # batch-wide (Σ|hs|, k) matrix + ufunc.reduceat: reduceat
                    # along axis 0 of a 2-D array runs a strided per-element
                    # inner loop (measured 60x slower than per-doc .min at a
                    # 2M-hash batch) and the batch matrix is Σ|hs|×k×8 bytes
                    # (multi-GB for full Arrow batches at scale; fresh-page
                    # allocation alone dominated). Per-doc slabs bound memory
                    # at O(max|hs| × k); ultra-long docs chunk the slab too.
                    def _uhash_mins(h: np.ndarray) -> np.ndarray:
                        m = None
                        for i in range(0, h.size, 1 << 20):
                            sl = h[i : i + (1 << 20)]
                            part = (sl[:, None] * a_c[None, :] + b_c[None, :]).min(axis=0)
                            m = part if m is None else np.minimum(m, part)
                        return m

                    mins = np.stack([_uhash_mins(h) for h in hs_list if h.size])
                    mm = mins.reshape(-1, bands, r)
                    bh = np.full((mm.shape[0], bands), _FNV_OFF, dtype=np.uint64)
                    for c in range(r):
                        bh = (bh * _FNV) ^ mm[:, :, c]
                    bh_all[nz] = bh
                if (~nz).any():
                    # per-doc sentinel: shingle-less docs must not share buckets
                    bh_all[~nz] = (
                        ids[~nz].astype(np.uint64)[:, None] * _FNV
                        + np.arange(bands, dtype=np.uint64)[None, :]
                    )
                band_col = list(bh_all.view(np.int64))
            else:
                band_col = [[] for _ in range(ndocs)]

            if with_simhash:
                tlens = np.array([len(tk) for tk in tok_lists], dtype=np.int64)
                flat_t = [t for tk in tok_lists for t in tk]
                fp_all = np.zeros(ndocs, dtype=np.uint64)
                if flat_t:
                    allt = pd.util.hash_array(np.asarray(flat_t, dtype=object))
                    nzt = tlens > 0
                    nzlens = tlens[nzt]
                    st = _starts(nzlens)
                    # Per-doc (|tok|, 64) uint8 bit slab via unpackbits
                    # (little-endian bytes + little bitorder = bit j at col
                    # j), summed immediately — NOT a batch-wide bit matrix +
                    # add.reduceat: reduceat's strided inner loop measured
                    # ~90x slower than per-doc .sum at a 2M-token batch, and
                    # the batch matrix costs 64 bytes/token for the whole
                    # Arrow batch. Peak memory is now O(max|tok| × 64).
                    sums = np.stack(
                        [
                            np.unpackbits(
                                allt[s : s + l].view(np.uint8).reshape(-1, 8),
                                axis=1,
                                bitorder="little",
                            ).sum(axis=0, dtype=np.int64)
                            for s, l in zip(st, nzlens)
                        ]
                    )
                    votes = 2 * sums - nzlens[:, None]
                    fp_all[nzt] = np.packbits(
                        (votes > 0).astype(np.uint8), axis=1, bitorder="little"
                    ).view(np.uint64)[:, 0]
                fp_col = fp_all.view(np.int64)
            else:
                fp_col = np.zeros(ndocs, dtype=np.int64)

            if hs_filter is not None:
                hs_list = [
                    h[hs_filter(h.view(np.int64))] if h.size else h
                    for h in hs_list
                ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "hs": [h.view(np.int64) for h in hs_list],
                    "band_hashes": band_col,
                    "fp": fp_col,
                }
            )

    sel = docs.select(id_a, text_col)
    # A small corpus can arrive as 1-2 scan partitions (one parquet file) —
    # that would serialize the map pass onto one worker. Round-robin to full
    # parallelism first; the exchange carries only (id, text). Unconditional:
    # probing the current partition count would force a plan→RDD conversion
    # on the driver, and at scale the one extra exchange is cheaper than that.
    # Disable via spark.chdb.featurePass.repartition=false when file splits
    # already give full parallelism.
    sel = _repartition_feature_pass(sel)
    return sel.mapInPandas(
        gen, "doc_id long, hs array<long>, band_hashes array<long>, fp long"
    )


def minhash_signatures(ex: DataFrame, k: int = 128) -> DataFrame:
    """exploded (doc_id, h) → (doc_id, sig array<long>[k]).

    A per-row transform(seq(k), j -> array_min(...)) HOF would run
    interpreted (Spark does not codegen HOF lambdas) — instead take the k
    universal-hash minima as groupBy aggregates: hash-agg with map-side
    partial combine, so the shuffle carries one partial signature per doc
    per partition, not the shingles. Measured: 0.7s for k=128 over 260k
    shingle rows (codegen'd), vs ~11s via the HOF form."""
    perms = _perm_consts(k)
    aggs = [
        F.min(F.col("h") * F.lit(a) + F.lit(b)).alias(f"_m{j}")
        for j, (a, b) in enumerate(perms)
    ]
    sig = ex.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[f"_m{j}" for j in range(k)]).alias("sig"))


def lsh_bands(sig_col, bands: int, rows: int) -> F.Column:
    """Array of band-bucket hashes: hash of each r-row slice of the signature.

    Built as ``bands`` plain expressions (element_at + concat_ws + xxhash64)
    so the whole array stays inside whole-stage codegen — a transform()
    lambda here would fall back to interpreted evaluation."""
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig_col, b * rows + i + 1).cast("string")
                        for i in range(rows)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def simhash64(tokens_col) -> F.Column:
    """64-bit SimHash: per-bit majority vote of token hashes.

    bit_b = sign( sum over tokens of (hash(t)>>b & 1 ? +1 : -1) ); fingerprint
    folds the 64 bits into one long. All per-row Column math.
    """
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))

    # b must be a Python int (shiftright's numBits is not a Column) — build
    # the 64 vote expressions in a driver-side loop; each is a JVM-side fold.
    # NB: the merge fn must be exactly 2-ary (pyspark inspects lambda arity),
    # so bind b via a closure factory, not a default arg.
    def _vote(b: int):
        return lambda acc, x: acc + (
            F.shiftright(x, b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
        )

    bit_votes = F.array(
        *[F.aggregate(hashes, F.lit(0).cast("long"), _vote(b)) for b in range(64)]
    )
    return F.aggregate(
        F.reverse(bit_votes),
        F.lit(0).cast("long"),
        lambda acc, v: acc * 2 + F.when(v > 0, 1).otherwise(0),
    )


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, text) → (doc_id, fp) via the codegen'd explode+groupBy path
    (same rationale as minhash_signatures: HOF lambdas are interpreted)."""
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("t")
    ).select("doc_id", F.xxhash64("t").alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1).alias(f"_v{b}")
            for b in range(64)
        ]
    )
    # flat sum of bit terms (a 64-deep fold trips the analyzer's fixpoint
    # iteration cap); bit 63 is the long sign bit → Long.MIN_VALUE
    terms = [
        F.when(F.col(f"_v{b}") > 0, F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(64)
    ]
    fp = terms[0]
    for t in terms[1:]:
        fp = fp + t
    return votes.select("doc_id", fp.alias("fp"))


def hamming64(a, b) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def jaccard(a_shingles, b_shingles) -> F.Column:
    inter = F.size(F.array_intersect(a_shingles, b_shingles))
    union = F.size(F.array_union(a_shingles, b_shingles))
    return inter.cast("double") / union.cast("double")


def candidate_pairs_from_buckets(bucketed: DataFrame, key_cols: list[str]) -> DataFrame:
    """(bucket_key, doc_id) rows → distinct (doc_a < doc_b) candidate pairs.

    Self-join on the bucket key — shuffle is keyed by bucket, each bucket is
    small by construction (near-dups + rare collisions)."""
    a = bucketed.select(*key_cols, F.col("doc_id").alias("doc_a"))
    b = bucketed.select(*key_cols, F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, on=key_cols)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# operator pipelines
# ---------------------------------------------------------------------------


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 128,
    bands: int = 32,
    n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by MinHash+LSH, verified with exact Jaccard.

    shingle → K-minhash → band → bucket-join → exact-verify ≥ threshold.
    Output: (doc_a, doc_b, jaccard). Recall at threshold 0.8 with K=128/b=32
    is ≳1-1e-7 per pair; the verification step makes precision exact.
    """
    # eager materialize: the features are read by three branches of one job —
    # lazily-populated cache would race and recompute per branch.
    # eager checkpoint: three branches of one job read the features from
    # block storage; ContextCleaner releases the blocks on GC (measured
    # FASTER than persist here — lineage truncation saves re-analysis of
    # the wide minhash expressions; no r5-style cache leak)
    feats = doc_features(
        docs, id_col, text_col, n=n, k=k, bands=bands, with_simhash=False
    ).localCheckpoint(eager=True)
    banded = feats.select(
        "doc_id", F.posexplode("band_hashes").alias("band_idx", "band_hash")
    )
    cand = candidate_pairs_from_buckets(banded, ["band_idx", "band_hash"])
    return verify_pairs_arrays(cand, feats, threshold)


def simhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by SimHash banding + Hamming + exact verification.

    The 64-bit fingerprint is split into 8 8-bit bands; any pair within
    Hamming distance 7 shares at least one exact band (pigeonhole), and the
    planted near-dup class (J≥0.9) lands well inside that. Candidates are
    filtered by full Hamming ≤ max_hamming, then exact-verified.
    """
    feats = doc_features(
        docs, id_col, text_col, n=3, with_minhash=False, with_simhash=True
    ).localCheckpoint(eager=True)  # eager multi-branch reuse; auto-released
    fp = feats.select("doc_id", "fp")
    banded = fp.select(
        "doc_id",
        "fp",
        F.posexplode(
            F.array(*[F.shiftright(F.col("fp"), 8 * i).bitwiseAND(F.lit(0xFF)) for i in range(8)])
        ).alias("band_idx", "band_hash"),
    )
    a = banded.select("band_idx", "band_hash", F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    b = banded.select("band_idx", "band_hash", F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    cand = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(hamming64(F.col("fp_a"), F.col("fp_b")) <= max_hamming)
        .select("doc_a", "doc_b")
        .distinct()
    )
    return verify_pairs_arrays(cand, feats, threshold)


def exact_dedup(docs: DataFrame, text_col: str = "text", order_col: str = "doc_id") -> DataFrame:
    """Exact dedup keep-first: hash-groupBy on content digest (md5), keep the
    lowest ``order_col`` row per group. Shuffle keyed by digest — uniform."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(order_col)
    return docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# headline queries (driver-facing, with DuckDB oracles)
# ---------------------------------------------------------------------------

_BRUTE_FORCE_JACCARD = """
    WITH sh AS (
      SELECT doc_id, list_distinct([sub[1] || ' ' || sub[2] || ' ' || sub[3] for sub in
        [toks[i:i+2] for i in range(1, len(toks)-1)]]) AS shingles
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(a.shingles || b.shingles)), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(a.shingles || b.shingles)) >= {thr}
    ORDER BY doc_a, doc_b
"""


@defquery(
    "dd1_exact_dedup",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
    ),
    ranked AS (
      SELECT doc_id, md5(text) AS h,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM corpus
    )
    SELECT count(*) AS n_total,
           sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed
    FROM ranked
    """,
    doc="exact dedup keep-first over a corpus with injected exact duplicates (hash-groupBy).",
)
def dd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dupes)
    kept = exact_dedup(corpus)
    return corpus.agg(F.count("*").alias("n_total")).crossJoin(
        kept.agg(F.count("*").alias("n_kept"))
    ).select(
        "n_total", "n_kept", (F.col("n_total") - F.col("n_kept")).alias("n_removed")
    )


@defquery(
    "dd2_minhash_lsh",
    _BRUTE_FORCE_JACCARD.format(thr=0.8),
    doc="MinHash(K=128)+LSH(32 bands) near-dup pairs, exact-verified ≥0.8. Oracle = brute-force Jaccard.",
)
def dd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(docs, threshold=0.8).orderBy("doc_a", "doc_b")


@defquery(
    "dd3_simhash",
    _BRUTE_FORCE_JACCARD.format(thr=0.8),
    doc="SimHash64 4-band candidates + Hamming≤8 + exact-verified ≥0.8. Oracle = brute-force Jaccard.",
)
def dd3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return simhash_dedup(docs, max_hamming=8, threshold=0.8).orderBy("doc_a", "doc_b")


@defquery(
    "dd4_ngram_jaccard_blocked",
    """
    WITH sh AS (
      SELECT doc_id, lang, n_chars // 40 AS len_bucket,
        list_distinct([sub[1] || ' ' || sub[2] || ' ' || sub[3] for sub in
        [toks[i:i+2] for i in range(1, len(toks)-1)]]) AS shingles
      FROM (SELECT doc_id, lang, n_chars, string_split(trim(text), ' ') AS toks FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(a.shingles || b.shingles)), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
         AND abs(a.len_bucket - b.len_bucket) <= 1
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(a.shingles || b.shingles)) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    doc="exact n-gram Jaccard with (lang, length-bucket±1) blocking — the classic "
    "blocked-pairwise dedup; block keys bound each join cell so pair count stays "
    "near-linear in corpus size.",
)
def dd4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5).orderBy("doc_a", "doc_b")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via an INVERTED-INDEX join — the scalable
    form: docs sharing zero shingles never meet, so cost tracks shared-shingle
    mass, not corpus². |A∩B| = count of equi-join matches on shingle hash;
    |A∪B| = |A|+|B|-|A∩B|. All codegen'd equi-joins + hash agg; the one
    shuffle is keyed by shingle hash (AQE skew-split absorbs hot shingles).
    Blocking (same lang, length bucket ±1) prunes cross-topic matches.

    The per-doc metadata relation grows with the corpus, so it is joined
    plainly (doc_id equi-join into the already-shuffling pipeline) — never
    force-broadcast; AQE upgrades the join to broadcast only when the side
    is actually small."""
    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        "lang",
        F.floor(F.col("n_chars") / 40).alias("lb"),
    )
    feats = doc_features(
        docs, id_col, text_col, n=n, with_minhash=False, with_simhash=False
    ).localCheckpoint(eager=True)  # eager multi-branch reuse; auto-released
    hashes = feats.select("doc_id", F.explode("hs").alias("h"))
    sizes = feats.select("doc_id", F.size("hs").alias("sz"))
    ex = hashes.join(meta, "doc_id").join(sizes, "doc_id")
    a = ex.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("lb").alias("lb_a"), F.col("sz").alias("sz_a"), "h"
    )
    b = ex.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("lb").alias("lb_b"),
        F.col("sz").alias("sz_b"),
        F.col("h").alias("h_b"),
    )
    inter = (
        a.join(
            b,
            (F.col("h") == F.col("h_b"))
            & (F.col("lang") == F.col("lang_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("lb_a") - F.col("lb_b")) <= 1),
        )
        .groupBy("doc_a", "doc_b", "lang", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "lang", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# paragraph-level dedup + train/eval decontamination (RefinedWeb/CCNet- and
# GPT-3-style corpus hygiene passes)
# ---------------------------------------------------------------------------


def paragraph_dup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\. ",
) -> DataFrame:
    """Per-document duplicated-paragraph ratio: split into paragraphs
    (sentence-level here — the synthetic corpus has no newlines), hash each,
    count occurrences CORPUS-WIDE, and report per doc how many of its
    paragraphs appear elsewhere (the RefinedWeb/CCNet repetition-removal
    signal; docs above a dup-ratio cut get dropped or trimmed).

    Scale shape: explode → hash-count keyed by paragraph hash (map-side
    partial combine; hot paragraphs are exactly the interesting ones and
    AQE skew-split absorbs them) → join back on hash → per-doc agg keyed by
    doc_id. Two shuffles, both on uniform-ish keys; no all-pairs anywhere.
    """
    from chdb_spark.operators.text import md5_prefix48

    paras = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), sep)).alias("para"),
        )
        .withColumn("para", F.trim("para"))
        .filter(F.length("para") > 0)
        .withColumn("h", md5_prefix48(F.col("para")))
    )
    # the hash stream feeds the corpus-wide count AND the join-back;
    # checkpoint the NARROW (doc_id, h) projection (16 bytes/para) so the
    # explode + md5 pass over the corpus text runs once (dd9 precedent)
    hashed = paras.select("doc_id", "h").localCheckpoint(eager=False)
    counts = hashed.groupBy("h").agg(F.count("*").alias("n_occ"))
    per_doc = (
        hashed.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum((F.col("n_occ") > 1).cast("int")).cast("long").alias("n_dup_paras"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_paras",
        "n_dup_paras",
        F.round(F.col("n_dup_paras") / F.col("n_paras"), 4).alias("dup_ratio"),
    )


@defquery(
    "dd5_paragraph_dedup",
    """
    WITH paras AS (
      SELECT doc_id, trim(p) AS para
      FROM documents, unnest(string_split(text, '. ')) t(p)
      WHERE length(trim(p)) > 0
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(para), 1, 12))::BIGINT AS h FROM paras
    ),
    counts AS (SELECT h, count(*) AS n_occ FROM hashed GROUP BY h)
    SELECT doc_id,
           count(*) AS n_paras,
           CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
           round(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS dup_ratio
    FROM hashed JOIN counts USING (h)
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="corpus-wide duplicated-paragraph ratio per document (RefinedWeb/"
        "CCNet repetition removal): explode paragraphs, hash-count across "
        "the corpus, report each doc's share of non-unique paragraphs.",
)
def dd5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return paragraph_dup_stats(docs).orderBy("doc_id")


def _doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc_id, h) stream of per-doc DISTINCT n-token gram hashes via the
    zero-shuffle Arrow feature pass — the one gram construction both
    decontamination variants share (their bit-identical-output contract
    depends on it being literally the same code)."""
    feats = doc_features(
        df, id_col=id_col, text_col=text_col, n=n,
        with_minhash=False, with_simhash=False,
    )
    return feats.select(F.col("doc_id"), F.explode("hs").alias("h"))


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    ordered: bool = True,
) -> DataFrame:
    """Train/eval overlap detection — the GPT-3 decontamination rule: a
    training document is contaminated when it shares any ``n``-gram
    (n=13 tokens) with a benchmark document.

    Scale shape: benchmark gram hashes are small by definition (eval sets
    are thousands of docs) — distinct-reduced and LEFT SEMI joined against
    the training gram stream, so the corpus side never materializes pairs;
    AQE broadcasts the benchmark side. Gram construction reuses the
    ZERO-SHUFFLE Arrow feature pass (``doc_features`` with n-token
    shingles): per-doc distinct gram hashes come out of one map-only
    stage — the posexplode+lead window formulation this replaces paid a
    full doc_id shuffle before the join (round-4 change; the shared-gram
    COUNTS are hash-function-agnostic, so the oracle is unchanged).
    """
    bench_hashes = (
        _doc_grams(benchmark, id_col, text_col, n).select("h").distinct()
    )
    hits = _doc_grams(train, id_col, text_col, n).join(
        bench_hashes, "h", "left_semi"
    )
    out = (
        # hs arrays are distinct per doc, so count == count_distinct — the
        # cheaper partial-aggregating form
        hits.groupBy("doc_id")
        .agg(F.count("h").alias("n_shared_grams"))
    )
    # ``ordered=False`` callers (pl1: the result only feeds an anti-join)
    # skip the global sort — a range exchange plus its sampling job.
    return out.orderBy("doc_id") if ordered else out


@defquery(
    "dd6_decontamination",
    """
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    grams AS (
      SELECT doc_id,
             ('0x' || substr(md5(array_to_string(toks[i:i+12], ' ')), 1, 12))::BIGINT AS h
      FROM toks, unnest(range(1, len(toks) - 11)) t(i)
    ),
    bench AS (
      SELECT DISTINCT h FROM grams WHERE doc_id % 10 = 0
    )
    SELECT doc_id, CAST(count(DISTINCT h) AS BIGINT) AS n_shared_grams
    FROM grams JOIN bench USING (h)
    WHERE doc_id % 10 != 0
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="GPT-3-style decontamination: training docs sharing any 13-token "
        "gram with the (synthesized: doc_id %% 10 = 0) benchmark set, with "
        "shared-gram counts. Benchmark gram hashes reduce small and semi-"
        "join against the training gram stream.",
)
def dd6(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return decontaminate(train, bench, n=13)


def _bloom_params(n_items: int, fpp: float = 0.01, max_bits: int = 1 << 27):
    """Optimal (m bits, k hashes) for ``n_items`` at ``fpp``; m capped (a
    cap only raises the FP rate, never correctness — FPs are re-checked)."""
    import math

    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, min(m, max_bits))
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _make_bloom_positions():
    # factory, not a plain module function: the returned closure's qualname
    # is not importable, so cloudpickle ships it BY VALUE into the pandas
    # UDF — workers never need `import chdb_spark` (the driver may run the
    # repo from an arbitrary cwd without it on the executor PYTHONPATH)
    def positions(h, m: int, k: int):
        """k bit positions for int64 gram hashes ``h`` (vectorized):
        splitmix64 finalizer gives two independent 64-bit streams, double
        hashing (h1 + i*h2) mod m derives the rest (Kirsch-Mitzenmacher)."""
        x = h.astype(np.uint64)
        c1, c2 = np.uint64(0xBF58476D1CE4E5B9), np.uint64(0x94D049BB133111EB)
        x = (x ^ (x >> np.uint64(30))) * c1
        x = (x ^ (x >> np.uint64(27))) * c2
        x ^= x >> np.uint64(31)
        h1 = x
        h2 = (x * c1 + np.uint64(1)) | np.uint64(1)  # odd → full-period stride
        return [
            ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
            for i in range(k)
        ]

    return positions


_bloom_positions = _make_bloom_positions()


def decontaminate_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    fpp: float = 0.01,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``decontaminate`` with a broadcast Bloom prefilter — same exact
    result, built for the 100 TB corpus side.

    The plain semi-join shuffles EVERY distinct training gram hash at
    least to its exchange write; at 100 TB that is the dominant cost even
    though the benchmark side is tiny. Here the benchmark grams (small by
    contract: eval suites are thousands of docs) are collected once into
    a driver-built Bloom filter (~1.2 MB per million grams at 1% FP) and
    broadcast; a vectorized pandas UDF tests the training gram stream
    MAP-SIDE, so only true hits + ~fpp false positives ever reach the
    exact confirming semi-join. False positives are eliminated there, so
    the output is bit-identical to ``decontaminate`` (dd6's oracle
    applies verbatim) — the bloom only shrinks the shuffle by ~1/fpp.

    No Spark-side BloomFilterAggregate: the JVM `df.stat.bloomFilter`
    object can't cross into Python workers, so the filter is a numpy bit
    array with splitmix64 double hashing — engine-portable and
    deterministic.
    """
    spark = train.sparkSession

    bench_np = np.array(
        [
            r[0]
            for r in _doc_grams(benchmark, id_col, text_col, n)
            .select("h")
            .distinct()
            .collect()
        ],
        dtype=np.int64,
    )
    out_schema = "doc_id long, n_shared_grams long"
    if not len(bench_np):
        return spark.createDataFrame([], out_schema)

    m, k = _bloom_params(len(bench_np), fpp)
    bits = np.zeros((m + 63) // 64, dtype=np.uint64)
    for pos in _bloom_positions(bench_np, m, k):
        np.bitwise_or.at(bits, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    bc = spark.sparkContext.broadcast((bits, m, k))

    def _bloom_keep(h: np.ndarray) -> np.ndarray:
        """Vectorized membership mask for an int64 hash array."""
        bits_b, m_b, k_b = bc.value
        hit = np.ones(h.size, dtype=bool)
        for pos in _bloom_positions(h, m_b, k_b):
            word = bits_b[pos >> 6]
            hit &= (word >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1) != 0
        return hit

    # the exact confirming side is rebuilt from the driver-held hashes —
    # the benchmark gram pipeline ran ONCE (for the collect above); re-
    # deriving the plan here would execute that whole pipeline a second
    # time. bench is small by contract, so createDataFrame is cheap.
    bench_hashes = spark.createDataFrame(
        pd.DataFrame({"h": bench_np}), "h long"
    )
    # Bloom test FUSED into the gram feature pass (hs_filter): the
    # training gram stream previously crossed the JVM↔Python boundary a
    # second time through a pandas-UDF might_contain over every exploded
    # gram row; fusing tests the same hashes with the same positions
    # function inside the pass that computed them, and the pass now emits
    # only hits + ~fpp false positives (the exact semi-join below still
    # eliminates FPs, so the result is bit-identical).
    candidates = doc_features(
        train, id_col=id_col, text_col=text_col, n=n,
        with_minhash=False, with_simhash=False, hs_filter=_bloom_keep,
    ).select(F.col("doc_id"), F.explode("hs").alias("h"))
    hits = candidates.join(F.broadcast(bench_hashes), "h", "left_semi")
    return (
        hits.groupBy("doc_id")
        .agg(F.count("h").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


@defquery(
    "dd12_bloom_decontamination",
    """
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    grams AS (
      SELECT doc_id,
             ('0x' || substr(md5(array_to_string(toks[i:i+12], ' ')), 1, 12))::BIGINT AS h
      FROM toks, unnest(range(1, len(toks) - 11)) t(i)
    ),
    bench AS (
      SELECT DISTINCT h FROM grams WHERE doc_id % 10 = 0
    )
    SELECT doc_id, CAST(count(DISTINCT h) AS BIGINT) AS n_shared_grams
    FROM grams JOIN bench USING (h)
    WHERE doc_id % 10 != 0
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Bloom-prefiltered GPT-3-style decontamination: eval grams build a "
        "broadcast numpy Bloom filter tested map-side over the training "
        "gram stream; only hits + ~1%% FPs reach the exact confirming "
        "semi-join, so the result equals dd6 exactly while the shuffle "
        "shrinks ~100x at corpus scale (the oracle is dd6's, verbatim).",
)
def dd12(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return decontaminate_bloom(train, bench, n=13)


# ---------------------------------------------------------------------------
# duplicate-cluster formation (pairs → connected components → canonical doc)
# ---------------------------------------------------------------------------


# Cost-based small-pairs switch for connected_components (the pagerank
# limit-probe pattern): a near-dup pair relation under this many rows is
# a few MB, and label propagation's per-iteration cost (2 checkpoints +
# a convergence count — ~3 jobs/iter) dwarfs a driver-side union-find
# over the once-pulled edge list. The probe job pays the (possibly
# expensive LSH-join) pair lineage exactly once either way. Conf 0
# forces the distributed shape.
SMALL_PAIRS_CONF = "spark.chdb_spark.dedup.smallPairs"
SMALL_PAIRS_DEFAULT = 200_000


def _components_local(spark, pdf, id_type: str) -> DataFrame:
    """Small-pairs lane of :func:`connected_components`: union-find with
    path compression over the pulled pair list. Exactly the distributed
    fixpoint by construction — both compute, per vertex, the minimum id
    (same ``<`` ordering F.least uses) reachable in its component."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def py(v):  # numpy scalar → python native for createDataFrame
        return v.item() if hasattr(v, "item") else v

    for a, b in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
        ra, rb = find(py(a)), find(py(b))
        if ra != rb:
            # union by min id: the root IS the cluster label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted((v, find(v)) for v in parent)
    if len(rows) <= 1024 and id_type in ("bigint", "int", "smallint"):
        # zero-task LocalRelation (utils.values_relation); string ids
        # keep createDataFrame (repr-quoting SQL strings isn't worth it)
        from chdb_spark.utils import values_relation

        t = id_type.upper()
        return values_relation(
            spark, rows, [("doc_id", t), ("cluster_id", t)]
        )
    return spark.createDataFrame(
        rows, f"doc_id {id_type}, cluster_id {id_type}"
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
    small_pairs: int | None = None,
) -> DataFrame:
    """Connected components over near-dup pairs by min-label propagation —
    the step between pairwise dedup output and "keep one doc per duplicate
    cluster": every vertex converges to the smallest doc_id reachable from
    it, which names its cluster.

    Scale shape: per iteration, one join of the label relation against the
    symmetrized edge list and one min-aggregate — O(E) shuffle keyed by
    vertex, no driver-side graph state (the driver sees only the
    changed-label count). Iterations needed = graph diameter in hops
    (near-dup clusters are shallow — boilerplate families converge in
    2-3). Deterministic: min-label is order-free.

    ``small_pairs`` (default: the ``spark.chdb_spark.dedup.smallPairs``
    conf, 200k): limit-probe lane pick — one job pulls at most
    ``small_pairs``+1 pair rows; when the relation fits, a driver-side
    union-find replaces the whole iteration (same min-id labels, no
    per-iteration job floor). 0 forces the distributed shape.

    Lane-agreement contract: the union-find lane is exact at ANY
    component diameter (it ignores ``max_iters``); the distributed lane
    propagates at most ``max_iters`` hops and emits a loud
    ``RuntimeWarning`` when labels are still changing at the cap — so
    the two lanes are guaranteed equal only for graphs with diameter ≤
    ``max_iters`` (every near-dup cluster in practice; a 200k-edge path
    graph with ``small_pairs=0`` is the documented counterexample — the
    warning, not silence, is the signal there).
    """
    thr = small_pairs
    if thr is None:
        try:
            thr = int(
                pairs.sparkSession.conf.get(
                    SMALL_PAIRS_CONF, str(SMALL_PAIRS_DEFAULT)
                )
            )
        except Exception:
            thr = SMALL_PAIRS_DEFAULT
    if thr and thr > 0:
        probe = pairs.select(a_col, b_col).limit(thr + 1).toPandas()
        # NULL ids: pandas null-promotion would turn long ids into floats
        # and relabel silently — the distributed propagation owns the
        # (null-key) semantics, so nulls fall through to it
        if len(probe) <= thr and not probe.isnull().values.any():
            return _components_local(
                pairs.sparkSession,
                probe,
                pairs.schema[a_col].dataType.simpleString(),
            )
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    # localCheckpoint (not persist): each iteration references `labels`
    # twice (neighbor join + changed-count join), so without lineage
    # truncation the logical plan doubles per iteration — exponential
    # Catalyst analysis time by ~iteration 15. Checkpointing materializes
    # the ≤|V|-row label relation on executors and resets the plan to a
    # scan, keeping every iteration O(E) compute AND O(1) plan size.
    # (On a cluster with preemptible executors, swap for reliable
    # checkpoint() on a checkpoint dir — same shape.)
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint()
    )
    changed = 0
    try:
        for _ in range(max_iters):
            neigh = (
                edges.join(labels, edges.dst == labels.v)
                .groupBy("src")
                .agg(F.min("label").alias("nmin"))
            )
            new_labels = (
                labels.join(neigh, labels.v == neigh.src, "left")
                .select(
                    "v",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            # Converging silently short of a fixpoint would split long
            # duplicate chains into multiple clusters with no signal —
            # surface it (diameter > max_iters is pathological for
            # near-dup graphs, so a loud warning beats extra iterations).
            import warnings

            warnings.warn(
                f"connected_components: not converged after {max_iters} "
                f"iterations ({changed} labels still changing); clusters "
                "may be split — raise max_iters",
                RuntimeWarning,
                stacklevel=2,
            )
        return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()


@defquery(
    "dd7_dedup_clusters",
    """
    WITH RECURSIVE sh AS (
      SELECT doc_id, list_distinct([sub[1] || ' ' || sub[2] || ' ' || sub[3] for sub in
        [toks[i:i+2] for i in range(1, len(toks)-1)]]) AS shingles
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(a.shingles || b.shingles)) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.v
    ),
    comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v)
    SELECT cluster_id, count(*) AS n_docs,
           CAST(count(*) - 1 AS BIGINT) AS n_removable
    FROM comp GROUP BY cluster_id ORDER BY cluster_id
    """,
    doc="duplicate-cluster formation: exact-verified near-dup pairs "
        "(Jaccard >= 0.8, the dd2 candidate set) → connected components by "
        "min-label propagation → per-cluster sizes with the removable-doc "
        "count (cluster canonical = min doc_id). Oracle replays components "
        "via a recursive CTE.",
)
def dd7(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(docs, threshold=0.8)
    comp = connected_components(pairs)
    return (
        comp.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_docs"),
            (F.count("*") - 1).cast("long").alias("n_removable"),
        )
        .orderBy("cluster_id")
    )


def soft_dedup_weights(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SoftDeDup: reweight duplicates instead of dropping them — every doc
    in a near-dup cluster of size n gets sampling weight 1/n (unique docs
    keep 1.0), so a training run preserves the corpus distribution while
    no duplicate FAMILY is over-represented (hard dedup throws away the
    within-family diversity this keeps).

    Scale shape: reuses the banded-LSH pair generation and O(E) label
    propagation (``minhash_lsh_dedup`` → ``connected_components``); the
    added work is one groupBy(cluster) count and one LEFT join back to
    the corpus keyed by doc id — both shuffles on uniform keys. The
    weight column is closed-form from the cluster size, so the oracle
    replays it exactly on top of dd7's recursive-component replay.
    """
    comp = connected_components(minhash_lsh_dedup(docs, threshold=threshold))
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    sized = comp.join(sizes, "cluster_id").select(
        F.col("doc_id").alias("_cid"), "cluster_size"
    )
    return docs.join(
        sized, docs[id_col] == sized["_cid"], "left"
    ).select(
        F.col(id_col).alias("doc_id"),
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
        F.round(F.lit(1.0) / F.coalesce("cluster_size", F.lit(1)), 6).alias("weight"),
    )


@defquery(
    "dd13_soft_dedup_weights",
    """
    WITH RECURSIVE sh AS (
      SELECT doc_id, list_distinct([sub[1] || ' ' || sub[2] || ' ' || sub[3] for sub in
        [toks[i:i+2] for i in range(1, len(toks)-1)]]) AS shingles
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(a.shingles || b.shingles)) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.v
    ),
    comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
    sized AS (
      SELECT doc_id, count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM comp
    )
    SELECT d.doc_id,
           CAST(coalesce(s.cluster_size, 1) AS BIGINT) AS cluster_size,
           round(CAST(1.0 AS DOUBLE) / coalesce(s.cluster_size, 1), 6) AS weight
    FROM documents d LEFT JOIN sized s USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="SoftDeDup sampling weights: near-dup clusters (the dd7 components) "
        "give every member weight 1/cluster_size, unique docs weight 1.0 — "
        "downweighting instead of dropping preserves within-family "
        "diversity at unchanged effective epochs. Oracle replays the "
        "components recursively and the closed-form weight on top.",
)
def dd13(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return soft_dedup_weights(docs, threshold=0.8).orderBy("doc_id")


def semantic_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level train/eval decontamination: flag every training
    vector whose max cosine against ANY benchmark vector reaches
    ``threshold`` — the semantic-overlap complement to the 13-gram rule
    (``decontaminate``), catching paraphrased benchmark leakage that
    token n-grams miss.

    Scale shape: benchmark embeddings are eval-set-sized by definition →
    broadcast as one (|B| x dim) float64 matrix; the training side is an
    unbounded Arrow-batched scan — each batch computes one BLAS product
    and reduces it to (max_cos, argmax) per row. No shuffle at all until
    the final aggregation the caller chooses; the N x |B| score matrix
    never materializes.
    """
    import numpy as np

    spark = train.sparkSession
    brows = benchmark.select(id_col, vec_col).collect()  # eval-set-sized
    bids = np.array([r[0] for r in brows], dtype=np.int64)
    B = np.array([list(r[1]) for r in brows], dtype=np.float64)
    B /= np.linalg.norm(B, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((bids, B))

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        bids_b, Bb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = _np.stack([_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]])
            A /= _np.linalg.norm(A, axis=1, keepdims=True)
            S = A @ Bb.T  # (batch, |B|)
            # argmax under (cos desc, benchmark id asc); cos rounded to 6
            # decimals for the ORDER so float32-vs-float64 engine noise
            # can't flip near-tied argmaxes against the oracle
            best = _np.lexsort(
                (_np.broadcast_to(bids_b, S.shape), -_np.round(S, 6)), axis=1
            )[:, 0]
            rows = _np.arange(len(A))
            yield _pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "max_cos": S[rows, best],
                    "nearest_benchmark_id": bids_b[best],
                }
            )

    scored = train.select(id_col, vec_col).mapInPandas(
        gen, "vec_id long, max_cos double, nearest_benchmark_id long"
    )
    return scored.select(
        "vec_id",
        F.round("max_cos", 4).alias("max_cos"),
        "nearest_benchmark_id",
        (F.col("max_cos") >= threshold).alias("contaminated"),
    )


@defquery(
    "dd8_semantic_decontamination",
    """
    WITH bench AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 20),
    train AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 20),
    scored AS (
      SELECT t.vec_id, b.vec_id AS bid,
             list_cosine_similarity(t.v, b.v) AS cos
      FROM train t CROSS JOIN bench b
    ),
    ranked AS (
      SELECT vec_id, bid, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY round(cos, 6) DESC, bid) AS rn
      FROM scored
    )
    SELECT vec_id, round(cos, 4) AS max_cos, bid AS nearest_benchmark_id,
           cos >= 0.45 AS contaminated
    FROM ranked WHERE rn = 1 ORDER BY vec_id
    """,
    doc="semantic train/eval decontamination: max-cosine of every training "
        "embedding vs the benchmark set (broadcast BLAS pass, no shuffle), "
        "flagging paraphrase-level leakage the 13-gram rule (dd6) misses.",
)
def dd8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 20)
    train = emb.filter(F.col("vec_id") >= 20)
    return semantic_decontaminate(train, bench, threshold=0.45).orderBy("vec_id")


# ---------------------------------------------------------------------------
# exact-substring duplicate spans (suffix-array dedup, approximated)
# ---------------------------------------------------------------------------


def substring_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 40,
    stride: int = 10,
) -> DataFrame:
    """Cross-document exact-substring duplicate-span detection — the
    distributed approximation of suffix-array dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better": remove any
    substring of >= 50 tokens that appears verbatim more than once in the
    corpus). The reference ships the hash primitives this composes
    (function_definitions.py:3059-3101 MD5/cityHash64 family).

    Instead of a global suffix array (inherently sequential, memory-bound),
    slide a fixed ``window`` with ``stride`` over every document, hash each
    window, and count distinct documents per window hash. A window hash seen
    in >= 2 documents is a verbatim duplicated span; the per-document
    duplicated-window ratio approximates the duplicated-character fraction
    within one stride of the suffix-array answer.

    Scale shape (100 TB): window extraction is `explode(sequence(..))` +
    `substring` + `md5` — whole-stage codegen, map-only, zero Python. Then
    exactly two shuffles: (1) hash-agg by window hash (uniform 128-bit keys,
    no skew), (2) hash-agg back by doc_id. The dup-hash set joins back as a
    plain equi-join that AQE converts to broadcast when small. Nothing is
    ever collected to the driver.
    """
    win_expr = F.expr(f"substring({text_col}, pos, {window})")
    # h as unhex(md5) BINARY (16 bytes, not the 32-char hex string): the
    # hash is identity-only — grouped, joined, counted, never shown — so
    # the bijective narrowing halves both shuffles' key bytes (guide
    # §2.3). Lazy localCheckpoint: `wins` feeds BOTH the dup-hash
    # derivation and the join-back, and without the boundary the whole
    # scan→explode→md5 window pass is embedded twice in the final plan
    # (measured 1.17 → 0.80 s at sf0.1); with it the corpus is scanned
    # and hashed once, blocks are executor-side and
    # ContextCleaner-released.
    wins = (
        docs.filter(F.length(text_col) >= window)
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.length(text_col) - (window - 1),
                    F.lit(stride),
                )
            ).alias("pos"),
            text_col,
        )
        .select(id_col, F.unhex(F.md5(win_expr)).alias("h"))
        .localCheckpoint(eager=False)
    )
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    joined = wins.join(dup.withColumn("is_dup", F.lit(1)), "h", "left")
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_windows"),
        F.count("is_dup").alias("n_dup_windows"),
        F.round(F.count("is_dup") / F.count("*"), 4).alias("dup_ratio"),
    )


@defquery(
    "dd9_substring_spans",
    """
    WITH wins AS (
      SELECT doc_id, md5(substr(text, CAST(i AS INTEGER), 40)) AS h
      FROM documents, LATERAL unnest(generate_series(1, length(text) - 39, 10)) AS t(i)
      WHERE length(text) >= 40
    ),
    dup AS (SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(d.h) AS BIGINT) AS n_dup_windows,
           round(count(d.h)::DOUBLE / count(*), 4) AS dup_ratio
    FROM wins w LEFT JOIN dup d USING (h)
    GROUP BY w.doc_id ORDER BY w.doc_id
    """,
    doc="exact-substring duplicate spans (suffix-array dedup approximated by "
        "strided 40-char window hashing): codegen window pass, two uniform "
        "shuffles, no driver state.",
)
def dd9(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return substring_dup_spans(docs).orderBy("doc_id")


def semdedup(
    emb: DataFrame,
    k: int = 8,
    threshold: float = 0.45,
    max_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int = 200_000,
    input_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then find
    cosine near-duplicates WITHIN each cluster only.

    Scale shape: clustering is the map-only Lloyd's pass from
    :func:`~chdb_spark.operators.similarity.kmeans` (no shuffle, driver
    holds (k, dim)); the quadratic step is confined to one BLAS
    ``M @ M.T`` per cluster inside ``applyInPandas`` — one shuffle keyed
    by cluster, O(n_c²) work bounded per task by the ENFORCED
    ``max_cluster_rows`` contract (a task whose cluster exceeds it raises
    with a pointer to raising k). This is the linear-cost semantic
    analogue of exact dedup: total work O(N²/k), not O(N²).

    Returns one row per duplicate pair ``(cluster, id_a, id_b)`` with
    ``id_a < id_b``; the keep-lowest-representative flag set is
    ``distinct id_b`` (a doc is flagged iff a lower-id near-duplicate
    shares its cluster — same keep-first rule as exact_dedup).
    """
    import numpy as np
    import pandas as pd

    from chdb_spark.operators.similarity import kmeans

    # return_vectors=True: the assignment pass already holds each vector,
    # so (id, vector, cluster) arrives in one map-only pass — no
    # corpus-sized join back onto the embedding table before the
    # cluster-keyed shuffle below.
    _, tagged = kmeans(
        emb,
        k=k,
        max_iters=max_iters,
        id_col=id_col,
        vec_col=vec_col,
        return_vectors=True,
        input_rows=input_rows,
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_cluster_rows:
            raise ValueError(
                f"semdedup: cluster of {n} rows exceeds max_cluster_rows="
                f"{max_cluster_rows}; raise k so clusters stay task-sized"
            )
        if n < 2:
            return pd.DataFrame({"cluster": [], "id_a": [], "id_b": []}).astype(
                {"cluster": "int64", "id_a": "int64", "id_b": "int64"}
            )
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        M = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].iloc[order]]
        )
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        S = M @ M.T
        ia, ib = np.triu_indices(n, 1)
        hit = S[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "cluster": np.full(int(hit.sum()), int(pdf["cluster"].iloc[0])),
                "id_a": ids[ia[hit]],
                "id_b": ids[ib[hit]],
            }
        )

    return tagged.groupBy("cluster").applyInPandas(
        pairs, "cluster long, id_a long, id_b long"
    )


def _dd10_oracle_sql(threshold: float = 0.45) -> str:
    """dd10 oracle: the km1 k-means SQL replay (same deterministic init and
    5 Lloyd iterations — margins re-verified in test_s2_oracle_margins)
    extended with a within-cluster pairwise cosine join and the
    keep-lowest-id flag count. All-integer output, no float columns."""
    from chdb_spark.operators.similarity import _km1_oracle_sql

    base = _km1_oracle_sql()
    # strip the km1 SELECT tail; keep the CTE chain ending at `final`
    body = base[: base.rindex("\n    SELECT CAST(cluster AS BIGINT)")]
    return (
        body
        + f""",
    tagged AS (
      SELECT f.vec_id, f.cluster, c.v FROM final f JOIN corpus c USING (vec_id)
    ),
    dpairs AS (
      SELECT x.cluster, x.vec_id AS id_a, y.vec_id AS id_b
      FROM tagged x JOIN tagged y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE list_cosine_similarity(x.v, y.v) >= {threshold}
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT id_b) AS BIGINT) AS n_flagged
    FROM dpairs GROUP BY cluster ORDER BY cluster"""
    )


@defquery(
    "dd10_semdedup",
    _dd10_oracle_sql(),
    doc="SemDeDup: deterministic k-means (k=8) partitions the embedding "
        "space, then near-duplicate pairs (cos >= 0.45) are found within "
        "clusters only — one cluster-keyed shuffle, per-task BLAS bounded "
        "by the enforced cluster-size contract; O(N^2/k) total vs the s3 "
        "block's O(N^2). Oracle = km1's SQL k-means replay + within-"
        "cluster pairwise cosine; integer-only output.",
)
def dd10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table_rows_upper_bound

    emb = table(spark, sf_dir, "embeddings")
    pairs = semdedup(
        emb, k=8, threshold=0.45,
        input_rows=table_rows_upper_bound(sf_dir, "embeddings"),
    )
    return (
        pairs.groupBy("cluster")
        .agg(
            F.count("*").alias("n_pairs"),
            F.count_distinct("id_b").alias("n_flagged"),
        )
        .orderBy("cluster")
    )


def cluster_representatives(
    comp: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Pick the keeper for each duplicate cluster: highest quality score,
    ties to the lowest id (deterministic on both engines because the
    score is the ROUNDED column both sides emit).

    The quality-aware upgrade of keep-lowest-id dedup — RefinedWeb/FineWeb
    keep the best-scoring member of each near-dup cluster, not an
    arbitrary one. Scale shape: the cluster relation is |dup docs| rows
    (not corpus-sized); one cluster-keyed window over it picks keepers.
    """
    from pyspark.sql.window import Window

    scored = comp.join(quality.select(id_col, score_col), id_col)
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .withColumn("n_docs", F.count("*").over(Window.partitionBy(cluster_col)))
        .where(F.col("_rk") == 1)
        .select(
            cluster_col,
            F.col(id_col).alias("kept_doc"),
            F.col(score_col).alias("kept_quality"),
            "n_docs",
        )
    )


@defquery(
    "dd11_cluster_representatives",
    """
    WITH RECURSIVE sh AS (
      SELECT doc_id, list_distinct([sub[1] || ' ' || sub[2] || ' ' || sub[3] for sub in
        [toks[i:i+2] for i in range(1, len(toks)-1)]]) AS shingles
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(a.shingles || b.shingles)) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.v
    ),
    comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
    q AS (
      SELECT doc_id,
        round(greatest(
          1.0
          - least(1.0, abs(len(list_filter(string_split(trim(text), ' '),
              t -> list_contains(['the','a','of','and','is','in','to'], t)))::DOUBLE
              / len(string_split(trim(text), ' ')) - 0.08) * 5)
          - least(0.5, length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
              / length(text) * 5)
          - least(0.5, length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
              / length(text) * 2), 0.0), 4) AS quality_score
      FROM documents
    ),
    sel AS (
      SELECT c.cluster_id, c.doc_id, q.quality_score,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality_score DESC, c.doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY c.cluster_id) AS n_docs
      FROM comp c JOIN q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS kept_doc, quality_score AS kept_quality,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM sel WHERE rk = 1 ORDER BY cluster_id
    """,
    doc="quality-aware dup-cluster representative selection (RefinedWeb/"
        "FineWeb keep-best rule): near-dup pairs → connected components → "
        "per-cluster argmax of the rounded Gopher/C4 quality score, ties "
        "to lowest doc_id. The window runs over the |dup docs| cluster "
        "relation, never the corpus. Oracle replays components (recursive "
        "CTE) + the identical score formula.",
)
def dd11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators.text import quality_features

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(docs, threshold=0.8)
    comp = connected_components(pairs)
    q = quality_features(docs)
    return cluster_representatives(comp, q).orderBy("cluster_id")


# ---------------------------------------------------------------------------
# dd14 — incremental dedup: a new batch against a PERSISTED corpus index
# ---------------------------------------------------------------------------


def minhash_index_build_if_needed(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 128,
    bands: int = 32,
    force: bool = False,
) -> bool:
    """Persist the corpus's MinHash-LSH dedup index — build once, dedup
    every future batch against it (the daily-crawl contract: a 100 TB
    corpus's shingle+signature pass is paid ONCE, not once per batch).

    Layout: ``<path>/bands`` = (band_idx, band_hash, doc_id) probe table,
    repartitioned on band_hash so one corpus band bucket is one
    row-group neighborhood; ``<path>/features`` = (doc_id, hs) exact-
    verification arrays. Staleness check = the IVF manifest recipe
    (params + row count + id sum + bit_xor(xxhash64(id)) — ONE
    column-pruned aggregate; the text column is never read by the
    check). Atomic tempdir+rename swap on local paths; object-store
    paths refuse in-place rebuilds, same contract as ivf_index_build.
    Returns True when a (re)build happened.
    """
    import json
    import os
    import shutil
    import uuid

    spark = corpus.sparkSession
    fp = corpus.agg(
        F.count(id_col).alias("n"),
        F.sum(id_col).alias("s"),
        F.expr(f"bit_xor(xxhash64({id_col}))").alias("x"),
    ).collect()[0]
    want = {
        "v": 1,
        "n": n,
        "k": k,
        "bands": bands,
        "id_col": id_col,
        "text_col": text_col,
        "n_rows": int(fp["n"]),
        "id_sum": int(fp["s"] or 0),
        "id_hash_xor": int(fp["x"] or 0),
    }
    mf = os.path.join(path, "_MANIFEST.json")
    if not force and "://" not in path and os.path.exists(mf):
        try:
            with open(mf) as f:
                have = json.load(f)
            if have == want and os.path.isdir(os.path.join(path, "bands")):
                return False
        except (ValueError, OSError):
            pass  # unreadable manifest → rebuild
    if "://" in path:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            raise ValueError(
                f"minhash_index_build_if_needed: {path!r} exists and object-"
                "store paths cannot be swapped atomically — build into a "
                "fresh versioned path and flip a pointer instead"
            )
    feats = doc_features(
        corpus, id_col, text_col, n=n, k=k, bands=bands, with_simhash=False
    ).localCheckpoint(eager=True)
    target = path if "://" in path else f"{path}__build_{uuid.uuid4().hex[:8]}"
    feats.select("doc_id", "hs").write.mode("overwrite").parquet(
        os.path.join(target, "features")
    )
    (
        feats.select(
            "doc_id", F.posexplode("band_hashes").alias("band_idx", "band_hash")
        )
        .repartition("band_hash")
        .write.mode("overwrite")
        .parquet(os.path.join(target, "bands"))
    )
    with open(os.path.join(target, "_MANIFEST.json"), "w") as f:
        json.dump(want, f)  # manifest last: partial build never reads valid
    if target != path:
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(target, path)
    return True


def dedup_against_index(
    batch: DataFrame,
    index_path: str,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Near-dup matches of a NEW batch against the persisted corpus index:
    (doc_new, doc_corpus, jaccard ≥ threshold).

    Scale shape: the batch (a day's crawl — orders of magnitude below the
    corpus) takes ONE map-only feature pass; its exploded band keys join
    the index's band table (16-byte keys × bands per corpus doc, ≪ the
    corpus text, and never recomputed); exact verification joins only the
    candidate set against the two feature tables. Nothing rescans or
    re-shuffles corpus text. Upgrade path: store ``bands`` bucketBy(
    band_hash) in a catalog table and the probe join shuffles ONLY the
    batch side.
    """
    spark = batch.sparkSession
    feats_new = doc_features(
        batch, id_col, text_col, n=n, k=k, bands=bands, with_simhash=False
    ).localCheckpoint(eager=True)
    new_bands = feats_new.select(
        "doc_id", F.posexplode("band_hashes").alias("band_idx", "band_hash")
    )
    idx_bands = spark.read.parquet(f"{index_path}/bands")
    cand = (
        new_bands.alias("nb")
        .join(idx_bands.alias("cb"), ["band_idx", "band_hash"])
        .select(
            F.col("nb.doc_id").alias("doc_new"),
            F.col("cb.doc_id").alias("doc_corpus"),
        )
        .distinct()
    )
    fa = feats_new.select(F.col("doc_id").alias("doc_new"), F.col("hs").alias("hs_a"))
    fb = spark.read.parquet(f"{index_path}/features").select(
        F.col("doc_id").alias("doc_corpus"), F.col("hs").alias("hs_b")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cand.join(fa, "doc_new")
        .join(fb, "doc_corpus")
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_new", "doc_corpus", F.round("jaccard", 4).alias("jaccard"))
    )


@defquery(
    "dd14_incremental_dedup",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct([sub[1] || ' ' || sub[2] || ' ' || sub[3] for sub in
        [toks[i:i+2] for i in range(1, len(toks)-1)]]) AS shingles
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    )
    SELECT a.doc_id AS doc_new, b.doc_id AS doc_corpus,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(a.shingles || b.shingles)), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(a.shingles || b.shingles)) >= 0.8
    ORDER BY doc_new, doc_corpus
    """,
    doc="incremental near-dup dedup: the 10% 'new batch' (doc_id%10=7) "
        "checked against the persisted MinHash-LSH index of the other 90% "
        "— build-once/probe-many, the daily-crawl dedup contract. The "
        "corpus feature pass is amortized behind a fingerprinted manifest "
        "(IVF recipe); each batch pays one map-only feature pass over "
        "ITSELF plus a band-key join. Oracle = brute-force cross-set "
        "Jaccard at the same threshold.",
)
def dd14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir

    docs = table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 7)
    batch = docs.where(F.col("doc_id") % 10 == 7)
    idx = scratch_dir("mhidx", sf_dir)
    minhash_index_build_if_needed(corpus, idx)
    return dedup_against_index(batch, idx, threshold=0.8).orderBy(
        "doc_new", "doc_corpus"
    )
