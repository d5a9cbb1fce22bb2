"""Similarity search over embedding columns — brute-force kNN + LSH-bucketed ANN.

The reference ships vector math as first-class SQL functions
(function_definitions.py:9444-9542: cosineDistance, dotProduct, L2Distance,
L2Normalize) and demos vector search in SQL (examples/chDB_vector_search.ipynb).
Here the same expressions (chdb_spark.functions.vector) power distributed
search pipelines.

Scale design:
* Brute-force kNN: queries are BROADCAST (a query set is small by
  definition); each executor scans its partition of the corpus computing
  cosine via zip_with/aggregate in codegen — a 100 TB corpus streams at scan
  speed, no N^2 shuffle. Top-k per query via window over (query, score) —
  shuffle carries only (query_id, vec_id, score) triples.
* ANN via random-hyperplane LSH: sign-bit bucket key computed per row (pure
  Column math, hyperplanes derived deterministically from xxhash64 — no RNG
  state to ship); candidates are bucket-mates only. Approximate by design →
  no SQL oracle; tests measure recall vs brute force instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chdb_spark.queries import defquery, table


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a, b) -> F.Column:
    """Generic cosine for unknown dims (HOF-based — interpreted, cool path)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


# Hot-path variants: Spark does not codegen higher-order-function lambdas, so
# for a known dimensionality we unroll element_at arithmetic — plain
# expressions that whole-stage-codegen compiles. ~10-40x faster per pair.


def dot_unrolled(a, b, dim: int) -> F.Column:
    out = F.element_at(a, 1).cast("double") * F.element_at(b, 1).cast("double")
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return out


def norm_unrolled(a, dim: int) -> F.Column:
    out = F.element_at(a, 1).cast("double") * F.element_at(a, 1).cast("double")
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i).cast("double") * F.element_at(a, i).cast("double")
    return F.sqrt(out)


def dot_literal(a, vec: list[float], dim: int) -> F.Column:
    """Dot of an array column with a driver-side constant vector — the
    multipliers constant-fold into the generated code."""
    out = F.element_at(a, 1).cast("double") * float(vec[0])
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i).cast("double") * float(vec[i - 1])
    return out


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_label_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    broadcast(query matrix) x Arrow-batched corpus scan: each batch computes
    one BLAS product A_batch @ Q.T and keeps only its LOCAL top-k rows per
    query (a monotone selection — the global top-k under (cos desc, id asc)
    is always a subset of the union of per-batch top-ks under the same
    order), then one tiny window pass ranks the ≤ k·num_batches·|Q|
    candidates globally. The full N x |Q| score matrix never materializes
    as rows; shuffle carries only candidates. The expression-tree scoring
    (dot_unrolled) overflows janino's 64KB method limit at dim 64 and fell
    back to interpreted eval — this path replaces it (measured 2.1s → ~0.6s
    at sf0.1).

    Scale contract: |queries| must fit broadcast (matrix of |Q| x dim
    float64); corpus is unbounded.

    ``exclude_label_col``: when set, candidate pairs whose label equals the
    query's label are masked out BEFORE the top-k selection — hard-negative
    mining for contrastive training (nearest cross-class neighbors). The
    masking happens inside the same BLAS pass, so the local-top-k
    monotonicity argument is unchanged on the filtered score matrix.
    """
    import numpy as np

    spark = corpus.sparkSession
    label = exclude_label_col
    qcols = [id_col, vec_col] + ([label] if label else [])
    qrows = queries.select(*qcols).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    # no dtype coercion: labels may be strings/categoricals; numpy object
    # broadcasting handles == elementwise (None labels match only None)
    qlabels = np.asarray([r[2] for r in qrows]) if label else None
    bc = spark.sparkContext.broadcast((qids, Q, qlabels))

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        qids_b, Qb, qlabels_b = bc.value
        nq = len(qids_b)
        for pdf in batches:
            if not len(pdf):
                continue
            A = _np.stack([_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]])
            A /= _np.linalg.norm(A, axis=1, keepdims=True)
            S = A @ Qb.T  # (batch, nq)
            nids = pdf[id_col].to_numpy()
            S[nids[:, None] == qids_b[None, :]] = -_np.inf  # exclude self
            if qlabels_b is not None:
                clabels = pdf[label].to_numpy()
                S[clabels[:, None] == qlabels_b[None, :]] = -_np.inf
            # per-query local top-k under the EXACT global order
            # (cos desc, id asc) — makes the local selection monotone, so
            # the global top-k is provably inside the candidate union
            qs, ns, cs = [], [], []
            for j in range(nq):
                order = _np.lexsort((nids, -S[:, j]))
                order = order[_np.isfinite(S[order, j])][:k]
                qs.append(_np.full(order.size, qids_b[j]))
                ns.append(nids[order])
                cs.append(S[order, j])
            yield _pd.DataFrame(
                {
                    "query_id": _np.concatenate(qs),
                    "neighbor_id": _np.concatenate(ns),
                    "cos": _np.concatenate(cs),
                }
            )

    from chdb_spark.operators import _repartition_feature_pass

    ccols = [id_col, vec_col] + ([label] if label else [])
    sel = _repartition_feature_pass(corpus.select(*ccols))
    scored = sel.mapInPandas(gen, "query_id long, neighbor_id long, cos double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
    )


def hyperplane_bits(vec_col, n_planes: int, dim: int) -> F.Column:
    """LSH bucket key: sign bits of <v, h_p> for deterministic pseudo-random
    hyperplanes h_p[i] = centered xxhash64(p||i) — reproducible on any
    cluster with zero driver state, computed entirely in codegen."""

    def plane_dot(p):
        # component i of plane p: hash→[-0.5,0.5); dot with vector
        return F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x.cast("double")
                * (
                    (F.pmod(F.xxhash64(F.concat_ws("_", F.lit(p), i.cast("string"))), F.lit(10007)) / 10007.0)
                    - 0.5
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bits = [F.when(plane_dot(p) >= 0, F.lit(1)).otherwise(F.lit(0)) for p in range(n_planes)]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


def knn_ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate kNN: score only corpus vectors in the query's LSH bucket.

    2^n_planes buckets; shuffle keyed by bucket. Recall measured in tests
    (multi-probe = widen by also matching buckets at Hamming distance 1)."""
    bkey = hyperplane_bits(F.col(vec_col), n_planes, dim)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), bkey.alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), bkey.alias("qbucket"))
    # multi-probe: query also probes buckets differing in exactly one bit
    probes = q.select(
        "query_id",
        "q_vec",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            )
        ).alias("bucket"),
    )
    scored = (
        probes.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
    )


def _dim_of(df: DataFrame, vec_col: str) -> int:
    return len(df.select(vec_col).first()[0])


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    out_col: str,
    id_col: str = "neighbor_id",
) -> DataFrame:
    """Assign each row to its nearest centroid (argmax cosine).

    Broadcast nested-loop (corpus x C centroids) scored with ONE small
    unrolled dot expression, then ``max_by`` per row id. Inlining C
    constant-vector dots into a single projection instead blows janino's
    64KB method limit → permanent interpreted fallback, ~100x slower.
    The groupBy's partial aggregation collapses the C-fold expansion back
    to one row per id inside each partition before any shuffle."""
    dim = _dim_of(centroids, "c_vec")
    cents = F.broadcast(
        centroids.select(
            "c_id", "c_vec", norm_unrolled(F.col("c_vec"), dim).alias("_cn")
        )
    )
    other_cols = [c for c in corpus.columns if c != id_col]
    paired = (
        corpus.withColumn("_vn", norm_unrolled(F.col(vec_col), dim))
        .crossJoin(cents)
        .withColumn(
            "_csim",
            dot_unrolled(F.col(vec_col), F.col("c_vec"), dim) / (F.col("_vn") * F.col("_cn")),
        )
    )
    return paired.groupBy(id_col).agg(
        F.max_by("c_id", F.col("_csim")).alias(out_col),
        *[F.first(c).alias(c) for c in other_cols if c not in ("c_id", "c_vec", "_cn", "_vn", "_csim")],
    )


def _farthest_point_init(S: np.ndarray, k: int) -> np.ndarray:
    """Deterministic farthest-point (k-means++ without RNG) init over a
    sample matrix: start at row 0, greedily add the point with max distance
    to the chosen set. Shared by ``kmeans`` and ``train_ivf_centroids`` so
    both replay identically in their SQL oracles."""
    cents = [S[0]]
    d2 = ((S - S[0]) ** 2).sum(axis=1)
    for _ in range(1, min(k, len(S))):
        nxt = int(np.argmax(d2))
        cents.append(S[nxt])
        d2 = np.minimum(d2, ((S - S[nxt]) ** 2).sum(axis=1))
    return np.stack(cents)


def _lloyd_numpy(X: np.ndarray, C: np.ndarray, iters: int) -> np.ndarray:
    """Fixed-count Lloyd iterations on an in-memory matrix: argmin euclidean
    (ties → lowest cell id, numpy argmin), mean update, empty cells keep
    their centroid. Exactly the semantics the SQL oracle replays."""
    C = C.copy()
    for _ in range(iters):
        d = (X**2).sum(1)[:, None] - 2 * X @ C.T + (C**2).sum(1)[None, :]
        cell = np.argmin(d, axis=1)
        for j in range(C.shape[0]):
            members = X[cell == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    iters: int = 3,
    sample_n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse-quantizer training for IVF: k-means on a BOUNDED deterministic
    sample (the ``sample_n`` lowest-id vectors), fit driver-side.

    This is the standard IVF shape (quantizers train on a sample, not the
    corpus): O(sample x k) work on a (sample_n, dim) matrix, so the collect
    is bounded by contract. The distributed ``kmeans`` above is the
    corpus-scale clustering path; the quantizer only needs a sample that
    covers the density, and training on it driver-side costs zero Spark
    jobs per iteration. Fixed ``iters`` (no early stop) keeps the run
    replayable in the SQL oracle.
    """
    sample_n = sample_n or max(8 * n_centroids, 64)
    rows = corpus.orderBy(id_col).limit(sample_n).select(vec_col).collect()
    S = np.array([list(r[0]) for r in rows], dtype=np.float64)
    return _lloyd_numpy(S, _farthest_point_init(S, n_centroids), iters)


# Cost-based small-corpus switch for the iterative trainers (the
# pagerank/triangle_stats pattern): below this many vectors, max_iters
# Spark jobs (broadcast + mapInPandas collect each) cost more than the
# whole computation, and the identical deterministic update runs
# driver-side on the once-pulled matrix. Above it, the map-only partials
# iteration is the shape that scales. Conf 0 forces distributed.
SMALL_CORPUS_ROWS_CONF = "spark.chdb_spark.similarity.smallCorpusRows"
SMALL_CORPUS_ROWS_DEFAULT = 65536


def _small_corpus_threshold(df: DataFrame, override: int | None) -> int:
    if override is not None:
        return int(override)
    try:
        return int(
            df.sparkSession.conf.get(
                SMALL_CORPUS_ROWS_CONF, str(SMALL_CORPUS_ROWS_DEFAULT)
            )
        )
    except Exception:
        return SMALL_CORPUS_ROWS_DEFAULT


def kmeans(
    corpus: DataFrame,
    k: int = 16,
    max_iters: int = 10,
    tol: float = 1e-4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_vectors: bool = False,
    input_rows: int | None = None,
    small_corpus_rows: int | None = None,
):
    """Distributed Lloyd's k-means over an embedding column.

    Scale shape: each iteration is ONE map-only pass — every Arrow batch
    computes nearest-centroid assignments with a BLAS product and emits at
    most k partial rows (per-cell vector sum + count), so the driver
    collects k × num_batches tiny rows per iteration regardless of corpus
    size; centroid update happens driver-side on a (k, dim) matrix. No
    shuffle at all. Deterministic: farthest-point init on the lowest-id
    sample, fixed iteration order.

    Returns ``(centroids DataFrame (c_id, c_vec), assignments DataFrame
    (id_col, cluster))``. With ``return_vectors=True`` the assignments
    also carry ``vec_col`` — the final assignment pass already holds the
    vectors, so consumers that need (id, vector, cluster) together (e.g.
    SemDeDup's per-cluster pair scan) avoid a corpus-sized join back onto
    the embedding table.

    ``input_rows``: source-statistics upper bound on the corpus size
    (parquet footer row counts / catalog stats — see
    queries.table_rows_upper_bound). When it is ≤ the small-corpus
    threshold (``spark.chdb_spark.similarity.smallCorpusRows``, default
    64 Ki), the whole run is ONE pull job plus driver-side numpy: the
    same deterministic init, the same argmin/tie rule (one shared
    assignment kernel), the same mean update and tol check. Assignment
    robustness to float summation-order differences between the lanes is
    the documented oracle contract (margins dwarf rounding noise —
    test_s2_oracle_margins).
    """
    spark = corpus.sparkSession
    dim = _dim_of(corpus, vec_col)

    thr = _small_corpus_threshold(corpus, small_corpus_rows)
    if thr > 0 and input_rows is not None and 0 < input_rows <= thr:
        rows = corpus.select(id_col, vec_col).collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = np.array([list(rows[i][1]) for i in order], dtype=np.float64)
        S = X[: max(k * 8, 64)]
        C = _farthest_point_init(S, k)
        for _ in range(max_iters):
            d = (X**2).sum(1)[:, None] - 2 * X @ C.T + (C**2).sum(1)[None, :]
            cell = np.argmin(d, axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, cell, X)
            counts = np.bincount(cell, minlength=C.shape[0])
            newC = C.copy()
            nz = counts > 0
            newC[nz] = sums[nz] / counts[nz][:, None]
            shift = float(np.abs(newC - C).max())
            C = newC
            if shift < tol:
                break
        d = (X**2).sum(1)[:, None] - 2 * X @ C.T + (C**2).sum(1)[None, :]
        cell = np.argmin(d, axis=1).astype(np.int64)
        if return_vectors:
            vec_ddl = corpus.schema[vec_col].dataType.simpleString()
            assignments = spark.createDataFrame(
                [
                    (int(ids[i]), int(cell[i]), [float(x) for x in X[i]])
                    for i in range(len(ids))
                ],
                f"{id_col} long, cluster long, {vec_col} {vec_ddl}",
            )
        else:
            assignments = spark.createDataFrame(
                [(int(ids[i]), int(cell[i])) for i in range(len(ids))],
                f"{id_col} long, cluster long",
            )
        centroids = spark.createDataFrame(
            [(int(i), [float(x) for x in C[i]]) for i in range(C.shape[0])],
            "c_id long, c_vec array<double>",
        )
        return centroids, assignments

    sample_rows = (
        corpus.orderBy(id_col).limit(max(k * 8, 64)).select(vec_col).collect()
    )
    S = np.array([list(r[0]) for r in sample_rows], dtype=np.float64)
    C = _farthest_point_init(S, k)

    from chdb_spark.operators import _repartition_feature_pass

    sel = _repartition_feature_pass(corpus.select(id_col, vec_col))
    sel = sel.persist()
    sel.count()

    try:
        for _ in range(max_iters):
            bc = spark.sparkContext.broadcast(C)

            def partials(batches):
                Cb = bc.value
                kk = Cb.shape[0]
                for pdf in batches:
                    if not len(pdf):
                        continue
                    A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                    # nearest centroid by euclidean distance: argmin ||a-c||^2
                    d = (A**2).sum(1)[:, None] - 2 * A @ Cb.T + (Cb**2).sum(1)[None, :]
                    cell = np.argmin(d, axis=1)
                    sums = np.zeros((kk, A.shape[1]))
                    np.add.at(sums, cell, A)
                    counts = np.bincount(cell, minlength=kk)
                    nz = counts > 0
                    yield pd.DataFrame(
                        {
                            "cell": np.arange(kk)[nz],
                            "vsum": list(sums[nz]),
                            "cnt": counts[nz],
                        }
                    )

            rows = sel.mapInPandas(
                partials, "cell int, vsum array<double>, cnt long"
            ).collect()
            sums = np.zeros_like(C)
            counts = np.zeros(C.shape[0], dtype=np.int64)
            for r in rows:
                sums[r.cell] += np.asarray(r.vsum)
                counts[r.cell] += r.cnt
            newC = C.copy()
            nz = counts > 0
            newC[nz] = sums[nz] / counts[nz][:, None]
            shift = float(np.abs(newC - C).max())
            C = newC
            bc.destroy()
            if shift < tol:
                break

        bc2 = spark.sparkContext.broadcast(C)

        def assign(batches):
            Cb = bc2.value
            for pdf in batches:
                if not len(pdf):
                    continue
                A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                d = (A**2).sum(1)[:, None] - 2 * A @ Cb.T + (Cb**2).sum(1)[None, :]
                out = {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": np.argmin(d, axis=1).astype(np.int64),
                }
                if return_vectors:
                    out[vec_col] = pdf[vec_col]
                yield pd.DataFrame(out)

        assign_schema = f"{id_col} long, cluster long"
        if return_vectors:
            vec_ddl = corpus.schema[vec_col].dataType.simpleString()
            assign_schema += f", {vec_col} {vec_ddl}"
        assignments = sel.mapInPandas(assign, assign_schema)
        centroids = spark.createDataFrame(
            [(int(i), [float(x) for x in C[i]]) for i in range(C.shape[0])],
            "c_id long, c_vec array<double>",
        )
        return centroids, assignments
    finally:
        sel.unpersist()


# Shared IVF kernels: the per-call path (knn_ivf) and the persisted index
# (ivf_index_build/ivf_index_search) must stay bit-identical — one copy of
# each kernel is the guarantee.
_ASSIGN_SCHEMA = "neighbor_id long, c_vec array<float>, cell long"
_KNN_RESULT_SCHEMA = "query_id long, neighbor_id long, cos double, rank int"


def _cell_assign_fn(bc, id_col: str, vec_col: str):
    """mapInPandas closure: one BLAS product per Arrow batch assigns each
    corpus vector to its nearest (max cosine) centroid cell. ``bc``
    broadcasts the row-normalized centroid matrix."""

    def assign(batches):
        Cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "c_vec": pdf[vec_col],
                    "cell": np.argmax(A @ Cb.T, axis=1).astype(np.int64),
                }
            )

    return assign


def _probe_plan(spark, queries, Cn, nprobe, id_col, vec_col):
    """Driver-side probe pick: queries are small by contract, so each
    query's ``nprobe`` nearest cells come from one numpy pass. Returns
    ``(probes_df, probed_cells)``; ``(None, [])`` when there are no
    query rows (callers return an empty result instead of crashing in
    ``np.linalg.norm(axis=1)`` on a 0-d array)."""
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return None, []
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    order = np.argsort(-(Qn @ Cn.T), axis=1, kind="stable")[:, :nprobe]
    probe_rows = [
        (int(q_ids[i]), [float(x) for x in Q[i]], int(j))
        for i in range(len(q_ids))
        for j in order[i]
    ]
    probes = spark.createDataFrame(
        probe_rows, "query_id long, q_vec array<double>, cell long"
    )
    return probes, sorted({int(j) for row in order for j in row})


def _batched_cos():
    # built lazily: pandas_udf needs an active SparkSession to resolve the
    # return type, so decorating at import time breaks sessionless imports
    @F.pandas_udf("double")
    def cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        A = np.stack([np.asarray(v, dtype=np.float64) for v in qv])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in cv])
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return cos


def _score_and_rank(probes: DataFrame, cells: DataFrame, k: int) -> DataFrame:
    """Broadcast the probe list onto the candidate cells, score with the
    vectorized cosine, keep top-k per query (cos desc, id asc tie-break)."""
    scored = (
        F.broadcast(probes)
        .join(cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _batched_cos()(F.col("q_vec"), F.col("c_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 3,
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into ``n_centroids`` cells,
    probe the ``nprobe`` nearest cells per query, brute-force inside.

    Centroids come from ``train_ivf_centroids`` — deterministic k-means
    (farthest-point init + ``kmeans_iters`` Lloyd steps) on the bounded
    lowest-id sample, which balances cell populations (the lowest-id
    placeholder this replaces left cell skew: one hot cell degenerates
    toward a scan at scale). Kernels are numpy over Arrow batches: the
    centroid matrix (C x dim) broadcasts to executors, cell assignment is
    one BLAS product per batch (mapInPandas — distributed, no shuffle), and
    candidate scoring is a vectorized pandas_udf over the probe join. The
    probe join shuffles only (query, cell) pairs; each cell scans
    ≈ corpus/C rows.
    """
    spark = corpus.sparkSession
    C = train_ivf_centroids(
        corpus, n_centroids, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
    )
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(Cn)
    c = corpus.select(id_col, vec_col).mapInPandas(
        _cell_assign_fn(bc, id_col, vec_col), _ASSIGN_SCHEMA
    )
    probes, _ = _probe_plan(spark, queries, Cn, nprobe, id_col, vec_col)
    if probes is None:
        return spark.createDataFrame([], _KNN_RESULT_SCHEMA)
    return _score_and_rank(probes, c, k)


def cosine_neardup_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int = 200_000,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold over a bounded vector block.

    The block's matrix (N x dim float64, unit-normalized) is broadcast to
    executors; each Arrow batch of the same block computes one BLAS matrix
    product A_batch @ M.T and emits only the (a < b, sim >= threshold)
    pairs. 2000x64 runs in milliseconds of compute vs ~40 us/pair for the
    expression-tree form (which overflows janino codegen at dim 64 and
    falls back to interpreted evaluation).

    Scale contract: the BLOCK must fit in executor memory (here ≤ a few
    hundred MB); the unbounded-corpus path tiles blocks via IVF cells
    (``knn_ivf``) so each cell's all-pairs stays bounded. The contract is
    ENFORCED, not assumed: a cheap count rejects blocks past
    ``max_block_rows`` (200k x 64 doubles ≈ 100 MB broadcast) with a
    pointer to the IVF path, so an unbounded corpus can never silently
    stream through the driver. The block itself moves via Arrow
    (``toPandas``), not row-by-row collect.
    """
    import numpy as np

    spark = emb.sparkSession
    block = emb.select(id_col, vec_col)
    n = block.count()
    if n > max_block_rows:
        raise ValueError(
            f"cosine_neardup_pairs_blocked: block has {n} rows > "
            f"max_block_rows={max_block_rows}; tile the corpus with knn_ivf "
            "cells (or raise the bound if executor memory allows)"
        )
    pdf_block = block.toPandas()  # Arrow batch transfer, zero row-at-a-time cost
    ids = pdf_block[id_col].to_numpy(dtype=np.int64)
    M = np.array([list(v) for v in pdf_block[vec_col]], dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, M))

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        ids_b, Mb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = _np.stack([_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]])
            A /= _np.linalg.norm(A, axis=1, keepdims=True)
            S = A @ Mb.T
            ai = pdf[id_col].to_numpy()
            mask = (S >= threshold) & (ai[:, None] < ids_b[None, :])
            r, c = _np.nonzero(mask)
            yield _pd.DataFrame(
                {"vec_a": ai[r], "vec_b": ids_b[c], "cos": S[r, c]}
            )

    out = emb.select(id_col, vec_col).mapInPandas(
        gen, "vec_a long, vec_b long, cos double"
    )
    return out.select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))


# ---------------------------------------------------------------------------
# headline queries
# ---------------------------------------------------------------------------


@defquery(
    "s1_knn_bruteforce",
    """
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.embedding, c.embedding) AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 10
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 4) AS cos, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    doc="exact top-5 cosine kNN for 10 query vectors; broadcast queries x corpus scan.",
)
def s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return knn_bruteforce(emb, emb.filter(F.col("vec_id") < 10), k=5).orderBy("query_id", "rank")


@defquery(
    "hn1_hard_negatives",
    """
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.embedding, c.embedding) AS cos
      FROM embeddings q JOIN embeddings c
        ON q.vec_id != c.vec_id AND q.label != c.label
      WHERE q.vec_id < 20
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(CAST(cos AS DOUBLE), 4) AS cos, rank
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    doc="hard-negative mining for contrastive training: the 3 nearest "
        "cross-class neighbors per anchor — same broadcast-queries x "
        "BLAS-batched corpus scan as s1, with same-label pairs masked "
        "inside the score matrix before the monotone local top-k; the "
        "oracle is the brute-force cross-label definition.",
)
def hn1(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return knn_bruteforce(
        emb,
        emb.filter(F.col("vec_id") < 20),
        k=3,
        exclude_label_col="label",
    ).orderBy("query_id", "rank")


def _s2_oracle_sql(
    k: int = 32,
    iters: int = 3,
    dim: int = 64,
    sample_n: int = 256,
    nprobe: int = 4,
    topk: int = 5,
    nq: int = 10,
) -> str:
    """SQL replay of the deterministic IVF that s2 executes: k-means
    centroids trained on the lowest-``sample_n``-id vectors
    (farthest-point init + ``iters`` fixed Lloyd steps, the
    ``train_ivf_centroids`` run), then max-cosine cell assignment
    (ties → lowest c_id, matching numpy argmax), ``nprobe`` best cells per
    query, brute force within probed cells. Valid because every step is
    deterministic with no early stop, and assignment/probe margins are
    asserted above rounding noise in tests/test_operators.py
    (test_s2_oracle_margins). Generated like ``_km1_oracle_sql``: one CTE
    pair per init pick, one CTE chain per Lloyd iteration (over the SAMPLE
    only — quantizer training is sample-bounded by design)."""
    parts = [
        "WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""sample AS (
          SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
          FROM corpus ORDER BY vec_id LIMIT {sample_n}
        )""",
        "i0 AS (SELECT v FROM sample WHERE rn = 1)",
        "d0 AS (SELECT rn, v, list_distance(v, (SELECT v FROM i0))**2 AS d2 FROM sample)",
    ]
    for j in range(1, k):
        parts.append(f"i{j} AS MATERIALIZED (SELECT v FROM d{j-1} ORDER BY d2 DESC, rn LIMIT 1)")
        if j < k - 1:
            parts.append(
                f"d{j} AS (SELECT rn, v, least(d2, "
                f"list_distance(v, (SELECT v FROM i{j}))**2) AS d2 FROM d{j-1})"
            )
    cents0 = " UNION ALL ".join(f"SELECT {j} AS c_id, v FROM i{j}" for j in range(k))
    parts.append(f"cents0 AS ({cents0})")
    for t in range(1, iters + 1):
        parts.append(f"""a{t} AS (
          SELECT s.rn, s.v,
                 (SELECT c.c_id FROM cents{t-1} c
                  ORDER BY list_distance(s.v, c.v) ASC, c.c_id LIMIT 1) AS cell
          FROM sample s
        )""")
        parts.append(f"""m{t} AS (
          SELECT cell AS c_id, gs AS idx, avg(v[gs]) AS av
          FROM a{t}, generate_series(1, {dim}) t(gs)
          GROUP BY cell, gs
        )""")
        parts.append(
            f"n{t} AS (SELECT c_id, list(av ORDER BY idx) AS v FROM m{t} GROUP BY c_id)"
        )
        parts.append(f"""cents{t} AS (
          SELECT c.c_id, COALESCE(n.v, c.v) AS v
          FROM cents{t-1} c LEFT JOIN n{t} n USING (c_id)
        )""")
    parts.append(f"""assigned AS (
      SELECT e.vec_id AS neighbor_id, e.v AS c_vec,
             (SELECT c.c_id FROM cents{iters} c
              ORDER BY list_cosine_similarity(e.v, c.v) DESC, c.c_id
              LIMIT 1) AS cell
      FROM corpus e
    )""")
    parts.append(f"""probes AS (
      SELECT q.vec_id AS query_id, q.v AS q_vec, p.c_id AS cell
      FROM corpus q, LATERAL (
        SELECT c.c_id FROM cents{iters} c
        ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.c_id
        LIMIT {nprobe}
      ) p(c_id)
      WHERE q.vec_id < {nq}
    )""")
    parts.append("""scored AS (
      SELECT p.query_id, a.neighbor_id,
             list_cosine_similarity(p.q_vec, a.c_vec) AS cos
      FROM probes p JOIN assigned a USING (cell)
      WHERE p.query_id != a.neighbor_id
    )""")
    parts.append("""ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )""")
    body = ",\n    ".join(parts)
    return (
        body
        + f"\n    SELECT query_id, neighbor_id, round(cos, 4) AS cos, rank"
        + f" FROM ranked WHERE rank <= {topk} ORDER BY query_id, rank"
    )


@defquery(
    "s2_ann_ivf",
    _s2_oracle_sql(),
    doc="ANN top-5 via IVF-flat (32 k-means cells trained on the lowest-256"
        "-id sample, nprobe=4 → ~12% scan); oracle replays the deterministic "
        "IVF in SQL (same k-means training, same probe order, brute-force "
        "within probed cells).",
)
def s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return knn_ivf(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=32, nprobe=4
    ).orderBy("query_id", "rank")


@defquery(
    "s3_embedding_neardup",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 2000 AND b.vec_id < 2000
      AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    ORDER BY vec_a, vec_b
    """,
    doc="embedding-cosine near-duplicate pairs (threshold 0.45). Exact all-pairs over a "
    "bounded window (O(n^2) by definition — the unbounded scale path is IVF-cell-blocked "
    "candidates, knn_ivf, which trades exactness for linear cost).",
)
def s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 2000)
    return cosine_neardup_pairs_blocked(emb, threshold=0.45).orderBy("vec_a", "vec_b")


def _km1_oracle_sql(k: int = 8, iters: int = 5, dim: int = 64, sample_n: int = 64) -> str:
    """SQL replay of the deterministic kmeans() run that km1 executes:
    farthest-point init on the lowest-``sample_n``-id vectors, then
    ``iters`` Lloyd iterations (argmin euclidean, ties → lowest cell id,
    matching numpy argmin; empty cells keep their centroid). Valid because
    the run is fully deterministic AND never early-stops at these SFs
    (shift stays > tol through iteration 5) and the min top1−top2
    assignment margin (5.6e-4 at sf0.01) dwarfs float summation-order
    noise. Generated, not hand-written: one CTE pair per init pick and per
    iteration."""
    parts = [
        "WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""sample AS (
          SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
          FROM corpus ORDER BY vec_id LIMIT {sample_n}
        )""",
        "i0 AS (SELECT v FROM sample WHERE rn = 1)",
        "d0 AS (SELECT rn, v, list_distance(v, (SELECT v FROM i0))**2 AS d2 FROM sample)",
    ]
    for j in range(1, k):
        parts.append(f"i{j} AS MATERIALIZED (SELECT v FROM d{j-1} ORDER BY d2 DESC, rn LIMIT 1)")
        if j < k - 1:
            parts.append(
                f"d{j} AS (SELECT rn, v, least(d2, "
                f"list_distance(v, (SELECT v FROM i{j}))**2) AS d2 FROM d{j-1})"
            )
    cents0 = " UNION ALL ".join(f"SELECT {j} AS c_id, v FROM i{j}" for j in range(k))
    parts.append(f"cents0 AS ({cents0})")
    for t in range(1, iters + 1):
        parts.append(f"""a{t} AS (
          SELECT e.vec_id, e.v,
                 (SELECT c.c_id FROM cents{t-1} c
                  ORDER BY list_distance(e.v, c.v) ASC, c.c_id LIMIT 1) AS cell
          FROM corpus e
        )""")
        parts.append(f"""m{t} AS (
          SELECT cell AS c_id, gs AS idx, avg(v[gs]) AS av
          FROM a{t}, generate_series(1, {dim}) t(gs)
          GROUP BY cell, gs
        )""")
        parts.append(
            f"n{t} AS (SELECT c_id, list(av ORDER BY idx) AS v FROM m{t} GROUP BY c_id)"
        )
        parts.append(f"""cents{t} AS (
          SELECT c.c_id, COALESCE(n.v, c.v) AS v
          FROM cents{t-1} c LEFT JOIN n{t} n USING (c_id)
        )""")
    parts.append(f"""final AS (
      SELECT e.vec_id,
             (SELECT c.c_id FROM cents{iters} c
              ORDER BY list_distance(e.v, c.v) ASC, c.c_id LIMIT 1) AS cluster
      FROM corpus e
    )""")
    body = ",\n    ".join(parts)
    return (
        body
        + "\n    SELECT CAST(cluster AS BIGINT) AS cluster, count(*) AS n"
        + " FROM final GROUP BY cluster ORDER BY cluster"
    )


@defquery(
    "km1_kmeans_clusters",
    _km1_oracle_sql(),
    doc="distributed Lloyd's k-means (k=8, deterministic farthest-point "
        "init): per-iteration map-only partial sums (<= k rows per Arrow "
        "batch collected), centroid update driver-side; returns cluster "
        "sizes. Oracle = generated SQL replay of the same deterministic "
        "init + 5 Lloyd iterations; also differentially tested against a "
        "pure-numpy reference in tests/test_operators.py.",
)
def km1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table_rows_upper_bound

    emb = table(spark, sf_dir, "embeddings")
    _, assignments = kmeans(
        emb, k=8, max_iters=5,
        input_rows=table_rows_upper_bound(sf_dir, "embeddings"),
    )
    return (
        assignments.groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization + quantized kNN
# ---------------------------------------------------------------------------


def train_quantizer(emb: DataFrame, vec_col: str = "embedding") -> tuple[list, list]:
    """Per-dimension (min, max) over the corpus — the scalar-quantization
    codebook (the IVF_SQ8 storage trick: 4x smaller vectors, integer dot
    products). posexplode → hash agg keyed by dimension index collapses
    map-side to d rows; the driver holds only the 2×d codebook (same
    bounded-state contract as the k-means centroids)."""
    dims = (
        emb.select(F.posexplode(vec_col).alias("i", "v"))
        .groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("i")
        .collect()
    )
    return [r["mn"] for r in dims], [r["mx"] for r in dims]


def quantize_expr(vec_col, mins: list, maxes: list) -> F.Column:
    """float vector → int8-range codes: floor((x-mn)*255/(mx-mn)), clamped.
    floor (not round) so both engines agree bit-for-bit — round's tie rule
    differs across engines; floor of identical doubles cannot."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    rng = F.array(
        *[F.lit(float(mx - mn_) if mx > mn_ else 1.0) for mn_, mx in zip(mins, maxes)]
    )
    return F.transform(
        vec_col,
        lambda x, i: F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    (x - F.element_at(mn, i + 1)) * 255 / F.element_at(rng, i + 1)
                ).cast("int"),
            ),
        ),
    )


def dequantize_expr(code_col, mins: list, maxes: list) -> F.Column:
    """int8 codes → reconstructed float vector: x̂_i = mn_i + code_i·st_i
    (st = range/255). Codes + the 2×d codebook are all that is stored —
    4× smaller than float32 vectors."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    st = F.array(
        *[
            F.lit((mx - mn_) / 255.0 if mx > mn_ else 1.0 / 255.0)
            for mn_, mx in zip(mins, maxes)
        ]
    )
    return F.transform(
        code_col,
        lambda c, i: F.element_at(mn, i + 1) + c * F.element_at(st, i + 1),
    )


def quantized_knn(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors by DEQUANTIZED inner product — the SQ8 ANN pattern
    (store int8 codes + a 2×d codebook; score against reconstructed
    vectors). Ranking approximates the exact float MIP to quantization
    error; ties break on neighbor id.

    Determinism: codes are exact ints, the codebook is exact min/max, and
    both engines evaluate the identical reconstruct-and-dot expression on
    identical operands — IEEE doubles agree bit-for-bit.

    Scale: quantization is a map-only transform; the query codes broadcast
    (|Q|×d ints); scoring is per-row array math; top-k is a window
    partitioned by query id."""
    mins, maxes = train_quantizer(emb, vec_col)
    q = quantize_expr(F.col(vec_col), mins, maxes)
    coded = emb.select(F.col(id_col), q.alias("code"))
    queries = coded.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("qcode")
    )
    pairs = coded.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col("query_id")
    )
    deq_a = dequantize_expr(F.col("code"), mins, maxes)
    deq_b = dequantize_expr(F.col("qcode"), mins, maxes)
    dot = F.aggregate(
        F.zip_with(deq_a, deq_b, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        pairs.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(dot, 4).alias("qdot"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id", "qdot")
        .orderBy("query_id", "rk")
    )


@defquery(
    "s4_quantized_knn",
    """
    WITH dims AS (
      SELECT CAST(i AS INTEGER) AS i,
             min(embedding[CAST(i AS INTEGER)]) AS mn,
             max(embedding[CAST(i AS INTEGER)]) AS mx
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
      GROUP BY 1
    ),
    mins AS (SELECT list(mn ORDER BY i) AS mn FROM dims),
    rngs AS (SELECT list(CASE WHEN mx > mn THEN mx - mn ELSE 1 END ORDER BY i) AS rng FROM dims),
    coded AS (
      SELECT vec_id,
             [least(255, greatest(0, CAST(floor((embedding[i] - mn[i]) * 255 / rng[i]) AS INTEGER)))
              for i in range(1, len(embedding) + 1)] AS code
      FROM embeddings, mins, rngs
    ),
    steps AS (SELECT list(CASE WHEN mx > mn THEN (mx - mn) / 255 ELSE 1.0/255 END ORDER BY i) AS st FROM dims),
    queries AS (SELECT vec_id AS query_id, code AS qcode FROM coded WHERE vec_id IN (0, 1, 2, 3, 4)),
    pairs AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_sum([(mn[i] + c.code[i] * st[i]) * (mn[i] + q.qcode[i] * st[i])
                             for i in range(1, len(c.code) + 1)]), 4) AS qdot
      FROM coded c CROSS JOIN queries q, mins, steps
      WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, qdot,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY qdot DESC, neighbor_id) AS INTEGER) AS rk
      FROM pairs
    )
    SELECT query_id, rk, neighbor_id, qdot
    FROM ranked WHERE rk <= 3 ORDER BY query_id, rk
    """,
    doc="int8 scalar-quantized kNN (SQ8 storage path): per-dim codebook "
        "from one d-key hash agg, map-only quantization, broadcast query "
        "codes, dequantized inner-product scoring (4x storage compression; "
        "ranking within quantization error of exact MIP).",
)
def s4(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return quantized_knn(emb, [0, 1, 2, 3, 4], k=3)


def random_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_dims: int = 8,
    quant: int = 1000,
) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection, exact-arithmetic form.

    Dimensionality reduction before ANN/clustering: project d-dim float
    vectors to ``out_dims`` with a ±1 matrix (Achlioptas 2003 — sign
    projections preserve pairwise distances with the same JL guarantee as
    Gaussians, public result). The sign matrix is never materialized:
    entry (j, k) is derived from a tiny LCG on the flat index, so every
    executor regenerates it locally — nothing to broadcast, map-only at
    scan speed, and the projection is reproducible across engines.

    Values are quantized to 1/quant units first so each output component
    is an exact integer dot product — summation-order-free, which makes
    the result bit-identical between Spark's partial aggregation and any
    sequential replay (the oracle). Output is tall: (id, k, proj).
    """
    k_cols = []
    for k in range(out_dims):
        sign = (
            # bigint math throughout: the LCG product overflows int32
            f"(case when (1103515245L * (cast(j as bigint) * {out_dims} + {k}) "
            f"+ 12345L) % 2147483648L < 1073741824L then 1 else -1 end)"
        )
        k_cols.append(
            F.expr(
                f"aggregate(transform({vec_col}, (x, j) -> "
                f"cast(floor(cast(x as double) * {quant} + 0.5) as bigint) * {sign}), "
                f"cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias(f"_p{k}")
        )
    wide = df.select(F.col(id_col), *k_cols)
    stack_args = ", ".join(f"{k}, _p{k}" for k in range(out_dims))
    return wide.select(
        F.col(id_col),
        F.expr(f"stack({out_dims}, {stack_args}) as (k, _pi)"),
    ).select(
        F.col(id_col),
        F.col("k").cast("int").alias("k"),
        (F.col("_pi").cast("double") / float(quant)).alias("proj"),
    )


@defquery(
    "rp1_random_projection",
    """
    WITH ex AS (
      SELECT vec_id, i - 1 AS j,
             CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS e_int
      FROM (SELECT vec_id, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ), ks AS (SELECT unnest(range(0, 8)) AS k)
    SELECT vec_id, CAST(k AS INT) AS k,
           CAST(sum(e_int * (CASE WHEN (1103515245 * (j * 8 + k) + 12345)
                                       % 2147483648 < 1073741824
                                  THEN 1 ELSE -1 END)) AS DOUBLE) / 1000.0 AS proj
    FROM ex CROSS JOIN ks
    GROUP BY vec_id, k ORDER BY vec_id, k
    """,
    doc="JL sign random projection 64→8 dims: the ±1 matrix is an LCG "
        "function of the flat index (regenerated per executor, nothing "
        "broadcast), inputs quantized to milli-units so each component is "
        "an exact integer dot product — order-free, bit-reproducible. "
        "Map-only transform/aggregate built-ins; the oracle replays the "
        "identical integer algebra via unnest + the same LCG.",
)
def rp1(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return random_project(emb).orderBy("vec_id", "k")


def standardize_dims(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_dims: int = 8,
    quant: int = 1000,
) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column.

    Two passes, both shuffle-light: (1) per-dimension moment aggregation
    over quantized integers — exact sums, so mean/std are identical
    doubles regardless of partial-agg order; at most ``n_dims`` rows come
    out, broadcast back for (2) a map-side join + per-row normalize.
    Output is tall (id, dim, z); population std (divide by n).
    """
    tall = (
        df.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "_e"))
        .where(F.col("dim") < n_dims)
        .withColumn(
            "e_int",
            F.expr(f"cast(floor(cast(_e as double) * {quant} + 0.5) as bigint)"),
        )
    )
    stats = tall.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("e_int").alias("s"),
        F.sum(F.col("e_int") * F.col("e_int")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("ss").cast("double") / F.col("n") - mean * mean
    enriched = tall.join(F.broadcast(stats), on="dim")
    return enriched.select(
        F.col(id_col),
        F.col("dim").cast("int").alias("dim"),
        F.round((F.col("e_int").cast("double") - mean) / F.sqrt(var), 6).alias("z"),
    )


@defquery(
    "nm1_standardize_dims",
    """
    WITH tall AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS e_int
      FROM (SELECT vec_id, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
      WHERE i <= 8
    ), stats AS (
      SELECT dim, count(*) AS n, sum(e_int) AS s, sum(e_int * e_int) AS ss
      FROM tall GROUP BY dim
    )
    SELECT t.vec_id, CAST(t.dim AS INT) AS dim,
           round((CAST(t.e_int AS DOUBLE) - CAST(s AS DOUBLE) / n)
                 / sqrt(CAST(ss AS DOUBLE) / n
                        - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)),
                 6) AS z
    FROM tall t JOIN stats USING (dim)
    ORDER BY vec_id, dim
    """,
    doc="per-dimension z-score standardization of embeddings (first 8 "
        "dims): moments aggregated over exact quantized integers (order-"
        "free), 8-row stats broadcast back for a map-side normalize — "
        "identical IEEE ops both sides make every z bit-reproducible; "
        "population std, tall output.",
)
def nm1(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return standardize_dims(emb).orderBy("vec_id", "dim")


def ivf_index_build(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 32,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _manifest: "dict | None" = None,
) -> None:
    """Persist an IVF index: build once, search many times.

    ``<path>/centroids`` holds the (cell, centroid) quantizer (C rows);
    ``<path>/cells`` holds the corpus assignment WRITTEN PARTITIONED BY
    CELL — the load-bearing choice: a later probe of ``nprobe`` cells
    becomes directory-level partition pruning, so the search reads
    ~nprobe/n_centroids of the index bytes from disk instead of scanning
    the corpus and re-assigning per query batch (what knn_ivf does when
    called standalone). Training is the same deterministic
    train_ivf_centroids run, so a fresh index reproduces knn_ivf exactly.

    A rebuild over an existing local index is atomic: cells/ and
    centroids/ are written to a sibling temp dir and swapped in with one
    ``os.rename``, so a crash mid-build can never leave a NEW assignment
    paired with an OLD quantizer (a searcher of such a mix returns wrong
    neighbors with no error). Scheme-qualified paths (s3://, hdfs://)
    have no atomic dir move, so REBUILDING one in place is refused with
    an error — use a fresh versioned path per build and flip a pointer.
    Single writer assumed either way.
    """
    import json
    import os
    import shutil
    import uuid

    spark = corpus.sparkSession
    if "://" in path:
        # a crash between the cells/ and centroids/ overwrites would leave
        # a new-assignment/old-quantizer mix that searches WRONG silently —
        # refuse the in-place rebuild instead of executing it.
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            raise ValueError(
                f"ivf_index_build: {path!r} already exists and object-store "
                "paths cannot be swapped atomically — build into a fresh "
                "versioned path and flip a pointer instead"
            )
    C = train_ivf_centroids(
        corpus, n_centroids, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
    )
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(Cn)
    assigned = corpus.select(id_col, vec_col).mapInPandas(
        _cell_assign_fn(bc, id_col, vec_col), _ASSIGN_SCHEMA
    )
    centroids = spark.createDataFrame(
        [(int(i), [float(x) for x in C[i]]) for i in range(C.shape[0])],
        "cell long, centroid array<double>",
    )
    target = path if "://" in path else f"{path}__build_{uuid.uuid4().hex[:8]}"
    try:
        assigned.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(target, "cells")
        )
        centroids.write.mode("overwrite").parquet(os.path.join(target, "centroids"))
        if _manifest is not None and "://" not in target:
            # written LAST: a partial build has no manifest → read as stale
            with open(os.path.join(target, "_MANIFEST.json"), "w") as f:
                json.dump(_manifest, f)
        if target is not path:
            shutil.rmtree(path, ignore_errors=True)
            os.rename(target, path)
    except BaseException:
        if target is not path:
            shutil.rmtree(target, ignore_errors=True)
        raise


def ivf_index_build_if_needed(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 32,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    force: bool = False,
) -> bool:
    """Build the persisted IVF index only when the existing one is stale —
    the amortization contract "build once, search many" made checkable.

    Validity = the ``_MANIFEST.json`` the build wrote matches the current
    build params AND a cheap corpus fingerprint — row count + id sum +
    ``bit_xor(xxhash64(id))``, ONE column-pruned aggregate over
    ``id_col`` (the vector column is never read by the check, which is
    the point at 100 TB). The hash-xor term catches any change to the id
    MULTISET, including compensating delete+insert pairs that preserve
    the plain sum. What an id-only fingerprint cannot see, by
    construction: changes that keep every id — in-place vector mutation
    or an id↔vector permutation — pass ``force=True`` after such a
    rewrite. The manifest lands last inside the atomic swap, so a
    partial build can never read as valid. Local paths only (object
    stores: version the path and flip a pointer).
    Returns True when a (re)build happened.
    """
    import json
    import os

    fp = corpus.agg(
        F.count(id_col).alias("n"),
        F.sum(id_col).alias("s"),
        F.expr(f"bit_xor(xxhash64({id_col}))").alias("x"),
    ).collect()[0]
    want = {
        "v": 2,
        "n_centroids": n_centroids,
        "kmeans_iters": kmeans_iters,
        "id_col": id_col,
        "vec_col": vec_col,
        "n_rows": int(fp["n"]),
        "id_sum": int(fp["s"] or 0),
        "id_hash_xor": int(fp["x"] or 0),
    }
    mf = os.path.join(path, "_MANIFEST.json")
    if not force and "://" not in path and os.path.exists(mf):
        try:
            with open(mf) as f:
                have = json.load(f)
            if have == want and os.path.isdir(os.path.join(path, "cells")):
                return False
        except (ValueError, OSError):
            pass  # unreadable manifest → rebuild
    ivf_index_build(
        corpus, path, n_centroids, kmeans_iters, id_col, vec_col, _manifest=want
    )
    return True


def ivf_index_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF index: load the tiny quantizer, pick each
    query's ``nprobe`` cells driver-side, then scan ONLY those cells'
    partitions (pruned at the file listing — `PartitionFilters` in the
    plan) and brute-force the candidates. Same output contract as
    knn_ivf: (query_id, neighbor_id, cos, rank)."""
    import os

    c_rows = spark.read.parquet(os.path.join(path, "centroids")).collect()
    c_rows.sort(key=lambda r: r.cell)
    Cn = np.array([r.centroid for r in c_rows], dtype=np.float64)
    Cn /= np.linalg.norm(Cn, axis=1, keepdims=True)

    probes, probed_cells = _probe_plan(spark, queries, Cn, nprobe, id_col, vec_col)
    if probes is None:
        return spark.createDataFrame([], _KNN_RESULT_SCHEMA)
    cells = spark.read.parquet(os.path.join(path, "cells")).where(
        F.col("cell").isin(probed_cells)  # directory-level partition pruning
    )
    return _score_and_rank(probes, cells, k)


@defquery(
    "s5_ivf_index",
    _s2_oracle_sql(),
    doc="persisted IVF index: build once (quantizer + corpus assignment "
        "written PARTITIONED BY cell), search via driver-side probe pick + "
        "directory-level partition pruning — the search reads "
        "~nprobe/n_centroids of the index bytes, no corpus re-assignment "
        "per call. Training/probing are the same deterministic runs as s2, "
        "so the SQL IVF replay oracle applies verbatim; the pruning itself "
        "is pinned by tests/test_operators.py::test_ivf_index_partition_pruning. "
        "Uses build_if_needed: the first call pays the build, later calls "
        "validate the manifest fingerprint and go straight to the pruned "
        "search — the amortized cost the operator exists to buy.",
)
def s5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir

    emb = table(spark, sf_dir, "embeddings")
    idx = scratch_dir("ivf", sf_dir)
    ivf_index_build_if_needed(emb, idx, n_centroids=32, kmeans_iters=3)
    return ivf_index_search(
        spark, idx, emb.filter(F.col("vec_id") < 10), k=5, nprobe=4
    ).orderBy("query_id", "rank")


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """recall@k of the IVF index against exact brute force, per query —
    the evaluation loop every ANN deployment needs before trusting an
    (n_centroids, nprobe) operating point.

    Scale shape: ground truth is the broadcast-queries × local-top-k
    corpus scan (knn_bruteforce — queries are small by contract, the
    corpus side never materializes the score matrix); the candidate
    run is the probed-cells path (knn_ivf). The comparison itself is a
    LEFT SEMI join on (query, neighbor) — k·|Q| rows, driver never sees
    row data."""
    ann = knn_ivf(
        corpus, queries, k=k, n_centroids=n_centroids, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    exact = knn_bruteforce(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
    n_hit = hits.groupBy("query_id").agg(F.count("*").alias("n_hit"))
    return (
        queries.select(F.col(id_col).alias("query_id"))
        .join(n_hit, "query_id", "left")
        .na.fill({"n_hit": 0})
        .select(
            "query_id",
            F.col("n_hit").cast("long").alias("n_hit"),
            F.round(F.col("n_hit") / float(k), 4).alias(f"recall_at_{k}"),
        )
        .orderBy("query_id")
    )


def _s6_oracle_sql() -> str:
    """s6 oracle: the s2 IVF SQL replay (same deterministic training,
    assignment and probing) intersected with the brute-force top-k
    definition — recall@5 per query, counted in SQL."""
    base = _s2_oracle_sql()
    body = base[: base.rindex("\n    SELECT query_id")]
    return (
        body
        + """,
    ivf AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
    bf_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.embedding, c.embedding) AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 10
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM bf_scored
      ) WHERE rank <= 5
    )
    SELECT b.query_id, CAST(count(i.neighbor_id) AS BIGINT) AS n_hit,
           round(count(i.neighbor_id) / 5.0, 4) AS recall_at_5
    FROM bf b LEFT JOIN ivf i USING (query_id, neighbor_id)
    GROUP BY b.query_id ORDER BY b.query_id"""
    )


@defquery(
    "s6_ann_recall",
    _s6_oracle_sql(),
    doc="ANN quality evaluation: recall@5 of the IVF operating point "
        "(32 cells, nprobe=4) against exact brute-force ground truth, per "
        "query — the measurement loop that justifies an ANN config before "
        "a 100 TB index build. Ground truth via the broadcast-queries "
        "BLAS scan, candidates via the probed-cells path, compared with a "
        "LEFT SEMI join; the oracle replays BOTH definitions in SQL and "
        "counts the intersection.",
)
def s6(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return ann_recall(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=32, nprobe=4
    )


def train_linear_classifier(
    df: DataFrame,
    dims: int = 8,
    iters: int = 3,
    lr: float = 0.5,
    label_threshold: int = 5,
    vec_col: str = "embedding",
    label_col: str = "label",
    input_rows: int | None = None,
    small_corpus_rows: int | None = None,
):
    """Distributed full-batch gradient descent for a linear probe over an
    embedding column (binary target ``label < label_threshold``) — the
    quality-classifier training loop (fastText/FineWeb-Edu style) run
    INSIDE the engine instead of exporting to a trainer.

    Scale shape = the kmeans pattern: each iteration is ONE map-only
    Arrow pass; every batch computes its rows' gradient contributions
    with vectorized numpy and emits a single row of ``dims`` int64
    partial sums, so the driver collects O(batches × dims) tiny rows and
    updates a length-``dims`` weight vector. No shuffle at all.

    Bit-reproducibility contract (how the SQL replay oracle can demand
    exact equality): the squashing function is the RATIONAL sigmoid
    ``0.5*(1 + (t/2)/(1+|t/2|))`` — only +,-,*,/,abs, all IEEE
    correctly-rounded, no libm — the dot product accumulates in fixed
    left-to-right dim order, and per-row gradient components are
    quantized to int64 (floor(g·1e9+0.5)) BEFORE summation, so partial
    sums are exact and order-free (the t17 lesson). Each weight update
    is then a deterministic scalar expression of exact integers.
    Magnitude bound: |per-row g| < 1e9·max|x|, so int64 partials hold to
    ~9e9 rows per quantization unit — past that, lower the grid or
    shard the sum.

    Returns ``(weights: list[float], n_rows: int)``.

    ``input_rows``: the same source-statistics bound as :func:`kmeans` —
    ≤ the small-corpus threshold runs the IDENTICAL update driver-side
    on one pulled matrix (one job total instead of 1 + iters). Unlike
    k-means this lane is BIT-exact by construction: per-row gradient
    components quantize to int64 before any summation, so the sum is
    order-free and the weight trajectory is the same to the last bit.
    """
    thr_rows = _small_corpus_threshold(df, small_corpus_rows)
    if thr_rows > 0 and input_rows is not None and 0 < input_rows <= thr_rows:
        pdf = df.select(vec_col, label_col).toPandas()
        if len(pdf):
            X = np.stack(
                [np.asarray(v[:dims], dtype=np.float64) for v in pdf[vec_col]]
            )
            y = (pdf[label_col].to_numpy() < label_threshold).astype(np.float64)
            n_local = float(len(pdf))
            w = [0.0] * dims
            for _ in range(iters):
                t = X[:, 0] * w[0]
                for j in range(1, dims):
                    t = t + X[:, j] * w[j]
                p = 0.5 * (1.0 + (t / 2) / (1.0 + np.abs(t / 2)))
                e = p - y
                g = [
                    int(np.floor(e * X[:, j] * 1e9 + 0.5).astype(np.int64).sum())
                    for j in range(dims)
                ]
                w = [w[j] - lr * ((g[j] / 1e9) / n_local) for j in range(dims)]
            return w, int(n_local)
        # empty relation: fall through — the distributed lane owns the
        # (error) semantics of training on zero rows

    spark = df.sparkSession
    from chdb_spark.operators import _repartition_feature_pass

    # localCheckpoint (not persist): every iteration re-ANALYZES sel's
    # plan — with a checkpoint that plan is a block scan, not the full
    # repartition lineage — and the blocks are ContextCleaner-released
    # when the plan is GC'd (the repo's caching policy).
    sel = _repartition_feature_pass(df.select(vec_col, label_col)).localCheckpoint(
        eager=True
    )
    n = float(sel.count())
    w = [0.0] * dims
    schema = ", ".join(f"g{j} long" for j in range(dims))
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(w)

        def partials(batches):
            wv = bc.value
            d = len(wv)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(
                    [
                        np.asarray(v[:d], dtype=np.float64)
                        for v in pdf[vec_col]
                    ]
                )
                y = (
                    pdf[label_col].to_numpy() < label_threshold
                ).astype(np.float64)
                t = X[:, 0] * wv[0]
                for j in range(1, d):
                    t = t + X[:, j] * wv[j]
                p = 0.5 * (1.0 + (t / 2) / (1.0 + np.abs(t / 2)))
                e = p - y
                yield pd.DataFrame(
                    [
                        {
                            f"g{j}": int(
                                np.floor(e * X[:, j] * 1e9 + 0.5)
                                .astype(np.int64)
                                .sum()
                            )
                            for j in range(d)
                        }
                    ]
                )

        rows = sel.mapInPandas(partials, schema).collect()
        g = [sum(r[f"g{j}"] for r in rows) for j in range(dims)]
        w = [w[j] - lr * ((g[j] / 1e9) / n) for j in range(dims)]
        bc.destroy()
    return w, int(n)


def _cl1_oracle_sql(
    dims: int = 8, iters: int = 3, lr: float = 0.5, thr: int = 5
) -> str:
    """cl1 oracle: the gradient-descent run unrolled into SQL (one
    gradient CTE + one weight CTE per iteration, t19-style). Exactness
    holds because every float op is +,-,*,/,abs in the identical
    left-to-right order and gradient sums are quantized int64."""
    ds = range(1, dims + 1)
    xs = ",\n             ".join(
        f"CAST(embedding[{j}] AS DOUBLE) AS x{j}" for j in ds
    )
    parts = [
        f"""WITH x AS (
      SELECT {xs},
             CASE WHEN label < {thr} THEN 1.0 ELSE 0.0 END AS y
      FROM embeddings
    )""",
        "nr AS (SELECT count(*)::DOUBLE AS n FROM x)",
        "w0 AS (SELECT " + ", ".join(f"0.0 AS w{j}" for j in ds) + ")",
    ]
    for it in range(1, iters + 1):
        t_expr = " + ".join(f"x{j} * w.w{j}" for j in ds)
        gs = ",\n             ".join(
            f"sum(CAST(floor((0.5*(1 + (t/2)/(1+abs(t/2))) - y) * x{j} "
            f"* 1000000000.0 + 0.5) AS BIGINT)) AS g{j}"
            for j in ds
        )
        parts.append(
            f"""g{it} AS (
      SELECT {gs}
      FROM (SELECT x.*, ({t_expr}) AS t FROM x CROSS JOIN w{it-1} w)
    )"""
        )
        ws = ",\n             ".join(
            f"w.w{j} - {lr} * ((g.g{j} / 1000000000.0) / (SELECT n FROM nr))"
            f" AS w{j}"
            for j in ds
        )
        parts.append(
            f"w{it} AS (\n      SELECT {ws}\n      FROM w{it-1} w CROSS JOIN g{it} g\n    )"
        )
    t_expr = " + ".join(f"x{j} * w.w{j}" for j in ds)
    parts.append(
        f"""acc AS (
      SELECT count(*) FILTER (WHERE (t >= 0) = (y = 1.0)) AS n_correct,
             count(*) AS n_rows
      FROM (SELECT x.*, ({t_expr}) AS t FROM x CROSS JOIN w{iters} w)
    )"""
    )
    w_out = ", ".join(f"round(w{j}, 6) AS w{j}" for j in ds)
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT {w_out},
           CAST(n_correct AS BIGINT) AS n_correct,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM w{iters} CROSS JOIN acc"""
    )


@defquery(
    "cl1_linear_classifier",
    _cl1_oracle_sql(),
    doc="distributed linear-probe training (full-batch GD, 3 iterations, "
        "first 8 dims, rational sigmoid) for the binary target label<5, "
        "plus the trained probe's in-sample accuracy — the FineWeb-Edu-"
        "style quality-classifier loop run in-engine. Map-only integer-"
        "quantized gradient partials make every iteration exact and "
        "order-free; the oracle replays all three updates unrolled in "
        "SQL and must match the weights to 6 decimals AND the accuracy "
        "count exactly.",
)
def cl1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table_rows_upper_bound

    emb = table(spark, sf_dir, "embeddings")
    w, _ = train_linear_classifier(
        emb, dims=8, iters=3, lr=0.5,
        input_rows=table_rows_upper_bound(sf_dir, "embeddings"),
    )
    xj = lambda j: F.element_at(F.col("embedding"), j + 1).cast("double")  # noqa: E731
    t = xj(0) * F.lit(w[0])
    for j in range(1, 8):
        t = t + xj(j) * F.lit(w[j])
    acc = emb.agg(
        F.sum(
            F.when((t >= 0) == (F.col("label") < 5), 1).otherwise(0)
        ).alias("n_correct"),
        F.count("*").alias("n_rows"),
    )
    return acc.select(
        # SQL round (HALF_UP, same as the oracle's), not Python's banker's
        *[F.round(F.lit(w[j]), 6).alias(f"w{j+1}") for j in range(8)],
        F.col("n_correct").cast("long").alias("n_correct"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )
