"""Operator-level tests for pipelines whose headline queries have no SQL
oracle (approximate ANN) plus semantics checks on the composable APIs
(merge_asof tolerance, sessionization, funnel monotonicity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chdb_spark.queries import table
from tests.conftest import SF_CORRECT


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF with k-means cells (32 cells, nprobe 8 → ~25% of corpus scanned)
    must recover most true top-5 neighbors; measured ≈0.75 on the sf0.01
    embeddings, bar 0.7. Note the pre-round-3 lowest-id-centroid variant
    "measured" 0.90 at nprobe=4 — that number was self-serving: the query
    vectors (vec_id < 20) WERE the centroids, so each query's own cell
    trivially held its neighbors. With honest k-means cells on these
    unstructured synthetic embeddings, recall ≈ 3-4x the scanned fraction —
    the real ANN tradeoff."""
    from chdb_spark.operators.similarity import knn_bruteforce, knn_ivf

    emb = table(spark, SF_CORRECT, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivf(emb, queries, k=5, n_centroids=32, nprobe=8).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.7, f"IVF recall too low: {recall:.2f}"


def test_s2_oracle_margins(spark):
    """The s2 oracle replays the deterministic IVF in DuckDB SQL; the replay
    is only trustworthy if cell choices can't flip under float rounding.
    Assert the top1-top2 cosine margins (cell assignment and the nprobe
    boundary) sit far above float64-vs-DuckDB noise (~1e-12)."""
    import numpy as np

    from chdb_spark.operators.similarity import train_ivf_centroids

    emb = table(spark, SF_CORRECT, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    C = train_ivf_centroids(emb, 32, iters=3)
    S = (X / np.linalg.norm(X, axis=1, keepdims=True)) @ (
        C / np.linalg.norm(C, axis=1, keepdims=True)
    ).T
    Ssort = np.sort(S, axis=1)
    assert float((Ssort[:, -1] - Ssort[:, -2]).min()) > 1e-8
    qs = np.sort(S[:10], axis=1)
    assert float((qs[:, -4] - qs[:, -5]).min()) > 1e-8
    # k-means centroids must spread load: no cell above 4x the uniform share
    cells = np.bincount(np.argmax(S, axis=1), minlength=32)
    assert cells.max() <= 4 * len(X) / 32, f"cell skew: {cells.max()}/{len(X)}"


def test_ann_lsh_beats_random_candidates(spark):
    """Sign-LSH multi-probe on unstructured embeddings: weak but must beat
    the ~4% random-candidate baseline by a clear margin."""
    from chdb_spark.operators.similarity import knn_ann_lsh, knn_bruteforce

    emb = table(spark, SF_CORRECT, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_ann_lsh(emb, queries, k=5).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.08, f"LSH recall below random baseline: {recall:.2f}"


def test_merge_asof_tolerance(spark):
    """With a tolerance, matches older than the window null out."""
    from chdb_spark.operators.asof import merge_asof_backward

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")], ["uid", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 7.0)], ["uid", "ts", "v"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = merge_asof_backward(left, right, on="ts", by=["uid"], right_values=["v"])
    vals = {str(r.ts): r.asof_v for r in out.collect()}
    assert vals["2024-01-01 10:00:00"] == 7.0
    assert vals["2024-01-01 12:00:00"] == 7.0  # no tolerance → carried forever

    out_tol = merge_asof_backward(
        left, right, on="ts", by=["uid"], right_values=["v"], tolerance="1 hour"
    )
    vals_tol = {str(r.ts): r.asof_v for r in out_tol.collect()}
    assert vals_tol["2024-01-01 10:00:00"] == 7.0  # 30 min back — inside
    assert vals_tol["2024-01-01 12:00:00"] is None  # 2.5 h back — outside


def test_sessionize_gap_boundaries(spark):
    from chdb_spark.operators.events import sessionize

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:29:00"),  # 29 min gap → same session
            (1, "2024-01-01 11:00:01"),  # 31 min gap → new session
            (2, "2024-01-01 10:00:00"),
        ],
        ["user_id", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, "30 minutes").collect()
    sess = {(r.user_id, str(r.ts)): r.session_id for r in out}
    assert sess[(1, "2024-01-01 10:00:00")] == 1
    assert sess[(1, "2024-01-01 10:29:00")] == 1
    assert sess[(1, "2024-01-01 11:00:01")] == 2
    assert sess[(2, "2024-01-01 10:00:00")] == 1


def test_funnel_levels_requires_order_within_window(spark):
    from chdb_spark.operators.events import funnel_levels

    rows = [
        # u1: full ordered chain inside 1h → level 3
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:10:00"),
        (1, "purchase", "2024-01-01 10:20:00"),
        # u2: purchase BEFORE click → level 2
        (2, "view", "2024-01-01 10:00:00"),
        (2, "purchase", "2024-01-01 10:05:00"),
        (2, "click", "2024-01-01 10:10:00"),
        # u3: chain exists but purchase outside the 1h window → level 2
        (3, "view", "2024-01-01 10:00:00"),
        (3, "click", "2024-01-01 10:10:00"),
        (3, "purchase", "2024-01-01 11:30:00"),
        # u4: view only → level 1
        (4, "view", "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    lv = {
        r.user_id: r.funnel_level
        for r in funnel_levels(df, ["view", "click", "purchase"], "INTERVAL 1 HOURS").collect()
    }
    assert lv == {1: 3, 2: 2, 3: 2, 4: 1}


def test_minhash_pipeline_finds_planted_dups_and_nothing_else(spark):
    """LSH candidates after verification == brute-force ground truth (the
    dataset has a clean gap: planted pairs ≥0.9, background ≤0.07)."""
    from chdb_spark.operators.dedup import minhash_lsh_dedup

    docs = table(spark, SF_CORRECT, "documents")
    pairs = minhash_lsh_dedup(docs, threshold=0.8).collect()
    assert len(pairs) == 25
    assert all(r.jaccard >= 0.9 for r in pairs)


def test_exact_dedup_keeps_lowest_id(spark):
    from chdb_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other")], ["doc_id", "text"]
    )
    kept = {r.doc_id for r in exact_dedup(df).collect()}
    assert kept == {1, 2}


def test_kmeans_matches_numpy_reference(spark):
    """Distributed Lloyd's must produce EXACTLY the same assignments as a
    single-machine numpy implementation run from the same deterministic
    init (same iteration count, same tie-breaking)."""
    import numpy as np

    from chdb_spark.operators.similarity import kmeans
    from chdb_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    k, iters = 6, 4
    cents, assign = kmeans(emb, k=k, max_iters=iters, tol=0.0)
    got = {r.vec_id: r.cluster for r in assign.collect()}

    rows = sorted(
        ((r.vec_id, np.asarray(r.embedding, dtype=np.float64)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    A = np.stack([t[1] for t in rows])
    S = A[np.argsort(ids)][: max(k * 8, 64)]
    cents_ref = [S[0]]
    d2 = ((S - S[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(d2))
        cents_ref.append(S[nxt])
        d2 = np.minimum(d2, ((S - S[nxt]) ** 2).sum(axis=1))
    C = np.stack(cents_ref)
    for _ in range(iters):
        d = (A**2).sum(1)[:, None] - 2 * A @ C.T + (C**2).sum(1)[None, :]
        cell = np.argmin(d, axis=1)
        newC = C.copy()
        for j in range(k):
            m = cell == j
            if m.any():
                newC[j] = A[m].mean(axis=0)
        C = newC
    d = (A**2).sum(1)[:, None] - 2 * A @ C.T + (C**2).sum(1)[None, :]
    want = dict(zip(ids.tolist(), np.argmin(d, axis=1).tolist()))
    assert got == want


def test_kmeans_and_linear_probe_hinted_lanes_match(spark):
    """The source-statistics hinted lanes (input_rows ≤ threshold → one
    pull job + driver-side numpy) agree with the distributed lanes:
    k-means assignments identically (margins dwarf summation-order
    noise), the linear probe BIT-exactly (int64-quantized gradients are
    order-free); a bound above the threshold falls through."""
    from chdb_spark.operators.similarity import kmeans, train_linear_classifier
    from chdb_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()

    _, a_dist = kmeans(emb, k=5, max_iters=3)
    _, a_hint = kmeans(emb, k=5, max_iters=3, input_rows=n)
    _, a_fall = kmeans(emb, k=5, max_iters=3, input_rows=n, small_corpus_rows=2)
    dist = {r.vec_id: r.cluster for r in a_dist.collect()}
    assert {r.vec_id: r.cluster for r in a_hint.collect()} == dist
    assert {r.vec_id: r.cluster for r in a_fall.collect()} == dist

    w_dist, n_dist = train_linear_classifier(emb, dims=6, iters=2)
    w_hint, n_hint = train_linear_classifier(emb, dims=6, iters=2, input_rows=n)
    assert (w_hint, n_hint) == (w_dist, n_dist)  # bit-exact

    # return_vectors parity: the hinted assignments carry the same vectors
    _, tv = kmeans(emb, k=5, max_iters=2, return_vectors=True, input_rows=n)
    row = tv.orderBy("vec_id").first()
    src = emb.orderBy("vec_id").first()
    assert list(row[2]) == list(src["embedding"])


def test_connected_components_chain_and_pair(spark):
    """A 4-chain and a detached pair: one component labeled by its min id
    each; labels converge through multi-hop propagation (chain diameter 3)."""
    from chdb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(3, 7), (7, 9), (9, 12), (20, 21)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {3: 3, 7: 3, 9: 3, 12: 3, 20: 20, 21: 20}


def test_connected_components_warns_on_nonconvergence(spark):
    """A chain longer than max_iters hops must not split silently: the
    operator warns when label propagation exits before the fixpoint."""
    import warnings

    from chdb_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["doc_a", "doc_b"]
    )
    # small_pairs=0 forces the distributed propagation — the union-find
    # lane has no iteration cap to warn about
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(chain, max_iters=2, small_pairs=0).collect()
    assert any("not converged" in str(x.message) for x in w)
    # and with enough iterations it converges quietly to one cluster
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {
            r.doc_id: r.cluster_id
            for r in connected_components(
                chain, max_iters=20, small_pairs=0
            ).collect()
        }
    assert not any("not converged" in str(x.message) for x in w)
    assert set(got.values()) == {0}


def test_bucketed_running_sum_nan_rows_kept(spark):
    """NaN order values must survive bucketing (routed to the last bucket,
    Spark's NaN-sorts-greatest order) instead of being dropped by a
    NaN-poisoned width — and the cumulative must match the single-window
    form on the clean prefix."""
    from chdb_spark.functions.aggregate_ext import bucketed_running_sum

    rows = [(1.0, 10), (2.0, 20), (float("nan"), 5), (None, 1), (3.0, 30)]
    df = spark.createDataFrame(rows, ["x", "w"])
    out = bucketed_running_sum(df, "x", ["w"], inclusive=True, n_buckets=4)
    got = out.collect()
    assert len(got) == len(rows)  # nothing silently dropped
    by_x = {}
    for r in got:
        key = "nan" if (r.x is not None and r.x != r.x) else r.x
        by_x[key] = r["_cum_w"]
    # NULL first (1), then 1.0, 2.0, 3.0, NaN last
    assert by_x[None] == 1
    assert by_x[1.0] == 11
    assert by_x[2.0] == 31
    assert by_x[3.0] == 61
    assert by_x["nan"] == 66


def _single_window_cumsum(rows, extra=None):
    """Driver-side reference: cumulative sum over (x NULLS FIRST, extra)."""
    def key(r):
        x = r[0]
        null = x is None
        nan = (not null) and x != x
        return (0 if null else (2 if nan else 1), 0.0 if (null or nan) else x,
                r[2] if extra else 0)

    acc, out = 0, {}
    for r in sorted(rows, key=key):
        acc += r[1]
        out[key(r)] = acc
    return out, key


@pytest.mark.parametrize(
    "dist",
    ["outlier", "ties90", "two_outliers", "uniform"],
)
def test_bucketed_running_sum_pathological_distributions(spark, dist):
    """VERDICT r4 weak #1 fuzz: quantile-derived bucket bounds must keep
    the cumulative EXACT and the buckets BALANCED under distributions that
    collapsed the old min/max-width bounds (one huge outlier → all rows in
    bucket 0) or stress ties (90% identical values)."""
    import random

    from chdb_spark.functions.aggregate_ext import bucketed_running_sum

    rng = random.Random(42)
    n = 2000
    if dist == "outlier":
        xs = [float(rng.randint(0, 1000)) for _ in range(n - 1)] + [1e18]
    elif dist == "two_outliers":
        xs = [-1e17] + [float(rng.randint(0, 1000)) for _ in range(n - 2)] + [1e18]
    elif dist == "ties90":
        xs = [7.0] * (9 * n // 10) + [float(i) + 1000.0 for i in range(n - 9 * n // 10)]
        rng.shuffle(xs)
    else:
        xs = [float(i) for i in range(n)]
    rows = [(x, rng.randint(1, 5), i) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "x double, w int, id long")
    out = bucketed_running_sum(
        df, "x", ["w"], extra_order=["id"], inclusive=True, n_buckets=64
    )
    ref, key = _single_window_cumsum(rows, extra=True)
    got = {key((r.x, r.w, r.id)): r["_cum_w"] for r in out.collect()}
    assert got == ref  # bit-exact vs the single-window form
    # balance: re-derive the bucket assignment and assert no bucket holds
    # ~everything (the old min/max bounds put ≥n-1 rows in one bucket
    # under `outlier`). Ties legitimately concentrate their own frequency.
    from pyspark.sql import functions as F

    clean = df.where(F.col("x").isNotNull() & ~F.isnan("x"))
    probs = [i / 64 for i in range(1, 64)]
    bounds = sorted(set(clean.stat.approxQuantile("x", probs, 1.0e-4)))
    import bisect

    sizes = {}
    for x in xs:
        b = bisect.bisect_right(bounds, x)
        sizes[b] = sizes.get(b, 0) + 1
    top = max(sizes.values())
    tie_mass = max(xs.count(7.0), 1)
    assert top <= max(3 * n // 64, tie_mass + n // 64), (dist, top, len(sizes))


def test_substring_dup_spans_flags_verbatim_copies(spark):
    from chdb_spark.operators.dedup import substring_dup_spans

    base = "x" * 5 + " the quick brown fox jumps over the lazy dog " + "y" * 20
    rows = [
        (1, base),
        (2, base),                      # verbatim copy: every window duplicated
        (3, "z" * 80),                  # unique long doc: zero dup windows
        (4, "short"),                   # < window: excluded entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dup_spans(df).collect()}
    assert 4 not in out
    assert out[1]["dup_ratio"] == 1.0 and out[2]["dup_ratio"] == 1.0
    assert out[3]["n_dup_windows"] == 0
    assert out[1]["n_windows"] == out[2]["n_windows"]


def test_dsir_weights_prefer_target_like_docs(spark):
    from chdb_spark.operators.dedup import tokens  # noqa: F401  (shared idiom)
    from chdb_spark.operators.text import dsir_importance_weights

    target_vocab = "alpha beta gamma delta epsilon"
    other_vocab = "uno dos tres cuatro cinco"
    rows = (
        [(i, target_vocab, "en") for i in range(10)]
        + [(100 + i, other_vocab, "xx") for i in range(10)]
        + [(200, target_vocab, "xx")]   # target-like text, not in exemplar set
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_importance_weights(df, F.col("lang") == "en").collect()
    }
    # doc 200 shares the target vocabulary → higher importance than the
    # off-target docs, comparable to the exemplars themselves
    assert out[200] > out[100]
    assert abs(out[200] - out[0]) < 1e-6
    # token counts flow through
    assert all(v is not None for v in out.values())


def test_perplexity_buckets_separate_fluent_from_noise(spark):
    from chdb_spark.operators.text import perplexity_buckets

    fluent = "the cat sat on the mat and the dog sat on the log"
    rows = (
        [(i, fluent, "good") for i in range(6)]
        + [(100, fluent, "web")]              # fluent but untrusted → low ppl
        + [(200, "zq xv jk qz wx kj zzqq", "web")]  # off-model → high ppl
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in perplexity_buckets(df, F.col("source") == "good").collect()}
    assert out[100]["ppl_proxy"] < out[200]["ppl_proxy"]
    assert out[200]["bucket"] == "tail"
    # doc 100 ties the trusted docs exactly (identical text, same model)
    assert out[100]["ppl_proxy"] == out[0]["ppl_proxy"]
    assert out[0]["bucket"] == "head"


def test_c4_filters_rules(spark):
    from chdb_spark.operators.text import c4_filters

    rows = [
        (1, "This is fine. It ends well."),
        (2, "contains lorem ipsum filler text here ok"),
        (3, "enable javascript to view this page now"),
        (4, "code { with braces } inside and words"),
        (5, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_filters(df).collect()}
    assert out[1]["keep"] and out[1]["terminal_punct_ratio"] == 1.0
    assert out[2]["has_lorem"] and not out[2]["keep"]
    assert out[3]["has_javascript"] and not out[3]["keep"]
    assert out[4]["has_brace"] and not out[4]["keep"]
    assert out[5]["n_words"] == 2 and not out[5]["keep"]


def test_quantized_knn_matches_numpy_and_approximates_mip(spark):
    import numpy as np

    from chdb_spark.operators.similarity import quantized_knn, train_quantizer
    from chdb_spark.queries import table
    from tests.conftest import SF_CORRECT

    emb = table(spark, SF_CORRECT, "embeddings")
    qids = [0, 1, 2]
    got = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in quantized_knn(emb, qids, k=3).collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    mins, maxes = train_quantizer(emb)
    mn = np.array(mins)
    st = np.where(np.array(maxes) > mn, (np.array(maxes) - mn) / 255.0, 1 / 255.0)
    codes = np.clip(np.floor((X - mn) * 255 / np.where(st == 1 / 255.0, 1.0, st * 255)), 0, 255)
    deq = mn + codes * st

    exact_mip_agree = 0
    for q in qids:
        qi = int(np.where(ids == q)[0][0])
        scores = np.round(deq @ deq[qi], 4)
        scores[qi] = -np.inf
        order = np.lexsort((ids, -scores))[:3]
        for rk, j in enumerate(order, start=1):
            assert got[(q, rk)] == ids[j], (q, rk, got[(q, rk)], ids[j])
        # loose sanity: dequantized top-3 overlaps the exact-float MIP top-3
        ex = np.copy(X @ X[qi]); ex[qi] = -np.inf
        top_exact = set(ids[np.argsort(-ex)[:3]])
        exact_mip_agree += len(top_exact & set(ids[order]))
    assert exact_mip_agree >= 6  # >= 2/3 overlap across the 3 queries


def test_small_input_switch_plans_plain_window(spark):
    """The cost-based small-input switch (SMALL_INPUT_ROWS_CONF): on a
    cached input below the threshold the operator legitimately plans a
    single plain window (faster and memory-safe at that size); with the
    threshold forced to 0 the bucketed two-phase shape must come back.
    Results must be identical either way."""
    from chdb_spark.functions.aggregate_ext import bucketed_running_sum

    rows = [(float(i % 97), 1, i) for i in range(500)]
    df = spark.createDataFrame(rows, "x double, w int, id long")

    fast = bucketed_running_sum(
        df, "x", ["w"], extra_order=["id"], inclusive=True, cache_input=True
    )
    plan_fast = fast._jdf.queryExecution().optimizedPlan().toString()
    assert "_bk" not in plan_fast  # took the plain-window shortcut

    forced = bucketed_running_sum(
        df, "x", ["w"], extra_order=["id"], inclusive=True,
        cache_input=True, small_input_rows=0,
    )
    plan_forced = forced._jdf.queryExecution().optimizedPlan().toString()
    assert "_bk" in plan_forced  # bucketed shape retained when pinned off

    got_fast = {r.id: r["_cum_w"] for r in fast.collect()}
    got_forced = {r.id: r["_cum_w"] for r in forced.collect()}
    assert got_fast == got_forced


def test_small_input_switch_conf_override(spark):
    """Setting the conf to 0 (what test_plan_shapes does suite-wide) must
    force the bucketed shape without touching call sites."""
    from chdb_spark.functions.aggregate_ext import (
        SMALL_INPUT_ROWS_CONF,
        bucketed_running_sum,
    )

    df = spark.createDataFrame(
        [(float(i), 1) for i in range(100)], "x double, w int"
    )
    spark.conf.set(SMALL_INPUT_ROWS_CONF, "0")
    try:
        out = bucketed_running_sum(df, "x", ["w"], inclusive=True, cache_input=True)
        assert "_bk" in out._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.unset(SMALL_INPUT_ROWS_CONF)


def test_sketch_fraction_exact_and_balanced(spark):
    """Sampling the bounds sketch (raw-input path, r5 perf weak st5) must
    not change ANY result value — bounds only steer partitioning — and
    bucket populations must stay within a few × of target."""
    import bisect
    import random

    from chdb_spark.functions.aggregate_ext import bucketed_running_sum

    rng = random.Random(7)
    rows = [(rng.gauss(0, 1000.0), rng.randint(1, 5), i) for i in range(20000)]
    df = spark.createDataFrame(rows, "x double, w int, id long")

    full = bucketed_running_sum(
        df, "x", ["w"], extra_order=["id"], inclusive=True, n_buckets=32
    )
    sampled = bucketed_running_sum(
        df, "x", ["w"], extra_order=["id"], inclusive=True, n_buckets=32,
        sketch_fraction=0.2,
    )
    got_full = {r.id: r["_cum_w"] for r in full.collect()}
    got_sampled = {r.id: r["_cum_w"] for r in sampled.collect()}
    assert got_full == got_sampled

    # balance under sampling: max bucket ≤ 4× the uniform target (noise
    # from a 20%/20k sample is ~1 bucket width at 32 buckets)
    probs = [i / 32 for i in range(1, 32)]
    bounds = sorted(
        set(
            df.sample(fraction=0.2, seed=42)
            .stat.approxQuantile("x", probs, 1 / 32)
        )
    )
    sizes = {}
    for x, _, _ in rows:
        b = bisect.bisect_right(bounds, x)
        sizes[b] = sizes.get(b, 0) + 1
    assert max(sizes.values()) <= 4 * (20000 // 32)


def test_infinite_order_values_survive_bucketing(spark):
    """ADVICE r5: ±inf in the order column must not produce an infinite
    quantile bound (Bucketizer would reject non-increasing splits) — the
    infinite rows ride the edge buckets and the cumulative stays exact."""
    from chdb_spark.functions.aggregate_ext import bucketed_running_sum

    # 25% -inf / 25% +inf: quantile boundaries land ON the infinities, so
    # without the finiteness filter the splits list would contain ±inf
    rows = (
        [(float("-inf"), 1, i) for i in range(100)]
        + [(float(i), 1, 100 + i) for i in range(200)]
        + [(float("inf"), 1, 300 + i) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "x double, w int, id long")
    out = bucketed_running_sum(
        df, "x", ["w"], extra_order=["id"], inclusive=True, n_buckets=8
    )
    got = {r.id: r["_cum_w"] for r in out.collect()}
    assert got[0] == 1            # first -inf row
    assert got[99] == 100         # last -inf row (id tiebreak)
    assert got[100] == 101        # smallest finite
    assert got[299] == 300        # largest finite
    assert got[399] == 400        # last +inf row
    assert len(got) == 400


def test_topk_exact_global_and_grouped(spark):
    """Exact top-k: deterministic value-asc tiebreak; grouped form keeps
    only k rows per group and never crosses group boundaries."""
    from chdb_spark.operators.topk import top_k_by_frequency

    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("a", "z")] * 2 + [
        ("b", "y")
    ] * 3 + [("b", "z")] * 1
    df = spark.createDataFrame(rows, "g string, v string")

    top = top_k_by_frequency(df, "v", k=2).collect()
    assert [(r.v, r.freq) for r in top] == [("y", 8), ("x", 5)]

    grouped = top_k_by_frequency(df, "v", k=1, by=["g"]).collect()
    assert [(r.g, r.v, r.freq) for r in grouped] == [("a", "x", 5), ("b", "y", 3)]


def test_topk_misra_gries_guarantee(spark):
    """Any value with frequency > N/capacity must survive the MG merge and
    its merged count must be a lower bound within N/capacity of truth."""
    from chdb_spark.operators.topk import approx_heavy_hitters

    # 10k rows: 'hot' 30%, 'warm' 20%, tail of 500 distinct cold values
    rows = (
        [("hot",)] * 3000
        + [("warm",)] * 2000
        + [(f"cold_{i % 500}",) for i in range(5000)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    out = {r.v: (r.count_lb, r.err_ub) for r in
           approx_heavy_hitters(df, "v", k=5, capacity=64).collect()}
    n = 10000
    assert "hot" in out and "warm" in out
    for name, true in (("hot", 3000), ("warm", 2000)):
        lb, err = out[name]
        assert lb <= true
        # merge over 8 partitions: per-partition undercount <= N_p/capacity
        assert true - lb <= n // 64 + 8
    assert all(lb <= n for lb, _ in out.values())


def test_range_join_semantics_and_plan(spark):
    """Closed [lo, hi] bounds, overlapping intervals multiply matches,
    left join preserves unmatched points, and the physical plan contains
    an equi-join — never BroadcastNestedLoopJoin/CartesianProduct."""
    from chdb_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 10), (4, 15), (5, 99)], "pid long, x long"
    )
    ivs = spark.createDataFrame(
        [("a", 0, 10), ("b", 5, 20), ("c", 50, 60)], "iv string, lo long, hi long"
    )
    got = {
        (r.pid, r.iv)
        for r in range_join(pts, ivs, "x", "lo", "hi", bucket_width=4).collect()
    }
    assert got == {(1, "a"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "b")}

    left = range_join(pts, ivs, "x", "lo", "hi", bucket_width=4, how="left")
    rows = left.collect()
    assert {(r.pid, r.iv) for r in rows} == got | {(5, None)}

    # auto width (median interval length) gives identical matches
    auto = {
        (r.pid, r.iv) for r in range_join(pts, ivs, "x", "lo", "hi").collect()
    }
    assert auto == got

    plan = range_join(pts, ivs, "x", "lo", "hi", bucket_width=4)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s


def test_range_join_rejects_overlap_and_bad_how(spark):
    from chdb_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(1, 1)], "x long, lo long")
    ivs = spark.createDataFrame([(1, 2)], "lo long, hi long")
    with pytest.raises(ValueError, match="overlapping"):
        range_join(pts, ivs, "x", "lo", "hi")
    pts2 = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="inner|left"):
        range_join(pts2, ivs, "x", "lo", "hi", how="full")


def test_semdedup_equals_within_cluster_bruteforce(spark):
    """semdedup must return EXACTLY the brute-force cosine pairs whose two
    ends share a k-means cluster — no extra pairs, none missed — and the
    cluster-size contract must raise rather than run an oversized task."""
    import numpy as np

    from chdb_spark.operators.dedup import semdedup
    from chdb_spark.operators.similarity import kmeans
    from chdb_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    _, assign = kmeans(emb, k=8, max_iters=5)
    cl = {r.vec_id: r.cluster for r in assign.collect()}
    expected = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = int(ids[i]), int(ids[j])
            if S[i, j] >= 0.45 and cl[a] == cl[b]:
                expected.add((min(a, b), max(a, b)))
    got = {(r.id_a, r.id_b) for r in semdedup(emb, k=8, threshold=0.45).collect()}
    assert got == expected and len(expected) > 0

    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup(emb, k=2, threshold=0.45, max_cluster_rows=10).count()


def test_fuzzy_self_join_semantics_and_plan(spark):
    """Deletion-1 blocking is exact vs the brute-force definition on a
    hand-built set covering substitution / insertion / deletion /
    distance-2 misses; the plan must stay equi-joined (no BNLJ)."""
    from chdb_spark.operators.linkage import fuzzy_self_join

    rows = [
        (1, "alpha"),   # base
        (2, "alpka"),   # substitution  -> dist 1 to alpha
        (3, "alpha1"),  # insertion     -> dist 1 to alpha
        (4, "alph"),    # deletion      -> dist 1 to alpha / 2 to alpka
        (5, "aXpXa"),   # dist 2 to alpha -> must NOT match
        (6, "alpha"),   # duplicate     -> dist 0 to alpha
    ]
    df = spark.createDataFrame(rows, "k long, name string")
    got = {
        (r.k_a, r.k_b, r.dist)
        for r in fuzzy_self_join(df, "k", "name").collect()
    }
    want = {
        (1, 2, 1), (1, 3, 1), (1, 4, 1), (1, 6, 0),
        (2, 6, 1), (3, 6, 1), (4, 6, 1),
        # (3,4) is dist 2, (5,*) all dist >= 2 — correctly absent
    }
    assert got == want
    plan = fuzzy_self_join(df, "k", "name")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    with pytest.raises(ValueError):
        fuzzy_self_join(df, "k", "name", max_dist=2)


def test_chunk_documents_windows(spark):
    """Window algebra: exact cover with overlap, short docs -> one chunk,
    boundary doc (len == size) -> one chunk, len == size+1 -> two."""
    from chdb_spark.operators.text import chunk_documents

    rows = [(1, "a" * 10), (2, "b" * 4), (3, "c" * 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, size=10, stride=5)
    got = {(r.doc_id, r.chunk_ix, r.chunk_text) for r in out.collect()}
    assert got == {
        (1, 0, "a" * 10),
        (2, 0, "b" * 4),
        (3, 0, "c" * 10),
        (3, 1, "c" * 6),  # starts at 5+1, runs to end
    }
    with pytest.raises(ValueError):
        chunk_documents(df, size=5, stride=6)


def test_random_project_preserves_distance_order(spark):
    """JL property smoke: identical vectors project identically; an
    orthogonal far vector stays far after 64→8 sign projection."""
    from chdb_spark.operators.similarity import random_project

    base = [0.5] * 32 + [-0.5] * 32
    far = [-0.5] * 32 + [0.5] * 32
    df = spark.createDataFrame(
        [(1, base), (2, list(base)), (3, far)],
        "vec_id long, embedding array<float>",
    )
    out = random_project(df)
    rows = {(r.vec_id, r.k): r.proj for r in out.collect()}
    assert len(rows) == 24
    v1 = [rows[(1, k)] for k in range(8)]
    v2 = [rows[(2, k)] for k in range(8)]
    v3 = [rows[(3, k)] for k in range(8)]
    assert v1 == v2                      # deterministic
    assert v3 == [-x for x in v1]        # sign projection is linear
    d_same = sum((a - b) ** 2 for a, b in zip(v1, v2))
    d_far = sum((a - b) ** 2 for a, b in zip(v1, v3))
    assert d_same == 0.0 and d_far > 0.0


def test_standardize_dims_moments(spark):
    """Standardized output has per-dim mean ~0 and population std ~1."""
    from chdb_spark.operators.similarity import standardize_dims

    import random

    rng = random.Random(7)
    data = [
        (i, [rng.uniform(-1, 1) * (d + 1) for d in range(8)])
        for i in range(100)
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    stats = (
        standardize_dims(df, n_dims=8)
        .groupBy("dim")
        .agg(F.avg("z").alias("m"), F.stddev_pop("z").alias("sd"))
        .collect()
    )
    assert len(stats) == 8
    for r in stats:
        assert abs(r.m) < 1e-6, f"dim {r.dim} mean {r.m}"
        assert abs(r.sd - 1.0) < 1e-3, f"dim {r.dim} std {r.sd}"


def test_hard_negatives_cross_label_only(spark):
    """With exclude_label_col set, every neighbor has a different label
    than its query, and the result equals the brute-force definition."""
    from chdb_spark.operators.similarity import knn_bruteforce

    emb = table(spark, SF_CORRECT, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = knn_bruteforce(emb, queries, k=3, exclude_label_col="label")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = out.collect()
    assert len(rows) == 15
    for r in rows:
        assert labels[r.query_id] != labels[r.neighbor_id]
    # brute force replay in python
    import numpy as np

    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    for q in range(5):
        qv = vecs[q] / np.linalg.norm(vecs[q])
        cand = sorted(
            (
                (-float(qv @ (v / np.linalg.norm(v))), i)
                for i, v in vecs.items()
                if i != q and labels[i] != labels[q]
            ),
        )[:3]
        got = [r.neighbor_id for r in rows if r.query_id == q]
        assert got == [i for _, i in cand]


def test_zorder_tightens_file_stats(spark, tmp_path):
    """The point of Z-ordering: after the clustered write, each parquet
    file covers a small rectangle of (o_custkey, o_totalprice), so the
    summed per-file min/max spans shrink vs a hash-shuffled layout —
    that's what lets readers skip files via footer stats."""
    import pyarrow.parquet as pq

    from chdb_spark.operators.layout import zorder_write

    o = table(spark, SF_CORRECT, "orders").select("o_custkey", "o_totalprice")
    z_dir = tmp_path / "z"
    r_dir = tmp_path / "r"
    zorder_write(o, ["o_custkey", "o_totalprice"], str(z_dir), n_files=8)
    o.repartition(8).write.mode("overwrite").parquet(str(r_dir))

    def area_sum(d):
        import glob

        total = 0.0
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) >= 4
        for f in files:
            md = pq.ParquetFile(f).metadata
            spans = []
            for ix in (0, 1):
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ix).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                spans.append(float(max(maxs) - min(mins)))
            total += spans[0] * spans[1]
        return total

    # the Z-curve property: each file's bounding RECTANGLE is small —
    # summed area shrinks toward 1/n_files of the random layout's
    z_area, r_area = area_sum(z_dir), area_sum(r_dir)
    assert z_area < 0.4 * r_area, (
        f"z-order area {z_area:.3g} not < 40% of random {r_area:.3g}"
    )
    # layout is lossless
    assert spark.read.parquet(str(z_dir)).count() == o.count()


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The persisted index's point: searching probes only nprobe cells,
    and because the assignment is written partitionBy(cell), the scan
    plan prunes to those partitions (PartitionFilters + a fraction of
    the files) instead of reading the whole corpus."""
    from chdb_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_search,
        knn_ivf,
    )

    emb = table(spark, SF_CORRECT, "embeddings")
    idx = str(tmp_path / "ivf")
    ivf_index_build(emb, idx, n_centroids=32, kmeans_iters=3)
    queries = emb.filter(F.col("vec_id") < 10)
    out = ivf_index_search(spark, idx, queries, k=5, nprobe=4)
    # identical to the build-per-call path (same deterministic training)
    direct = knn_ivf(emb, queries, k=5, n_centroids=32, nprobe=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, direct.collect()))
    # pruning pin: the cells scan must carry a non-empty PartitionFilters
    # on `cell` (inputFiles() lists pre-pruning, so the PLAN is the proof),
    # over a layout that actually has one directory per cell
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    # non-empty filter list mentioning the partition column — robust to
    # filter ordering (isnotnull-first) across Spark versions
    first_filters = pf[1][:200] if len(pf) == 2 else ""
    assert "cell" in first_filters and not first_filters.startswith("]"), (
        "cells scan has no partition filter on `cell`"
    )
    import glob

    cell_dirs = glob.glob(f"{idx}/cells/cell=*")
    assert len(cell_dirs) == 32  # one directory per cell → prunable unit
    # no leftover temp build dir from the atomic swap
    assert not glob.glob(f"{idx}__build_*")
    # empty query set → empty result with the contract schema, not a crash
    none_q = emb.filter(F.col("vec_id") < 0)
    empty = ivf_index_search(spark, idx, none_q, k=5, nprobe=4)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "neighbor_id", "cos", "rank"]
    assert knn_ivf(emb, none_q, k=5, n_centroids=32, nprobe=4).count() == 0


def test_bloom_decontamination_matches_exact(spark):
    """dd12's contract: bit-identical to the plain semi-join decontaminate,
    with the bloom prefilter actually cutting the gram stream (no false
    negatives by construction; false positives removed by the confirm)."""
    from chdb_spark.operators.dedup import (
        _bloom_params,
        _bloom_positions,
        decontaminate,
        decontaminate_bloom,
    )
    import numpy as np

    docs = table(spark, SF_CORRECT, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    exact = sorted(map(tuple, decontaminate(train, bench, n=13).collect()))
    bloom = sorted(map(tuple, decontaminate_bloom(train, bench, n=13).collect()))
    assert bloom == exact

    # pure-python bloom kernel: every inserted hash must test positive
    rng = np.random.RandomState(7)
    items = rng.randint(0, 1 << 48, size=5000).astype(np.int64)
    m, k = _bloom_params(len(items), fpp=0.01)
    bits = np.zeros((m + 63) // 64, dtype=np.uint64)
    for pos in _bloom_positions(items, m, k):
        np.bitwise_or.at(
            bits, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        )

    def contains(h):
        ok = np.ones(len(h), dtype=bool)
        for pos in _bloom_positions(h, m, k):
            ok &= (bits[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1) != 0
        return ok

    assert contains(items).all()  # zero false negatives
    probe = rng.randint(0, 1 << 48, size=20000).astype(np.int64)
    novel = probe[~np.isin(probe, items)]
    fp = contains(novel).mean()
    assert fp < 0.05, f"false-positive rate {fp:.3f} far above the 1% design point"


def test_doc_features_hs_filter_prunes_emitted_hashes_only(spark):
    """hs_filter contract (the dd12 bloom fusion): the emitted hs column is
    masked by the predicate, doc rows are preserved (possibly with empty
    arrays), and band/simhash features still derive from the FULL array."""
    from chdb_spark.operators.dedup import doc_features

    docs = table(spark, SF_CORRECT, "documents").limit(50)
    full = {r.doc_id: r for r in doc_features(docs).collect()}
    kept = {
        r.doc_id: r
        for r in doc_features(docs, hs_filter=lambda h: h % 2 == 0).collect()
    }
    assert set(kept) == set(full)
    for did, r in kept.items():
        assert r.hs == [h for h in full[did].hs if h % 2 == 0]
        assert r.band_hashes == full[did].band_hashes  # untouched by the mask
        assert r.fp == full[did].fp


def test_doc_features_gram_construction_matches_slice_reference():
    """The zip-based gram builder inside doc_features must emit exactly the
    strings of the per-index slice form (" ".join(tk[i:i+n])) — the hashes,
    and therefore every dd-family result, hinge on string identity."""

    def reference(tk, n):
        if len(tk) < n:
            return []
        return [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]

    def zipped(tk, n):  # the doc_features gen() formulation
        return list(map(" ".join, zip(*(tk[i:] for i in range(n)))))

    import random
    import string

    rng = random.Random(7)
    cases = [[], ["a"], ["a", "b"], ["a", "b", "c"], ["", "", ""], ["x"] * 7]
    for _ in range(500):
        cases.append(
            [
                "".join(rng.choices(string.ascii_lowercase, k=rng.randint(0, 4)))
                for _ in range(rng.randint(0, 12))
            ]
        )
    for tk in cases:
        for n in (1, 2, 3, 4, 6):
            assert zipped(tk, n) == reference(tk, n), (tk, n)


def test_doc_features_perdoc_reductions_match_reduceat_reference():
    """The per-doc minhash/simhash reductions inside doc_features must be
    bit-equal to the batch ufunc.reduceat formulation they replaced — the
    band hashes (and so every LSH candidate set) hinge on exact equality,
    including uint64 wraparound in the universal-hash products."""
    import numpy as np

    from chdb_spark.operators.dedup import _perm_consts

    rng = np.random.RandomState(11)
    lens = np.concatenate(
        [rng.randint(1, 40, size=200), [1, 1, 2, 300]]
    ).astype(np.int64)
    allv = rng.randint(0, 2**63, size=int(lens.sum())).astype(np.uint64)
    starts = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    perms = np.array(_perm_consts(128), dtype=np.uint64)
    a_c, b_c = perms[:, 0], perms[:, 1]

    # minhash: per-doc chunked min (chunk smaller than segments to cover
    # the multi-chunk merge path) vs reduceat over the full product matrix
    def _uhash_mins(h, chunk):
        m = None
        for i in range(0, h.size, chunk):
            sl = h[i : i + chunk]
            part = (sl[:, None] * a_c[None, :] + b_c[None, :]).min(axis=0)
            m = part if m is None else np.minimum(m, part)
        return m

    prods = allv[:, None] * a_c[None, :] + b_c[None, :]
    ref_mins = np.minimum.reduceat(prods, starts, axis=0)
    for chunk in (7, 1 << 20):
        got = np.stack(
            [_uhash_mins(allv[s : s + l], chunk) for s, l in zip(starts, lens)]
        )
        assert np.array_equal(got, ref_mins)

    # simhash: per-doc unpackbits+sum vs batch unpackbits + add.reduceat
    bits = np.unpackbits(
        allv.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    ref_sums = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
    got_sums = np.stack(
        [
            np.unpackbits(
                allv[s : s + l].view(np.uint8).reshape(-1, 8),
                axis=1,
                bitorder="little",
            ).sum(axis=0, dtype=np.int64)
            for s, l in zip(starts, lens)
        ]
    )
    assert np.array_equal(got_sums, ref_sums)


def test_token_shards_layout_bounded_and_lossless(spark, tmp_path):
    """wr1's write contract: every shard holds <= budget + one doc's
    tokens (greedy straddle), directories are one parquet file each,
    ordered by doc_id, and the layout is lossless."""
    from chdb_spark.operators.text import write_token_shards

    docs = table(spark, SF_CORRECT, "documents")
    out = str(tmp_path / "shards")
    stats = write_token_shards(docs, token_budget=2000, out_dir=out).collect()
    assert len(stats) >= 5
    max_doc = max(r.shard_tokens for r in stats)  # any single doc fits a shard
    for r in stats[:-1]:
        assert r.shard_tokens <= 2000 + max_doc
    # contiguous id ranges: shard i ends before shard i+1 begins
    for a, b in zip(stats, stats[1:]):
        assert a.last_doc < b.first_doc and a.shard_id + 1 == b.shard_id
    import glob

    shard_dirs = glob.glob(f"{out}/shard_id=*")
    assert len(shard_dirs) == len(stats)
    for d in shard_dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1  # one ordered file per shard
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.columns) >= {"doc_id", "text", "n_tokens", "shard_id"}


def test_token_shards_fallback_lane_matches_bucketizer_lane(spark, tmp_path):
    """write_token_shards assigns shards via a Bucketizer binary search
    for double-exact numeric ids and via an exact broadcast range join
    otherwise; both lanes must produce the identical doc->shard map.
    Force the fallback with a zero-padded STRING id (lexicographic order
    == numeric order, so the greedy layout is the same)."""
    from chdb_spark.operators.text import write_token_shards

    docs = table(spark, SF_CORRECT, "documents")
    out_num = str(tmp_path / "shards_num")
    out_str = str(tmp_path / "shards_str")
    write_token_shards(docs, token_budget=2000, out_dir=out_num).collect()
    str_docs = docs.withColumn(
        "doc_id", F.lpad(F.col("doc_id").cast("string"), 12, "0")
    )
    write_token_shards(str_docs, token_budget=2000, out_dir=out_str).collect()
    num_map = {
        int(r.doc_id): r.shard_id
        for r in spark.read.parquet(out_num).select("doc_id", "shard_id").collect()
    }
    str_map = {
        int(r.doc_id): r.shard_id
        for r in spark.read.parquet(out_str).select("doc_id", "shard_id").collect()
    }
    assert num_map == str_map


def test_streaming_lsh_state_crosses_batches(spark, tmp_path):
    """sm6's core claim: the stateful bucket memory makes the streaming
    candidate set equal the batch self-join for ANY arrival order. Force
    the hard case — every near-dup pair split across two different files
    (so no pair can be found inside a single micro-batch)."""
    from chdb_spark.operators.dedup import (
        doc_features,
        minhash_lsh_dedup,
        verify_pairs_arrays,
    )
    from chdb_spark.streaming.core import streaming_lsh_bucket_pairs

    docs = table(spark, SF_CORRECT, "documents")
    batch = sorted(map(tuple, minhash_lsh_dedup(docs, threshold=0.8).collect()))
    assert batch, "dataset has planted near-dups"
    first_members = {a for a, _, _ in batch}
    src = str(tmp_path / "stream_src")
    docs.filter(F.col("doc_id").isin(first_members)).coalesce(1).write.parquet(src)
    docs.filter(~F.col("doc_id").isin(first_members)).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    banded = doc_features(stream, with_simhash=False).select(
        "doc_id", F.posexplode("band_hashes").alias("band_idx", "band_hash")
    )
    q = (
        streaming_lsh_bucket_pairs(banded)
        .writeStream.format("memory")
        .queryName("lsh_cross_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cand = spark.table("lsh_cross_mem").distinct()
    feats = doc_features(docs, with_simhash=False).localCheckpoint(eager=True)
    streamed = sorted(
        map(tuple, verify_pairs_arrays(cand, feats, threshold=0.8).collect())
    )
    assert streamed == batch


def test_ivf_build_if_needed_reuses_until_stale(spark, tmp_path):
    """The amortization contract: a matching manifest skips the rebuild;
    a corpus change (row-set fingerprint) or force triggers one; a
    partial build (no manifest) never reads as valid."""
    import json
    import os

    from chdb_spark.operators.similarity import (
        ivf_index_build_if_needed,
        ivf_index_search,
        knn_ivf,
    )

    emb = table(spark, SF_CORRECT, "embeddings")
    idx = str(tmp_path / "ivf")
    assert ivf_index_build_if_needed(emb, idx, n_centroids=32) is True
    assert ivf_index_build_if_needed(emb, idx, n_centroids=32) is False  # reuse
    # params change → rebuild
    assert ivf_index_build_if_needed(emb, idx, n_centroids=16) is True
    # corpus change → rebuild
    assert ivf_index_build_if_needed(emb.limit(100), idx, n_centroids=16) is True
    # force → rebuild even when everything matches
    assert ivf_index_build_if_needed(emb.limit(100), idx, n_centroids=16, force=True) is True
    # missing manifest (partial build) → rebuild
    os.remove(os.path.join(idx, "_MANIFEST.json"))
    assert ivf_index_build_if_needed(emb.limit(100), idx, n_centroids=16) is True
    # corrupt manifest → rebuild, and the reused index still searches right
    with open(os.path.join(idx, "_MANIFEST.json"), "w") as f:
        f.write("{not json")
    assert ivf_index_build_if_needed(emb, idx, n_centroids=32) is True
    assert ivf_index_build_if_needed(emb, idx, n_centroids=32) is False
    queries = emb.filter(F.col("vec_id") < 10)
    out = sorted(map(tuple, ivf_index_search(spark, idx, queries, k=5, nprobe=4).collect()))
    direct = sorted(map(tuple, knn_ivf(emb, queries, k=5, n_centroids=32, nprobe=4).collect()))
    assert out == direct
    # sum-preserving id re-key (drop {10,20}, add {12,18}: count and plain
    # id sum unchanged) is still caught — the xor-of-hashes term sees it
    rekeyed = emb.filter(~F.col("vec_id").isin(10, 20)).unionByName(
        emb.filter(F.col("vec_id").isin(11, 17)).withColumn(
            "vec_id", F.col("vec_id") + F.lit(1)
        )
    )
    assert ivf_index_build_if_needed(rekeyed, idx, n_centroids=32) is True


def test_ivf_build_refuses_inplace_rebuild_on_scheme_path(spark, tmp_path):
    """Object-store paths have no atomic dir swap, so rebuilding an
    EXISTING scheme-qualified index in place must refuse loudly (a crash
    between the cells/ and centroids/ overwrites would search wrong with
    no error). file:// exercises the same Hadoop-FS scheme code path."""
    import pytest as _pytest

    from chdb_spark.operators.similarity import ivf_index_build

    emb = table(spark, SF_CORRECT, "embeddings").limit(200)
    uri = "file://" + str(tmp_path / "ivf_scheme")
    ivf_index_build(emb, uri, n_centroids=8, kmeans_iters=1)  # fresh: fine
    with _pytest.raises(ValueError, match="versioned path"):
        ivf_index_build(emb, uri, n_centroids=8, kmeans_iters=1)


def test_bpe_merges_matches_python_reference(spark):
    """bpe_merges vs a transparent single-process reference implementing
    the same replace-to-fixpoint semantics, on a corpus with the nasty
    overlap shapes (ababab, aaaa) and a frequency tie."""
    from chdb_spark.operators.text import bpe_merges

    corpus = ["ababab cd cd", "ababab cd ab", "aaaa cd", "zq zq"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"])

    def ref_bpe(texts, n):
        from collections import Counter

        freq = Counter(w for t in texts for w in t.split())
        words = {" ".join(w): c for w, c in freq.items()}
        out = []
        for step in range(1, n + 1):
            pc = Counter()
            for s, c in words.items():
                syms = s.split(" ")
                for a, b in zip(syms, syms[1:]):
                    pc[f"{a} {b}"] += c
            pair = min(pc, key=lambda p: (-pc[p], p))
            merged = pair.replace(" ", "")
            out.append((step, *pair.split(" "), merged, pc[pair]))
            nw = {}
            for s, c in words.items():
                padded = f" {s} "
                for _ in range(3):  # replace-to-fixpoint, same as the engine
                    padded = padded.replace(f" {pair} ", f" {merged} ")
                nw[padded.strip()] = nw.get(padded.strip(), 0) + c
            words = nw
        return out

    got = [tuple(r) for r in bpe_merges(docs, n_merges=5).collect()]
    assert got == ref_bpe(corpus, 5)


def test_bpe_distributed_lane_matches_driver_lane(spark, monkeypatch):
    """The vocab-bounded driver lane (r11 optimization) and the distributed
    fallback must produce identical merges AND identical final word tables:
    force the distributed lane by zeroing the driver bound and compare both
    trainer outputs on the same nasty-overlap corpus."""
    import chdb_spark.operators.text as text_mod
    from chdb_spark.operators.text import bpe_merges, bpe_token_counts

    corpus = ["ababab cd cd", "ababab cd ab", "aaaa cd", "zq zq", "a0a0 a0"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"])

    local_merges = [tuple(r) for r in bpe_merges(docs, n_merges=5).collect()]
    local_tokens = [tuple(r) for r in bpe_token_counts(docs, n_merges=5, top_k=50).collect()]

    monkeypatch.setattr(text_mod, "_BPE_VOCAB_DRIVER_MAX", 0)
    dist_merges = [tuple(r) for r in bpe_merges(docs, n_merges=5).collect()]
    dist_tokens = [tuple(r) for r in bpe_token_counts(docs, n_merges=5, top_k=50).collect()]

    assert dist_merges == local_merges
    assert dist_tokens == local_tokens


def test_weighted_reservoir_deterministic_across_partitionings(spark):
    """The A-Res draw is hash-derived, so the selected sample is identical
    no matter how the input is partitioned — the property rand() cannot
    give. Also pins k-per-group and that selection follows the key order."""
    from chdb_spark.operators.text import weighted_reservoir_sample

    docs = table(spark, SF_CORRECT, "documents")
    base = sorted(
        map(
            tuple,
            weighted_reservoir_sample(docs, k=3)
            .select("source", "doc_id")
            .collect(),
        )
    )
    reparted = sorted(
        map(
            tuple,
            weighted_reservoir_sample(docs.repartition(17, "text"), k=3)
            .select("source", "doc_id")
            .collect(),
        )
    )
    assert base == reparted
    from collections import Counter

    per_group = Counter(s for s, _ in base)
    assert all(v == 3 for v in per_group.values())


def test_minhash_index_build_if_needed_reuses_until_stale(spark, tmp_path):
    """dd14's amortization contract mirrors the IVF one: matching manifest
    skips the rebuild; corpus/params change or force rebuilds; a missing
    manifest (partial build) never reads as valid; and the reused index
    gives the same matches as a fresh in-memory LSH run."""
    import os

    from chdb_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build_if_needed,
        minhash_lsh_dedup,
    )

    docs = table(spark, SF_CORRECT, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 7)
    batch = docs.where(F.col("doc_id") % 10 == 7)
    idx = str(tmp_path / "mh")
    assert minhash_index_build_if_needed(corpus, idx) is True
    assert minhash_index_build_if_needed(corpus, idx) is False  # reuse
    assert minhash_index_build_if_needed(corpus, idx, bands=16) is True  # params
    assert minhash_index_build_if_needed(corpus.limit(50), idx, bands=16) is True
    os.remove(os.path.join(idx, "_MANIFEST.json"))
    assert minhash_index_build_if_needed(corpus.limit(50), idx, bands=16) is True
    # rebuild at the real params, then check probe results against the
    # all-in-one LSH over corpus ∪ batch restricted to cross-set pairs
    assert minhash_index_build_if_needed(corpus, idx) is True
    got = sorted(
        map(tuple, dedup_against_index(batch, idx, threshold=0.8).collect())
    )
    full = minhash_lsh_dedup(docs, threshold=0.8)
    is_new_a = F.col("doc_a") % 10 == 7
    is_new_b = F.col("doc_b") % 10 == 7
    cross = full.where(is_new_a != is_new_b).select(
        F.when(is_new_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_new"),
        F.when(is_new_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias("doc_corpus"),
        "jaccard",
    )
    want = sorted(map(tuple, cross.collect()))
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# rollup — mergeable partial-aggregate states (-State/-Merge algebra)
# ---------------------------------------------------------------------------


def _rollup_aggs():
    from chdb_spark.operators.rollup import AggSpec  # noqa: F401

    return {
        "cnt": ("count", None),
        "val_sum": ("sum", F.col("value").cast("decimal(18,2)")),
        "val_min": ("min", "value"),
        "val_max": ("max", "value"),
        "val_avg": ("avg", F.col("value").cast("decimal(18,2)")),
        "n_users": ("uniq_exact", "user_id"),
        "val_var": ("var", F.col("value").cast("decimal(18,2)")),
    }


def test_rollup_merge_associative(spark):
    """hour→day→month chained merges == direct aggregation at month grain,
    EXACTLY (every kind is algebraic; sums ride decimal)."""
    from chdb_spark.operators.rollup import (
        finalize_states,
        merge_states,
        partial_states,
    )

    ev = table(spark, SF_CORRECT, "events")
    aggs = _rollup_aggs()
    hourly = partial_states(
        ev, ["event_type", F.date_trunc("hour", "ts").alias("g")], aggs
    )
    daily = merge_states(hourly, ["event_type", F.to_date("g").alias("g")], aggs)
    monthly = merge_states(
        daily, ["event_type", F.trunc("g", "month").alias("g")], aggs
    )
    got = {
        tuple(r[:2]): r[2:]
        for r in finalize_states(monthly, aggs)
        .select("event_type", "g", *aggs)
        .collect()
    }

    direct = partial_states(
        ev, ["event_type", F.trunc(F.to_date("ts"), "month").alias("g")], aggs
    )
    want = {
        tuple(r[:2]): r[2:]
        for r in finalize_states(direct, aggs)
        .select("event_type", "g", *aggs)
        .collect()
    }
    assert set(got) == set(want) and got  # same groups, non-empty
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_rollup_hll_uniq_merge_consistent(spark):
    """uniq (HLL sketch) states: estimate(union of hourly sketches) equals
    estimate(one direct sketch) — sketch-of-union == union-of-sketches."""
    from chdb_spark.operators.rollup import (
        finalize_states,
        merge_states,
        partial_states,
    )

    ev = table(spark, SF_CORRECT, "events")
    aggs = {"u": ("uniq", "user_id")}
    hourly = partial_states(
        ev, ["event_type", F.date_trunc("hour", "ts").alias("g")], aggs
    )
    merged = merge_states(hourly, ["event_type"], aggs)
    got = dict(finalize_states(merged, aggs).collect())
    direct = dict(
        finalize_states(partial_states(ev, ["event_type"], aggs), aggs).collect()
    )
    assert got == direct and got


def test_rollup_rejects_unknown_kind(spark):
    from chdb_spark.operators.rollup import partial_states

    ev = table(spark, SF_CORRECT, "events")
    with pytest.raises(ValueError, match="unknown kind"):
        partial_states(ev, ["event_type"], {"x": ("median", "value")})


# ---------------------------------------------------------------------------
# cdc — snapshot diff + version collapse
# ---------------------------------------------------------------------------


def test_snapshot_diff_null_safety(spark):
    """NULL→value and value→NULL are updates; NULL→NULL is unchanged."""
    from chdb_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "same")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "now"), (2, None), (3, None), (4, "same"), (5, "fresh")],
        "k int, v string",
    )
    got = {
        r["k"]: (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("update", None, "now"),
        2: ("update", "x", None),
        5: ("insert", None, "fresh"),
    }  # 3 (NULL→NULL) and 4 (equal) dropped


def test_snapshot_diff_null_key_rows(spark):
    """In a keyed snapshot NULL is a key VALUE (null-safe <=> matching,
    ADVICE r7): a NULL-key row present in both snapshots pairs up — equal
    values drop as unchanged, differing values are one 'update' — and an
    old-only NULL-key row is a 'delete' (never misclassified or lost)."""
    from chdb_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(None, "gone"), (1, "a")], "k int, v string")
    new = spark.createDataFrame([(None, "born"), (1, "a")], "k int, v string")
    got = sorted(
        (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    )
    assert got == [("update", "gone", "born")]
    # identical NULL-key rows pair and drop: diff(x, x) is empty for ANY x
    assert snapshot_diff(old, old, ["k"]).count() == 0
    # old-only NULL-key row retires as a delete
    got2 = sorted(
        (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, old.filter("k IS NOT NULL"), ["k"]).collect()
    )
    assert got2 == [("delete", "gone", None)]


def test_snapshot_diff_rejects_bad_keys(spark):
    from chdb_spark.operators.cdc import snapshot_diff

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="key columns missing"):
        snapshot_diff(df, df, ["nope"])
    with pytest.raises(ValueError, match="no columns to compare"):
        snapshot_diff(df.select("k"), df.select("k"), ["k"])


def test_latest_by_version_deterministic(spark):
    """ReplacingMergeTree(ver) FINAL analogue: max version wins per key,
    exact max-version duplicates tie-break deterministically, result
    independent of input partitioning."""
    from chdb_spark.operators.cdc import latest_by_version

    rows = [
        (1, 1, "a"), (1, 3, "c"), (1, 2, "b"),
        (2, 5, "x"), (2, 5, "y"),            # duplicate max version
        (3, 7, None),
    ]
    df = spark.createDataFrame(rows, "k int, ver int, payload string")
    want = {(1, 3, "c"), (2, 5, "y"), (3, 7, None)}
    for parts in (1, 7):
        got = {
            tuple(r)
            for r in latest_by_version(
                df.repartition(parts), ["k"], "ver"
            ).collect()
        }
        assert got == want


# ---------------------------------------------------------------------------
# evolve — schema-evolution union (NULL fill + type widening)
# ---------------------------------------------------------------------------


def test_union_by_name_widen_types_and_nulls(spark):
    from chdb_spark.operators.evolve import union_by_name_widen

    a = spark.createDataFrame([(1, 1.5)], "k int, score float")
    b = spark.createDataFrame([(2**40, 2.5, "web")], "k bigint, score double, src string")
    out = union_by_name_widen([a, b])
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("k", "bigint"), ("score", "double"), ("src", "string")
    ]
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, 1.5, None), (2**40, 2.5, "web")}


def test_union_by_name_widen_numeric_fractional_and_dates(spark):
    import datetime

    from chdb_spark.operators.evolve import union_by_name_widen

    a = spark.createDataFrame([(1, datetime.date(2024, 1, 1))], "n long, d date")
    b = spark.createDataFrame(
        [(0.5, datetime.datetime(2024, 1, 2, 3, 4))], "n double, d timestamp"
    )
    out = union_by_name_widen([a, b])
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "double", "timestamp"
    ]
    assert out.count() == 2


def test_union_by_name_widen_rejects_kind_change(spark):
    from chdb_spark.operators.evolve import union_by_name_widen

    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([("s",)], "x string")
    with pytest.raises(TypeError, match="kind change"):
        union_by_name_widen([a, b])


def test_apply_diff_reconstructs_new_snapshot(spark):
    """apply(old, diff(old, new)) == new, exactly — including NULL
    transitions and key churn."""
    from chdb_spark.operators.cdc import apply_snapshot_diff, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, None, 4.0), (5, "e", None)],
        "k int, s string, v double",
    )
    diff = snapshot_diff(old, new, ["k"])
    rebuilt = apply_snapshot_diff(old, diff, ["k"])
    assert {tuple(r) for r in rebuilt.collect()} == {
        tuple(r) for r in new.collect()
    }
    # diff of identical snapshots is empty → apply is the identity
    empty = snapshot_diff(new, new, ["k"])
    assert empty.count() == 0
    same = apply_snapshot_diff(new, empty, ["k"])
    assert {tuple(r) for r in same.collect()} == {tuple(r) for r in new.collect()}


def test_apply_diff_retires_null_key_rows(spark):
    """snapshot_diff emits NULL-key delete/insert rows; apply must retire
    the old NULL-key row too (null-SAFE anti join — a plain key-list anti
    join never matches NULL and keeps both rows, ADVICE r7)."""
    from chdb_spark.operators.cdc import apply_snapshot_diff, snapshot_diff

    schema = "k int, s string, v double"
    old = spark.createDataFrame([(None, "old-null", 1.0), (1, "a", 2.0)], schema)
    new = spark.createDataFrame([(None, "new-null", 9.0), (1, "a", 2.0)], schema)
    diff = snapshot_diff(old, new, ["k"])
    rebuilt = apply_snapshot_diff(old, diff, ["k"])
    assert {tuple(r) for r in rebuilt.collect()} == {
        tuple(r) for r in new.collect()
    }
    # NULL-key row deleted outright
    gone = apply_snapshot_diff(
        old, snapshot_diff(old, old.filter("k IS NOT NULL"), ["k"]), ["k"]
    )
    assert {tuple(r) for r in gone.collect()} == {(1, "a", 2.0)}


def test_rollup_hist_state_merges_exactly(spark):
    """hist partial arrays merged across grains equal the direct
    single-pass histogram, bucket by bucket."""
    from chdb_spark.operators.rollup import (
        finalize_states,
        merge_states,
        partial_states,
    )

    ev = table(spark, SF_CORRECT, "events")
    aggs = {"h": ("hist", "value", {"lo": 0.0, "hi": 50.0, "buckets": 8})}
    hourly = partial_states(
        ev, ["event_type", F.date_trunc("hour", "ts").alias("g")], aggs
    )
    merged = merge_states(hourly, ["event_type"], aggs)
    got = dict(finalize_states(merged, aggs).collect())
    direct = dict(
        finalize_states(partial_states(ev, ["event_type"], aggs), aggs).collect()
    )
    assert got == direct and got
    # total mass equals the non-null row count
    n = ev.filter(F.col("value").isNotNull()).count()
    assert sum(sum(v) for v in got.values()) == n


def test_rollup_hist_rejects_bad_grid(spark):
    from chdb_spark.operators.rollup import partial_states

    ev = table(spark, SF_CORRECT, "events")
    with pytest.raises(ValueError, match="hi > lo"):
        partial_states(
            ev, ["event_type"], {"h": ("hist", "value", {"lo": 1, "hi": 1, "buckets": 4})}
        )


def test_leakage_safe_split_cluster_integrity(spark):
    """Every cluster lands in exactly one split; singleton clusters over
    the id column reproduce split_assign exactly."""
    from chdb_spark.operators.text import leakage_safe_split, split_assign

    docs = table(spark, SF_CORRECT, "documents").select(
        "doc_id", F.md5("text").alias("cluster")
    )
    out = leakage_safe_split(docs, "cluster")
    violated = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert violated == 0
    # singleton clusters (cluster == id) degenerate to split_assign
    ids = table(spark, SF_CORRECT, "documents").select("doc_id")
    a = leakage_safe_split(
        ids.withColumn("cluster", F.col("doc_id")), "cluster"
    ).select("doc_id", "split")
    b = split_assign(ids).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hist_psi_properties(spark):
    """PSI(x, x) == 0; PSI grows with a shifted distribution; fold is
    deterministic across partitionings."""
    from chdb_spark.operators.drift import hist_psi
    from chdb_spark.operators.rollup import partial_states

    grid = {"lo": 0.0, "hi": 50.0, "buckets": 10}
    ev = table(spark, SF_CORRECT, "events").filter(F.col("value").isNotNull())
    aggs = {"h": ("hist", "value", grid)}
    h = partial_states(ev, ["event_type"], aggs)
    same = hist_psi(h, h, ["event_type"]).collect()
    assert same and all(r["psi"] == 0.0 for r in same)

    shifted = partial_states(
        ev.withColumn("value", F.col("value") + 10.0), ["event_type"], aggs
    )
    moved = {r["event_type"]: r["psi"] for r in hist_psi(h, shifted, ["event_type"]).collect()}
    assert all(v > 0.05 for v in moved.values())

    h2 = partial_states(ev.repartition(7), ["event_type"], aggs)
    again = {r["event_type"]: r["psi"] for r in hist_psi(h2, shifted, ["event_type"]).collect()}
    assert again == moved


def test_hist_psi_one_sided_group(spark):
    """A group present in only one snapshot (the MOST drifted case) must
    emit a PSI row (full-outer, zero-filled missing side — ADVICE r6),
    with a large finite PSI, not silently vanish."""
    from chdb_spark.operators.drift import hist_psi

    # skewed histograms: a zero-filled missing side smooths to UNIFORM
    # shares, so a uniform present side would (correctly) score PSI 0
    o = spark.createDataFrame(
        [("shared", [10, 0, 0]), ("vanished", [15, 0, 0])],
        "g string, h array<long>",
    )
    n = spark.createDataFrame(
        [("shared", [0, 0, 10]), ("appeared", [27, 0, 0])],
        "g string, h array<long>",
    )
    got = {r["g"]: r["psi"] for r in hist_psi(o, n, ["g"]).collect()}
    assert set(got) == {"shared", "vanished", "appeared"}
    import math

    assert all(math.isfinite(v) for v in got.values())
    assert got["vanished"] > 0.25 and got["appeared"] > 0.25


def test_audio_frame_energy_edges(spark):
    """Tail fragments are dropped (only full frames emitted); payloads
    shorter than one frame produce zero rows; sums are exact."""
    from chdb_spark.multimodal import audio_frame_energy

    rows = [
        (1, bytes(range(250))),   # 2 full frames of 100, 50-byte tail dropped
        (2, bytes([5] * 40)),     # shorter than one frame -> no rows
        (3, bytes([1] * 200)),    # exactly 2 frames
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_id"], r["frame_idx"]): r["frame_sum"]
        for r in audio_frame_energy(media, frame_bytes=100).collect()
    }
    assert got == {
        (1, 0): sum(range(100)),
        (1, 1): sum(range(100, 200)),
        (3, 0): 100,
        (3, 1): 100,
    }


def test_hist_quantile_within_one_bucket(spark):
    """hist_quantile over merged states lands within one bucket width of
    the exact percentile, and is invariant to the merge path."""
    from chdb_spark.operators.rollup import (
        hist_quantile,
        merge_states,
        partial_states,
    )

    lo, hi, nb = 0.0, 50.0, 25
    ev = table(spark, SF_CORRECT, "events").filter(F.col("value").isNotNull())
    aggs = {"h": ("hist", "value", {"lo": lo, "hi": hi, "buckets": nb})}
    hourly = partial_states(
        ev, ["event_type", F.date_trunc("hour", "ts").alias("g")], aggs
    )
    merged = merge_states(hourly, ["event_type"], aggs)
    got = {
        r["event_type"]: r["p50"]
        for r in merged.select(
            "event_type",
            hist_quantile("h", 0.5, lo, hi, nb).alias("p50"),
        ).collect()
    }
    exact = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    width = (hi - lo) / nb
    assert got.keys() == exact.keys()
    for k in got:
        assert abs(got[k] - exact[k]) <= width, (k, got[k], exact[k])
    # direct (unmerged) states give the identical estimate
    direct = partial_states(ev, ["event_type"], aggs)
    got2 = {
        r["event_type"]: r["p50"]
        for r in direct.select(
            "event_type", hist_quantile("h", 0.5, lo, hi, nb).alias("p50")
        ).collect()
    }
    assert got2 == got


# ---------------------------------------------------------------------------
# graph — small-graph lane vs distributed lane
# ---------------------------------------------------------------------------


def test_triangle_stats_lanes_equal(spark):
    """The driver-local small-graph lane and the distributed canonical
    a<b<c join lane return identical rows (counts exact, clustering
    rounded by the same Spark expression), and a known graph has the
    right triangle counts: K4 minus one edge → the two 'hub' corners sit
    in 2 triangles, the others in 1."""
    from chdb_spark.operators.graph import triangle_stats

    # K4 on {1,2,3,4} minus edge (3,4): triangles (1,2,3) and (1,2,4)
    edges = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 1), (1, 4, 1), (2, 3, 1), (2, 4, 1)],
        "src int, dst int, w int",
    )
    small = {tuple(r) for r in triangle_stats(edges, top=10).collect()}
    dist = {
        tuple(r) for r in triangle_stats(edges, top=10, small_edges=0).collect()
    }
    assert small == dist
    tri = {r[0]: r[2] for r in small}
    assert tri == {1: 2, 2: 2, 3: 1, 4: 1}
    deg = {r[0]: r[1] for r in small}
    assert deg == {1: 3, 2: 3, 3: 2, 4: 2}


def test_round_half_up_replica_matches_spark_round(spark):
    """_round_half_up (the BigDecimal-on-shortest-repr replica that lets
    local lanes emit pre-rounded LocalRelations) equals Spark's round()
    on adversarial values: clustering-style ratios, Q-unit ranks, and
    exact .5 boundaries at the target scale."""
    import random

    from chdb_spark.operators.graph import _round_half_up

    random.seed(13)
    vals = []
    for _ in range(500):
        d = random.randint(2, 500)
        t = random.randint(0, d * (d - 1) // 2)
        vals.append(2.0 * t / (d * (d - 1)))
    vals += [random.randint(0, 10**12) / 1e12 for _ in range(500)]
    vals += [i / 2e6 for i in range(200)]  # exact .5 boundaries, scale 6
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for scale in (6, 9):
        got = [r[0] for r in df.select(F.round("x", scale)).collect()]
        assert got == [_round_half_up(v, scale) for v in vals]


def test_graph_stats_hint_lane_matches_probe_lanes(spark):
    """The source-statistics hinted lane (``input_rows`` ≤ threshold skips
    the checkpoint + probe jobs) returns exactly what both runtime lanes
    return, for triangle_stats AND pagerank; a bound ABOVE the threshold
    falls through to the probe pick (still identical), and duplicate /
    reversed raw pairs dedupe the same way the distributed distinct does."""
    from chdb_spark.operators.graph import pagerank, triangle_stats

    # duplicate + reversed pairs: (2,1) and a repeated (1,2) must collapse
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 3), (1, 2, 2), (1, 3, 1), (2, 3, 1), (3, 4, 1)],
        "src int, dst int, w int",
    )
    base_t = {tuple(r) for r in triangle_stats(edges, top=10).collect()}
    hint_t = {
        tuple(r) for r in triangle_stats(edges, top=10, input_rows=6).collect()
    }
    big_hint_t = {
        tuple(r)
        for r in triangle_stats(
            edges, top=10, small_edges=5, input_rows=6
        ).collect()
    }
    assert hint_t == base_t
    assert big_hint_t == base_t

    base_p = sorted(tuple(r) for r in pagerank(edges, iters=3).collect())
    hint_p = sorted(
        tuple(r) for r in pagerank(edges, iters=3, input_rows=6).collect()
    )
    assert hint_p == base_p

    # unweighted transition-stream form: each row counts once; the pandas
    # (hinted) and Spark (distributed) groupings produce the same ranks
    # as the pre-weighted relation carrying those counts
    tr = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 1), (2, 1), (1, 2), (1, 2), (1, 3), (2, 3),
         (3, 4)],
        "src int, dst int",
    )
    w_eq = spark.createDataFrame(
        [(1, 2, 3), (2, 1, 3), (1, 3, 1), (2, 3, 1), (3, 4, 1)],
        "src int, dst int, w int",
    )
    want = sorted(tuple(r) for r in pagerank(w_eq, iters=3).collect())
    got_hint = sorted(
        tuple(r) for r in pagerank(tr, iters=3, input_rows=9).collect()
    )
    got_dist = sorted(
        tuple(r) for r in pagerank(tr, iters=3, small_edges=0).collect()
    )
    assert got_hint == want
    assert got_dist == want

    # top-k parity: the local lane's driver-side (rank_q DESC, k ASC)
    # cut equals the distributed TakeOrdered
    top_hint = [
        tuple(r) for r in pagerank(tr, iters=3, input_rows=9, top=2).collect()
    ]
    top_dist = [
        tuple(r)
        for r in pagerank(tr, iters=3, small_edges=0, top=2)
        .orderBy("rank_q", ascending=False)
        .collect()
    ]
    assert sorted(top_hint) == sorted(top_dist)
    assert len(top_hint) == 2
    assert top_hint == sorted(top_hint, key=lambda t: (-t[1], t[0]))


def test_grouped_weighted_quantile_matches_window_form(spark):
    """Crossing-bucket refinement == the full running-sum formulation:
    first value (ordered by value, weight) whose inclusive cumulative
    weight reaches q * group total — for skewed values, heavy ties, and
    single-bucket (no splits) degenerate bounds."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from chdb_spark.functions.aggregate_ext import grouped_weighted_quantile

    random.seed(7)
    rows = []
    for g in ["a", "b", "c"]:
        for _ in range(500):
            v = random.choice([1.5, 2.5, 2.5, 3.25, 10.0 ** random.randint(0, 4)])
            rows.append((g, v, random.randint(1, 9)))
    df = spark.createDataFrame(rows, "g string, v double, w int")

    def brute(q):
        wspec = (
            Window.partitionBy("g")
            .orderBy("v", "w")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        tw = Window.partitionBy("g")
        return {
            (r["g"],): r["m"]
            for r in df.withColumn("cw", F.sum("w").over(wspec))
            .withColumn("tw", F.sum("w").over(tw))
            .where(F.col("cw") >= F.col("tw") * q)
            .groupBy("g")
            .agg(F.min("v").alias("m"))
            .collect()
        }

    for q in (0.25, 0.5, 0.9):
        for nb in (1, 4, 64):
            got = {
                (r["g"],): r["wquantile"]
                for r in grouped_weighted_quantile(
                    df, "v", "w", ["g"], q=q, extra_order=["w"], n_buckets=nb
                ).collect()
            }
            assert got == brute(q), (q, nb)
        # stats-hinted small-input lane (input_rows <= threshold): one
        # plain grouped-window pass, same hit rule, identical result
        small = {
            (r["g"],): r["wquantile"]
            for r in grouped_weighted_quantile(
                df, "v", "w", ["g"], q=q, extra_order=["w"],
                input_rows=len(rows),
            ).collect()
        }
        assert small == brute(q), ("small lane", q)


def test_pagerank_overflow_guard_fires_in_both_lanes(spark):
    """q_scale * max edge weight must fit int64 — the guard exists in the
    small-graph lane (pandas max) and the distributed lane (agg max), so
    neither can silently wrap."""
    import pytest

    from chdb_spark.operators.graph import pagerank

    heavy = spark.createDataFrame(
        [(1, 2, 10_000_000), (2, 1, 1)], "src int, dst int, w long"
    )
    with pytest.raises(AssertionError, match="overflow"):
        pagerank(heavy, iters=1).collect()
    with pytest.raises(AssertionError, match="overflow"):
        pagerank(heavy, iters=1, small_edges=0).collect()
    # and an empty edge list raises the documented error in both lanes
    empty = spark.createDataFrame([], "src int, dst int, w long")
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(empty, iters=1)
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(empty, iters=1, small_edges=0)


def test_grouped_weighted_quantile_ignores_null_values(spark):
    """NULL values contribute neither value nor weight (aggregate
    semantics, CH quantileExactWeighted); NaN participates and sorts
    greatest. Caught in round 8: counting NULL rows' weight let an
    all-NULL crossing bucket return NULL as the group's quantile."""
    from pyspark.sql import functions as F

    from chdb_spark.functions.aggregate_ext import grouped_weighted_quantile

    rows = [
        ("a", None, 3), ("a", 1.0, 1), ("a", 2.0, 1),
        ("b", float("nan"), 2), ("b", 5.0, 1), ("b", 6.0, 4),
        ("c", None, 1), ("c", float("nan"), 1), ("c", 4.0, 1),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    # n_buckets refinement lanes + the stats-hinted small-input lane
    for lane in ({"n_buckets": 1}, {"n_buckets": 4}, {"n_buckets": 64},
                 {"input_rows": len(rows)}):
        got = {
            r["g"]: r["wquantile"]
            for r in grouped_weighted_quantile(
                df, "v", "w", ["g"], q=0.5, extra_order=["w"], **lane
            ).collect()
        }
        # a: NULL(w3) ignored -> tw=2, target 1 -> 1.0
        # b: order 5.0(cum1), 6.0(cum5), NaN last -> target 3.5 -> 6.0
        # c: NULL ignored -> 4.0(cum1), NaN(cum2) -> target 1 -> 4.0
        assert got == {"a": 1.0, "b": 6.0, "c": 4.0}, (lane, got)


def test_round8_lanes_degenerate_inputs(spark):
    """Empty / single-row / null-text inputs through every round-8 lane:
    the local lanes must degrade exactly like their distributed twins
    (empty results or the same documented error), never crash in numpy
    on a zero-length pull."""
    from chdb_spark.functions import fn as cf
    from chdb_spark.operators.dedup import connected_components
    from chdb_spark.operators.graph import pagerank, triangle_stats
    from chdb_spark.operators.text import perplexity_buckets

    empty_edges = spark.createDataFrame([], "src long, dst long, w long")
    assert triangle_stats(empty_edges).collect() == []
    assert triangle_stats(empty_edges, input_rows=1).collect() == []
    assert triangle_stats(empty_edges, small_edges=0).collect() == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty edge list"):
        pagerank(empty_edges, input_rows=1)
    with _pytest.raises(ValueError, match="empty edge list"):
        pagerank(spark.createDataFrame([], "src long, dst long"), input_rows=1)

    assert connected_components(
        spark.createDataFrame([], "doc_a long, doc_b long")
    ).collect() == []

    short_docs = spark.createDataFrame(
        [(1, "a", True), (2, "", False), (3, None, True)],
        "doc_id long, text string, trusted boolean",
    )
    assert perplexity_buckets(short_docs, F.col("trusted")).collect() == []
    one = spark.createDataFrame(
        [(1, "ab", True)], "doc_id long, text string, trusted boolean"
    )
    rows = perplexity_buckets(one, F.col("trusted")).collect()
    assert len(rows) == 1 and rows[0]["n_bigrams"] == 1

    empty_xy = spark.createDataFrame([], "x double, y double")
    assert cf("rankCorr")(empty_xy, "x", "y").collect()[0]["rank_corr"] is None


def test_perplexity_join_lane_matches_kernel_lane(spark, monkeypatch):
    """Forcing the distributed join lane (model past the driver-pull
    bound — the CJK-alphabet case) returns the same scores and buckets
    as the closure-kernel lane, including non-ASCII text and unseen
    bigrams."""
    import chdb_spark.operators.text as textmod
    from chdb_spark.operators.text import perplexity_buckets

    rows = (
        [(i, "the cat sat on the mat", "good") for i in range(4)]
        + [(10, "日本語のテキストです", "good")]
        + [(20, "zq xv jk 中文 qz", "web"), (21, "the cat sat", "web")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    trusted = F.col("source") == "good"
    kernel = sorted(
        tuple(r) for r in perplexity_buckets(df, trusted).collect()
    )
    monkeypatch.setattr(textmod, "_PPL_MODEL_DRIVER_MAX", 0)
    joined = sorted(
        tuple(r) for r in perplexity_buckets(df, trusted).collect()
    )
    assert kernel == joined


def test_pagerank_null_ids_fall_to_distributed_lane(spark):
    """NULL src/dst edges must not silently vanish (pandas groupby
    dropna) or relabel (float64 promotion) on the local lanes — both the
    stats-hinted and the limit-probe pick fall through to the
    distributed lane, whose Spark groupBy keeps NULL keys."""
    from chdb_spark.operators.graph import pagerank

    rows = [(1, 2), (2, 1), (None, 3), (3, None), (1, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    # distributed reference (lane forced off)
    ref = {
        r["k"]: r["rank_q"]
        for r in pagerank(edges, iters=3, small_edges=0).collect()
    }
    hinted = {
        r["k"]: r["rank_q"]
        for r in pagerank(edges, iters=3, small_edges=100,
                          input_rows=5).collect()
    }
    probed = {
        r["k"]: r["rank_q"]
        for r in pagerank(edges, iters=3, small_edges=100).collect()
    }
    assert hinted == ref and probed == ref
    assert None in ref  # the null vertex survives, matching Spark groupBy
