"""Graph centrality over event streams — PageRank on the page-navigation
graph.

Web-scale data curation ranks hosts/pages by link centrality (Common
Crawl's harmonic/PageRank rankings feed crawl prioritization and quality
weighting; the reference reaches the same shape through iterated SQL over
its engine — chdb exposes no dedicated graph operator either, reference
chdb/datastore/core.py sql() passthrough is how a user would run it).
Spark-first: the edge list is ONE window pass over the event log, each
PageRank iteration is one hash join (ranks × edges) + one hash aggregation
keyed by destination — the classic Pregel contraction expressed as
DataFrame ops so Catalyst/AQE pick broadcast vs shuffle per iteration.

Exactness contract (cl1/t19 lesson): every rank is an int64 in Q-units
(Q = 1e12), updated only with integer multiply / integer divide / integer
sum — no float accumulates anywhere, so results are independent of
partitioning, parallelism, and summation order, and a fully-unrolled SQL
replay in DuckDB must match BIT-EXACTLY. Positive-operand note: Spark's
``div`` truncates toward zero, DuckDB's ``//`` floors — identical on the
non-negative values used here.

Scale posture (100 TB event log):
- Edge derivation: one shuffle keyed by user (the window), then a
  map-side-combining hash agg on (src, dst) — the |pages|² matrix is tiny
  relative to the log.
- Per iteration: `ranks` has one row per NODE (pages/hosts — millions,
  not trillions); edges are persisted once and re-read from memory/disk
  cache; AQE broadcasts `ranks` when it fits, else a shuffle join on src.
- Overflow bound: rank_q ≤ Q = 1e12, so rank_q * edge_weight stays in
  int64 while max edge weight < 9.2e6. Heavier edges: lower Q (the
  parameter exists) or pre-bucket weights; the function asserts the bound.
- Lineage: each iteration deepens the plan by two stages. For iters ≳ 20,
  pass ``checkpoint_every`` to truncate lineage with localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chdb_spark.queries import defquery, table
from chdb_spark.utils import values_relation as _values_relation

Q_SCALE = 10**12

# Cost-based small-graph switch (the same AQE-style runtime pick as
# aggregate_ext.SMALL_INPUT_ROWS_CONF, r5-reconciled pattern): below this
# many edges the iteration state is a few MB and the per-iteration Spark
# job floor (2 shuffle stages × iters) costs more than the whole
# computation — the DERIVED edge relation (already reduced from the raw
# log by the window + (src,dst) agg) is pulled once and iterated with
# exact int64 numpy arithmetic that replays the distributed update
# bit-for-bit. Above it, the distributed join+agg iteration is the only
# shape that scales (millions of nodes). Set the conf to 0 to force the
# distributed shape (plan tests pin both).
SMALL_GRAPH_EDGES_CONF = "spark.chdb_spark.graph.smallEdges"
SMALL_GRAPH_EDGES_DEFAULT = 200_000


def _small_graph_threshold(df: DataFrame, override: int | None) -> int:
    if override is not None:
        return int(override)
    try:
        return int(
            df.sparkSession.conf.get(
                SMALL_GRAPH_EDGES_CONF, str(SMALL_GRAPH_EDGES_DEFAULT)
            )
        )
    except Exception:
        return SMALL_GRAPH_EDGES_DEFAULT


def page_graph_edges(
    events: DataFrame,
    user_col: str = "user_id",
    # variant parse (Spark 4) over get_json_object: same extracted value,
    # measurably faster single-path extraction on the raw log scan
    key_expr: str = "try_variant_get(parse_json(props), '$.k', 'bigint')",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    weighted: bool = True,
) -> DataFrame:
    """Per-user consecutive page transitions → weighted directed edges
    (src, dst, w). Self-loops dropped (they only re-scale the diagonal).
    One user-keyed window shuffle + one (src, dst) hash agg.

    ``weighted=False`` skips the (src, dst) aggregation and returns the
    raw transition stream (src, dst) — for consumers that deduplicate
    anyway (triangle_stats' undirected distinct), the agg is a pure
    extra shuffle: distinct over the transition stream is one exchange
    where groupBy-then-distinct is two."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    keyed = events.select(
        F.col(user_col), F.col(ts_col), F.col(tiebreak), F.expr(key_expr).alias("_k")
    ).where(F.col("_k").isNotNull())
    transitions = (
        keyed.withColumn("_prev", F.lag("_k").over(w))
        .where(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_k")))
        .select(F.col("_prev").alias("src"), F.col("_k").alias("dst"))
    )
    if not weighted:
        return transitions
    return transitions.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("w")
    )


def _pagerank_local(
    spark, pdf, iters: int, q_scale: int, top: int | None = None
) -> DataFrame:
    """Small-graph lane of :func:`pagerank` — replays the distributed
    update bit-for-bit in int64 numpy on the (already reduced, already
    measured ≤ threshold) edge relation. Operands are non-negative, so
    numpy floor division equals Spark's truncating ``div``; ``np.add.at``
    sums in exact int64. The final ``rank`` double is the identical
    ``r / Q`` IEEE division rounded by the HALF_UP replica
    (:func:`_round_half_up`), emitted as a pre-computed LocalRelation —
    the lane-equality property test pins it against the distributed
    lane's Spark ``round``."""
    import numpy as np
    import pandas as pd

    max_w = int(pdf["w"].max())
    assert q_scale * max_w < 2**63, (
        f"rank_q * weight would overflow int64 (max_w={max_w}); lower q_scale"
    )
    ks = np.unique(np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()]))
    n = len(ks)
    pos = pd.Series(np.arange(n, dtype=np.int64), index=ks)
    src = pos[pdf["src"].to_numpy()].to_numpy()
    dst = pos[pdf["dst"].to_numpy()].to_numpy()
    w = pdf["w"].to_numpy(dtype=np.int64)
    # per-src out-weight, exact int64 (the distributed lane's outw agg)
    out_sums = np.zeros(n, dtype=np.int64)
    np.add.at(out_sums, src, w)
    out_w = out_sums[src]
    tele = np.int64((15 * q_scale) // (100 * n))
    r = np.full(n, q_scale // n, dtype=np.int64)
    for _ in range(iters):
        contrib = (r[src] * w) // out_w
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, contrib)
        r = tele + (np.int64(85) * s) // np.int64(100)
    # pre-rounded LocalRelation (see _round_half_up): rank_q / Q is the
    # same double division the distributed lane's expression performs;
    # `top` sorts the exact integers driver-side (rank_q DESC, k ASC)
    pairs = sorted(
        ((int(k), int(rq)) for k, rq in zip(ks, r)),
        key=lambda t: (-t[1], t[0]),
    )
    if top is not None:
        pairs = pairs[:top]
    rows = [(k, rq, _round_half_up(rq / float(q_scale), 9)) for k, rq in pairs]
    cols = [("k", "BIGINT"), ("rank_q", "BIGINT"), ("rank", "DOUBLE")]
    if len(rows) <= 1024:  # zero-task collect; SQL text scales with rows
        return _values_relation(spark, rows, cols)
    return spark.createDataFrame(
        rows, "k bigint, rank_q bigint, rank double"
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    q_scale: int = Q_SCALE,
    checkpoint_every: int | None = 8,
    small_edges: int | None = None,
    input_rows: int | None = None,
    top: int | None = None,
) -> DataFrame:
    """Integer-exact PageRank (damping 0.85 as the rational 85/100) over a
    weighted directed edge list (src, dst, w).

    Per node k: r_0 = Q div n;  r_{i+1} = tele + (85 * S_i(k)) div 100
    where tele = (15 * Q) div (100 * n) and S_i(k) = Σ over in-edges
    (r_i(src) * w) div out_w(src). Dangling-node mass is dropped (the
    standard "weakly preferential" variant — documented, mirrored by the
    oracle). Returns (k, rank_q BIGINT, rank DOUBLE = rank_q / Q).

    Iteration shape (VERDICT r6 #3 — shave the per-job floor): a node with
    no in-edges receives no contribution, so its rank is the CONSTANT
    ``tele`` on every iteration ≥ 1. That lane is built ONCE (``no_in``,
    node-sized, one anti-join) and unioned in, so each iteration is
    exactly one ranks×edges join + one dst-keyed agg — the per-iteration
    nodes left-join of the old shape is gone.

    ``checkpoint_every=8``: lineage truncation is for DEEP runs only. A
    same-session A/B at sf0.1 (iters=5) measured eager mid-loop
    checkpoints + an eager ``no_in`` at median 2.31 s vs 2.11 s fully
    lazy — each eager localCheckpoint is a blocking job that costs more
    than the lazy stages it truncates until the plan is genuinely deep.
    Catalyst handles a ~16-stage plan fine; past ~8 iterations plan
    compile time and executor-plan size start growing superlinearly
    (SCALE.md round-4 lesson), which is where truncation pays.

    ``small_edges`` (default: the ``spark.chdb_spark.graph.smallEdges``
    conf, 200k) is the cost-based switch to the driver-local int64-exact
    iteration lane for small derived graphs — see
    :data:`SMALL_GRAPH_EDGES_CONF`; 0 forces the distributed shape.

    ``input_rows``: caller-supplied upper bound on the edge count from
    SOURCE statistics (parquet footer row counts / catalog stats — see
    queries.table_rows_upper_bound). When the bound itself is ≤ the
    small-graph threshold, the lane is decided WITHOUT the checkpoint +
    limit-probe jobs: one job pulls the (statically known small) edge
    relation straight into the local lane. This is ordinary cost-based
    planning from table statistics — the runtime probe remains the
    fallback when no bound is known.

    ``edges`` may also be an UNWEIGHTED transition stream (no ``w``
    column — e.g. ``page_graph_edges(weighted=False)``): each row then
    counts as one transition, grouped to the identical weighted relation
    (in pandas on the hinted small lane — saving the agg exchange in the
    pull plan — or by a Spark groupBy on the distributed lane).

    ``top``: keep only the ``top`` nodes by (rank_q DESC, k ASC) — the
    same operator-level top-k triangle_stats exposes. On the local lane
    the exact-integer sort happens driver-side (the result stays a
    zero-task LocalRelation); distributed, it is one TakeOrdered.
    """
    thr = _small_graph_threshold(edges, small_edges)
    if thr > 0 and input_rows is not None and 0 < input_rows <= thr:
        if "w" in edges.columns:
            probe = edges.select(
                "src", "dst", F.col("w").cast("long").alias("w")
            ).toPandas()
        else:
            # transition-stream form (page_graph_edges(weighted=False)):
            # the (src, dst) count-aggregation happens HERE in pandas —
            # the same grouped relation the weighted form carries, minus
            # its exchange in the pull plan (one shuffle instead of two)
            raw = edges.select("src", "dst").toPandas()
            if not raw.isnull().values.any():
                probe = (
                    raw.groupby(["src", "dst"], sort=False)
                    .size()
                    .rename("w")
                    .reset_index()
                )
            else:
                probe = raw  # null keys → distributed fall-through below
        # NULL src/dst: pandas groupby drops NULL keys (dropna default)
        # and toPandas null-promotion turns int64 ids into float64 —
        # both diverge from the distributed lane's Spark groupBy, which
        # keeps NULL keys. Same guard as connected_components
        # (dedup.py): fall through to the distributed lane.
        if len(probe) > 0 and not probe.isnull().values.any():
            return _pagerank_local(
                edges.sparkSession, probe, iters, q_scale, top
            )
        if len(probe) == 0:
            raise ValueError("pagerank: empty edge list")
    if "w" not in edges.columns:
        # distributed lane needs the grouped weighted form
        edges = edges.groupBy("src", "dst").agg(
            F.count("*").cast("long").alias("w")
        )
    # Checkpoint the DERIVED edge list first (one pass over the raw log —
    # without this, the outw aggregate and the join probe each re-derive
    # the edge lineage unless exchange reuse happens to fire), then hang
    # everything off the materialized blocks. localCheckpoint, not
    # persist: the blocks are ContextCleaner-released when the plan is
    # GC'd (the repo's r6 caching policy — no session-long cache
    # accumulation across a 200-query run).
    edges_m = edges.select(
        "src", "dst", F.col("w").cast("long").alias("w")
    ).localCheckpoint(eager=True)
    # Limit-probe lane pick: ONE small job over the checkpointed blocks
    # both decides the lane and (small case) delivers the whole edge set —
    # limit(thr+1) returns every row when the relation has ≤ thr, and the
    # pull is bounded by thr+1 rows either way.
    if thr > 0:
        probe = edges_m.limit(thr + 1).toPandas()
        if len(probe) == 0:
            raise ValueError("pagerank: empty edge list")
        # same NULL guard as the hinted lane above (and dedup.py's
        # connected_components): null ids stay on the distributed lane
        if len(probe) <= thr and not probe.isnull().values.any():
            return _pagerank_local(edges_m.sparkSession, probe, iters, q_scale, top)
    max_w, n_edges = edges_m.agg(F.max("w"), F.count("*")).first()
    if max_w is None:
        raise ValueError("pagerank: empty edge list")
    assert q_scale * max_w < 2**63, (
        f"rank_q * weight would overflow int64 (max_w={max_w}); lower q_scale"
    )
    outw = edges_m.groupBy("src").agg(F.sum("w").cast("long").alias("out_w"))
    e = (
        edges_m.join(outw, "src")
        .select("src", "dst", "w", "out_w")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("k"))
        .union(e.select(F.col("dst").alias("k")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    tele = (15 * q_scale) // (100 * n)
    # nodes with no in-edge: rank is exactly `tele` from iteration 1 on —
    # computed once, unioned into every iteration's result (node-sized,
    # one anti-join job; replaces `iters` per-iteration left joins)
    # lazy: used once per iteration in the final plan; exchange reuse
    # dedupes the anti-join, and an eager checkpoint here measured as a
    # net loss at iters=5 (see docstring A/B)
    no_in = (
        nodes.join(e.select(F.col("dst").alias("k")).distinct(), "k", "left_anti")
        .select("k", F.lit(tele).cast("long").alias("r"))
    )
    ranks = nodes.select("k", F.lit(q_scale // n).cast("long").alias("r"))
    for i in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["k"])
            .select(F.col("dst").alias("k"), F.expr("(r * w) div out_w").alias("c"))
            .groupBy("k")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        # every node WITH in-edges appears in contrib (it received ≥1
        # contribution), so contrib ∪ no_in covers all nodes exactly once
        ranks = contrib.select(
            "k",
            (F.lit(tele) + F.expr("(85 * s) div 100")).cast("long").alias("r"),
        ).unionAll(no_in)
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select(
        "k",
        F.col("r").alias("rank_q"),
        F.round(F.col("r") / F.lit(float(q_scale)), 9).alias("rank"),
    )
    if top is not None:
        out = out.orderBy(F.desc("rank_q"), "k").limit(top)
    return out


def _pr1_oracle_sql(iters: int = 5) -> str:
    """pr1 oracle: edge derivation + every PageRank iteration unrolled as
    one CTE pair per step (t19/cl1 pattern). All-integer updates make the
    replay exact regardless of DuckDB vs Spark parallelism."""
    q = Q_SCALE
    parts = [
        """WITH ev AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE json_extract(props, '$.k') IS NOT NULL
    )""",
        """seq AS (
      SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_k
      FROM ev
    )""",
        """edges AS (
      SELECT prev_k AS src, k AS dst, count(*) AS w
      FROM seq WHERE prev_k IS NOT NULL AND prev_k <> k
      GROUP BY src, dst
    )""",
        """outw AS (
      SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY src
    )""",
        """e AS (
      SELECT edges.src, edges.dst, CAST(edges.w AS BIGINT) AS w, outw.out_w
      FROM edges JOIN outw USING (src)
    )""",
        """nodes AS (
      SELECT src AS k FROM e UNION SELECT dst FROM e
    )""",
        f"""c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {q} // CAST(count(*) AS BIGINT) AS r0,
             (15 * {q}) // (100 * CAST(count(*) AS BIGINT)) AS tele
      FROM nodes
    )""",
        "r0 AS (SELECT nodes.k, c.r0 AS r FROM nodes CROSS JOIN c)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (
      SELECT n.k, c.tele + (85 * COALESCE(s.s, 0)) // 100 AS r
      FROM nodes n CROSS JOIN c
      LEFT JOIN (
        SELECT e.dst AS k, CAST(sum((r.r * e.w) // e.out_w) AS BIGINT) AS s
        FROM e JOIN r{i-1} r ON r.k = e.src
        GROUP BY e.dst
      ) s ON s.k = n.k
    )"""
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT k, CAST(r AS BIGINT) AS rank_q,
           round(r / {float(q)}, 9) AS rank
    FROM r{iters}
    ORDER BY rank_q DESC, k LIMIT 20"""
    )


@defquery(
    "pr1_pagerank",
    _pr1_oracle_sql(),
    doc="PageRank (5 integer-exact iterations, damping 85/100) over the "
        "per-user page-navigation graph derived from events.props.k — the "
        "link-centrality quality signal of web-curation pipelines. One "
        "user-keyed window pass builds the weighted edge list; each "
        "iteration is one ranks×edges hash join plus a dst-keyed agg with "
        "all arithmetic in int64 Q-units, so the fully-unrolled SQL replay "
        "matches bit-exactly. Top-20 pages by final rank.",
)
def pr1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table_rows_upper_bound

    ev = table(spark, sf_dir, "events")
    # events row count (parquet footers) bounds the derived edge count —
    # the free catalog statistic that lets pagerank skip the probe job;
    # the unweighted transition stream lets the small lane group in
    # pandas (one shuffle in the pull plan instead of two); top=20 keeps
    # the local lane a zero-task LocalRelation (sorted driver-side)
    return pagerank(
        page_graph_edges(ev, weighted=False), iters=5,
        input_rows=table_rows_upper_bound(sf_dir, "events"),
        top=20,
    )


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Directed weighted edges → distinct undirected (u < v) pairs."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )


def _round_half_up(x: float, scale: int) -> float:
    """Python replica of Spark's ``round(double, scale)``: Spark goes
    ``BigDecimal.valueOf(x)`` (``Double.toString``) → ``setScale(HALF_UP)``
    → ``doubleValue()``. Python ``repr`` emits the SHORTEST round-trip
    decimal; ``Double.toString`` is only guaranteed shortest on JDK 19+
    (JDK-4511638) — on older JVMs (this environment runs JDK 17) it may
    emit non-minimal digits, so the digit-for-digit equivalence is
    environment-dependent rather than spec-guaranteed. A 300k-value fuzz
    on JDK 17 found no value-level divergence after quantize, and
    ``test_round_half_up_replica_matches_spark_round`` re-fuzzes the replica
    against Spark's own ``round()`` on every test run, so a JVM where the
    equivalence breaks fails loudly instead of silently diverging.
    Replicated so the driver-local lanes can emit pre-rounded
    LocalRelations (zero-task collect) instead of paying a Spark job for
    one round() projection; the lane-equality property tests (random
    graphs, both lanes) also guard it end-to-end."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
        )
    )


def _triangle_stats_local(spark, pdf, top: int) -> DataFrame:
    """Small-graph lane of :func:`triangle_stats` — the same canonical
    a<b<c two-join formulation, replayed as pandas merges on the (already
    reduced, already measured ≤ threshold) undirected edge list. Counts
    are exact integers; the clustering division is the same IEEE ops as
    the distributed lane's expression and the round is the HALF_UP
    replica above, so the returned relation is a pre-sorted LocalRelation
    (Catalyst folds it; collect runs driver-side with no job)."""
    import pandas as pd  # noqa: F401 — concat/merge below

    ab = pdf.rename(columns={"u": "a", "v": "b"})
    bc = pdf.rename(columns={"u": "b", "v": "c"})
    ac = pdf.rename(columns={"u": "a", "v": "c"})
    tri = ab.merge(bc, on="b").merge(ac, on=["a", "c"])
    corners = pd.concat([tri["a"], tri["b"], tri["c"]]).value_counts()
    deg = pd.concat([pdf["u"], pdf["v"]]).value_counts()
    out = pd.DataFrame(
        {
            "k": deg.index.to_numpy(),
            "degree": deg.to_numpy(),
            "triangles": corners.reindex(deg.index, fill_value=0).to_numpy(),
        }
    )
    # top-k selection on the EXACT integer sort keys happens here in
    # pandas (same (triangles DESC, k ASC) total order — k is unique), so
    # only `top` pre-sorted rows cross into the LocalRelation
    out = out.sort_values(
        ["triangles", "k"], ascending=[False, True], kind="mergesort"
    ).head(top)
    rows = [
        (
            int(k),
            int(d),
            int(t),
            # same op order as the distributed expression:
            # (2.0 * T) / (d * (d - 1)), both IEEE double
            _round_half_up(2.0 * int(t) / (int(d) * (int(d) - 1)), 6)
            if d >= 2
            else 0.0,
        )
        for k, d, t in zip(out["k"], out["degree"], out["triangles"])
    ]
    cols = [
        ("k", "BIGINT"), ("degree", "BIGINT"),
        ("triangles", "BIGINT"), ("clustering", "DOUBLE"),
    ]
    if len(rows) <= 1024:  # zero-task collect (see _values_relation)
        return _values_relation(spark, rows, cols)
    return spark.createDataFrame(
        rows, "k bigint, degree bigint, triangles bigint, clustering double"
    )


def triangle_stats(
    edges: DataFrame,
    top: int = 20,
    small_edges: int | None = None,
    input_rows: int | None = None,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    undirected version of a directed edge list; top ``top`` nodes by
    (triangles DESC, k ASC).

    The node-iterator join with canonical ordering (a < b < c): edge
    (a,b) ⋈ edge (b,c) ⋈ edge (a,c) counts each triangle exactly once —
    two shuffle joins keyed by node id, the standard distributed
    formulation (no per-node adjacency materialization, no driver
    state). Each triangle credits all three corners via one explode;
    degree comes from one hash agg over both edge endpoints.
    ``small_edges``: same cost-based driver-local switch as
    :func:`pagerank` (``spark.chdb_spark.graph.smallEdges``; 0 forces
    the distributed shape).
    clustering = 2·T / (deg·(deg−1)) — exact integers into one IEEE
    division, identical on the SQL side. Skew note: a celebrity node's
    candidate wedges concentrate on its id; AQE skew-join splitting
    handles it, and the canonical a<b<c orientation already halves
    wedge counts vs the naive formulation.

    ``input_rows``: source-statistics upper bound on the edge count
    (see :func:`pagerank`). A bound ≤ the threshold skips the
    checkpoint + probe jobs AND the distinct exchange: the raw pair
    stream (≤ input_rows rows by the bound) is pulled in one job and
    deduplicated in pandas — the same distinct the distributed lane
    computes, on a relation already measured driver-safe.
    """
    thr = _small_graph_threshold(edges, small_edges)
    if thr > 0 and input_rows is not None and 0 < input_rows <= thr:
        pairs = (
            edges.select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
            )
            .where(F.col("u") < F.col("v"))
            .toPandas()
            .drop_duplicates()
        )
        return _triangle_stats_local(edges.sparkSession, pairs, top)
    # three branches of one job read the edge list — checkpoint once
    # (ContextCleaner-released; no session-long cache growth)
    e = undirected_edges(edges).localCheckpoint(eager=True)
    if thr > 0:
        # limit-probe lane pick (see pagerank): one job decides the lane
        # and delivers the small-lane edge set
        probe = e.limit(thr + 1).toPandas()
        if len(probe) <= thr:
            return _triangle_stats_local(e.sparkSession, probe, top)
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    deg = (
        e.select(F.col("u").alias("k"))
        .union(e.select(F.col("v").alias("k")))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    out = (
        deg.join(per_node, "k", "left")
        .select(
            "k",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(0.0),
                6,
            ).alias("clustering"),
        )
        .orderBy(F.desc("triangles"), "k")
        .limit(top)
    )
    return out


@defquery(
    "tc1_triangle_stats",
    """
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE json_extract(props, '$.k') IS NOT NULL
    ),
    seq AS (
      SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_k
      FROM ev
    ),
    dedges AS (
      SELECT DISTINCT least(prev_k, k) AS u, greatest(prev_k, k) AS v
      FROM seq WHERE prev_k IS NOT NULL AND prev_k <> k
    ),
    e AS (SELECT u, v FROM dedges WHERE u < v),
    tri AS (
      SELECT ab.u AS a, ab.v AS b, bc.v AS c
      FROM e ab
      JOIN e bc ON ab.v = bc.u
      JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
    ),
    corners AS (
      SELECT corner AS k, count(*) AS triangles
      FROM tri, LATERAL unnest([a, b, c]) AS t(corner)
      GROUP BY corner
    ),
    deg AS (
      SELECT k, count(*) AS degree
      FROM (SELECT u AS k FROM e UNION ALL SELECT v FROM e)
      GROUP BY k
    )
    SELECT deg.k AS k, CAST(deg.degree AS BIGINT) AS degree,
           CAST(COALESCE(corners.triangles, 0) AS BIGINT) AS triangles,
           round(CASE WHEN deg.degree >= 2
                 THEN 2.0 * COALESCE(corners.triangles, 0)
                      / (deg.degree * (deg.degree - 1))
                 ELSE 0.0 END, 6) AS clustering
    FROM deg LEFT JOIN corners ON corners.k = deg.k
    ORDER BY triangles DESC, k LIMIT 20
    """,
    doc="per-node triangle counts + local clustering coefficient over the "
        "undirected page-navigation graph (pr1's edge list) — the "
        "graph-quality signal (link-farm detection: abnormally dense "
        "neighborhoods) next to PageRank's centrality. Canonical a<b<c "
        "node-iterator joins count each triangle once; all counts exact "
        "integers, one identical IEEE division per node. Top-20 by "
        "triangle count.",
)
def tc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table_rows_upper_bound

    ev = table(spark, sf_dir, "events")
    # unweighted transitions: triangle_stats deduplicates anyway, so the
    # (src, dst) agg would be a pure extra shuffle; the parquet row count
    # bounds the transition count for the stats-hinted lane pick
    return triangle_stats(
        page_graph_edges(ev, weighted=False), top=20,
        input_rows=table_rows_upper_bound(sf_dir, "events"),
    )
