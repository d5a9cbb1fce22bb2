"""Plan-shape assertions — the Spark analogue of the reference's SQL-snapshot
tests (AGENTS.md:119-126 asserts exact SQL substrings; here we assert the
physical-plan properties that carry the 100 TB posture):

* filters reach the parquet scan (PushedFilters),
* scans read only referenced columns (ReadSchema pruning),
* dimension joins broadcast (BroadcastHashJoin, never CartesianProduct),
* TPC-H plans stay entirely JVM-side (no *EvalPython nodes),
* hot paths run inside WholeStageCodegen.

These tests catch silent plan regressions: a dropped broadcast() hint or a
cast that blocks pushdown changes the plan string long before it changes
sf0.01 timings.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from chdb_spark.queries import all_queries
from tests.conftest import SF_CORRECT

_QUERIES = all_queries()


@pytest.fixture(autouse=True)
def _pin_bucketed_shape(spark):
    """Plan-shape tests assert the AT-SCALE plan: disable the cost-based
    small-input switch (which would legitimately plan a plain window on
    test-scale inputs) so the bucketed two-phase shape is what we pin.
    The switch itself is pinned separately in
    tests/test_aggregate_ext.py::test_small_input_switch*."""
    from chdb_spark.functions.aggregate_ext import SMALL_INPUT_ROWS_CONF

    spark.conf.set(SMALL_INPUT_ROWS_CONF, "0")
    yield
    spark.conf.unset(SMALL_INPUT_ROWS_CONF)


def plan_of(spark, name: str, mode: str = "formatted") -> str:
    df = _QUERIES[name].spark(spark, SF_CORRECT)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q1_filter_pushed_and_columns_pruned(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # scan must NOT read join keys it doesn't need
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q3_broadcasts_dimension_no_cartesian(spark):
    plan = plan_of(spark, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q5_all_dims_broadcast(spark):
    plan = plan_of(spark, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3  # region, nation, supplier/customer
    assert "CartesianProduct" not in plan


def test_tpch_plans_have_no_python_nodes(spark):
    names = ("q1_pricing_summary", "q5_region_revenue", "q9_product_profit",
             "q18_large_orders", "q21_waiting_suppliers")
    for name in names:
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, f"{name} crossed into Python"
    # AQE wraps the whole plan until execution, hiding codegen stages from
    # both explain modes — inspect the static plan with AQE off.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in names:
            cg = plan_of(spark, name, mode="codegen")
            assert "Found 0" not in cg, f"{name} lost codegen"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_count_star_reads_no_data_columns(spark):
    plan = plan_of(spark, "cb1_count_star")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    # count(*) needs row counts only: schema is the empty struct
    assert "struct<>" in read_schema


def test_semi_anti_joins_for_exists(spark):
    """q21's r11 rewrite: the EXISTS/NOT-EXISTS pair of shuffled semi/anti
    joins collapsed into ONE lineitem groupBy (min/max late-supplier
    bounds) + a single LeftSemi against the qualifying orders — lineitem
    shuffles once, not three times (BASELINE §O: 2.28 s → 1.12 s at
    sf0.5, oracle-equal)."""
    plan = plan_of(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" not in plan  # anti join replaced by the min/max agg
    # the min/max bounds aggregate is the device that replaced the joins
    assert "min(l_suppkey" in plan and "max(l_suppkey" in plan


def test_dedup_inverted_index_no_cartesian(spark):
    plan = plan_of(spark, "dd4_ngram_jaccard_blocked")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_single_window_exchange(spark):
    """The funnel must shuffle on user_id once (plus the final tiny agg) —
    the per-step self-join shape it replaced had 2 joins x 2 exchanges."""
    plan = plan_of(spark, "e1_window_funnel")
    assert "Window" in plan
    assert "Join" not in plan  # no self-joins anywhere in the funnel


def test_ts_suite_no_python_nodes(spark):
    """Every time-series query is pure window/agg algebra — no Python may
    appear in the row path (EWM closed form included)."""
    for name in ("ts1_rolling_avg", "ts2_expanding_max", "ts3_resample_15min",
                 "ts4_interpolate_linear", "ts5_ewm_mean", "mo1_merge_ordered"):
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_ts_windows_share_one_exchange(spark):
    """ts4 uses two frames (backward + forward) over the same user_id
    partitioning — that must cost ONE hashpartitioning exchange, with both
    window nodes downstream of it."""
    plan = plan_of(spark, "ts4_interpolate_linear")
    assert plan.count("Exchange (") == 1, plan
    assert plan.count("Window (") == 2, plan


def test_q2_single_lineitem_scan(spark):
    """The min-per-part rewrite must not re-read lineitem for the min join
    (the old self-join shape scanned it twice)."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert plan.count("lineitem.parquet") <= 1 or plan.count("Scan parquet") <= 5
    assert "BroadcastHashJoin" in plan


def test_knn_feature_stage_is_map_only(spark):
    """knn scoring happens in one mapInPandas stage; the only exchanges
    after it are the candidate window's."""
    plan = plan_of(spark, "s1_knn_bruteforce")
    assert "MapInPandas" in plan
    # no join anywhere: the broadcast happens via SparkContext, not a plan node
    assert "Join" not in plan


def test_pack_documents_window_is_partitioned(spark):
    """t6 packing must never run a global unpartitioned window — at corpus
    scale that serializes every row through one reducer. The plan's window
    spec must carry a partition key (shard_id), and the single exchange must
    be a hashpartitioning, not SinglePartition."""
    plan = plan_of(spark, "t6_pack_documents")
    assert "Window" in plan
    assert "SinglePartition" not in plan, plan
    assert "shard_id" in plan


def test_dd4_no_forced_corpus_broadcast(spark):
    """dd4's per-doc metadata grows with the corpus — it must reach the
    join WITHOUT an explicit broadcast hint. With the auto-broadcast
    threshold disabled, a hint-free plan has zero BroadcastExchange nodes;
    a forced F.broadcast would survive the threshold and fail this."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "dd4_ngram_jaccard_blocked")
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_t7_gopher_windows_partitioned_no_cartesian(spark):
    """t7's bigram repetition pass: the lead() window and both aggregates
    must partition on doc_id (never a global window), and the features-to-
    shares join must not degrade to a cartesian/nested-loop product."""
    plan = plan_of(spark, "t7_gopher_filters")
    assert "Window" in plan
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_m1_multimodal_single_python_stage(spark):
    """m1 synthesize+decode: exactly the two Arrow Python crossings the
    design declares (pandas_udf synth, mapInPandas decode) and no shuffle
    between them — payloads must never be exchanged."""
    plan = plan_of(spark, "m1_multimodal_pipeline")
    assert "MapInPandas" in plan and "ArrowEvalPython" in plan
    # synthesis and decode run back-to-back with no exchange in between:
    # the only exchange in the whole plan is the final orderBy's range
    # partitioning — payload bytes are never hash-shuffled.
    assert plan.count("rangepartitioning") == 1, plan
    assert "hashpartitioning" not in plan, plan
    # decode's scan reads ONLY doc_id (payloads are synthesized, text unread)
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read_schema and "doc_id" in read_schema


def test_s2_ivf_probe_join_broadcasts_probes_not_corpus(spark):
    """s2's probe join: the bounded (query, cell) probe relation is the
    broadcast side; the cell-assigned corpus must arrive as a plain child
    (no corpus-sized broadcast)."""
    plan = plan_of(spark, "s2_ann_ivf")
    assert "BroadcastHashJoin" in plan
    # exactly one broadcast-exchange NODE (formatted explain prints each
    # node twice — tree line "BroadcastExchange (n)" + detail section):
    # the probes broadcast; the cell-assigned corpus streams as the child.
    assert plan.count("BroadcastExchange (") == 1, plan


def test_all_queries_plan_hygiene(spark):
    """Corpus-wide plan sweep: NO query may plan a CartesianProduct, and a
    GLOBAL window (sort-only spec — every row through one reducer) is
    allowed only when its input is bounded by construction:
      * `_bk`-ordered windows — bucket totals from _bucketed_cumsum,
        <= n_buckets rows by definition;
      * the allowlisted queries below, each documenting its bound.
    BroadcastNestedLoopJoin is allowed only as the 1-row scalar
    crossJoin(broadcast(...)) pattern — approximated here by allowlist.
    """
    import re

    GLOBAL_WINDOW_OK = {
        "mo1_merge_ordered",   # day-grain: rows bounded by date range
        "t9_vocab_coverage",   # cumsum over the top-50 rows only
        "w3_event_deltas",     # day-grain event deltas (bounded days)
    }
    for name in sorted(_QUERIES):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        if name in GLOBAL_WINDOW_OK:
            continue
        for spec in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            head = spec.group(1).split(",")[0].strip()
            is_global = "ASC" in head or "DESC" in head
            if is_global:
                assert head.startswith("_bk"), (
                    f"{name} plans a global window over {head!r} — either "
                    "partition it, route it through _bucketed_cumsum, or "
                    "document the bound and allowlist it here"
                )


def test_dd8_semantic_decontamination_is_map_only(spark):
    """The scoring stage must be one Arrow pass over the training scan —
    no shuffle exchange before the mapInPandas node, no join."""
    plan = plan_of(spark, "dd8_semantic_decontamination")
    assert "Join" not in plan  # benchmark travels as a numpy broadcast
    score_part = plan.split("MapInPandas")[0]
    assert "Exchange hashpartitioning" not in score_part


def test_t11_blocklist_filter_broadcast_anti_join(spark):
    plan = plan_of(spark, "t11_blocklist_filter")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the corpus side must not exchange for the filter itself
    anti_part = plan.split("LeftAnti")[0]
    assert "Exchange hashpartitioning" not in anti_part


def test_ch5_limit_by_single_window(spark):
    """CH LIMIT n BY → one window over one hash exchange on the BY key
    (plus the final ORDER BY range exchange), not per-group sub-plans."""
    plan = plan_of(spark, "ch5_dialect_limit_by")
    assert plan.count("Window (") == 1
    assert plan.count("hashpartitioning(o_custkey") == 1


def test_t10_domain_mix_single_agg_no_join_shuffle(spark):
    """Mixing plan = one source-keyed hash agg; the weight map is a literal
    (no join at all). Only the final ORDER BY adds a range exchange."""
    plan = plan_of(spark, "t10_domain_mix")
    assert "Join" not in plan
    assert plan.count("hashpartitioning(source") == 1  # the groupBy(source)


def test_q11_reuses_one_lineitem_scan(spark):
    """q11's threshold folds per-supplier partials — at runtime AQE must
    serve the second use of the aggregate from ReusedExchange, not a
    second scan pipeline (reuse is a runtime decision under AQE, so the
    executed plan is the thing to assert on)."""
    df = _QUERIES["q11_important_suppliers"].spark(spark, SF_CORRECT)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed or "ReusedSubquery" in executed


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """write_bucketed pre-pays the shuffle: a key-equi-join of two tables
    bucketed on the join key must contain NO Exchange (the 100 TB
    amortization story — SCALE.md Joins)."""
    from pyspark.sql import functions as F

    from chdb_spark.operators.skew import write_bucketed

    prev_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    orders = spark.range(1000).selectExpr("id AS o_orderkey", "id % 7 AS o_p")
    items = spark.range(3000).selectExpr(
        "id % 1000 AS l_orderkey", "id AS l_id", "CAST(id AS DOUBLE) AS l_v"
    )
    write_bucketed(orders, "bk_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(items, "bk_lineitem", ["l_orderkey"], n_buckets=8)
    try:
        joined = (
            spark.table("bk_lineitem")
            .join(
                spark.table("bk_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_p")
            .agg(F.sum("l_v").alias("s"))
        )
        # defeat AQE's broadcast upgrade so the bucketed SMJ shape is visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result is right
        got = {r.o_p: r.s for r in joined.collect()}
        assert len(got) == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_orders")
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")


def test_t13_dsir_bucket_weights_broadcast(spark):
    plan = plan_of(spark, "t13_dsir_weights")
    # the <=64-row bucket-weight table must come back as a broadcast join,
    # never a shuffle of the full per-doc relation
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_t14_perplexity_kernel_no_explode_no_global_window(spark):
    import re

    plan = plan_of(spark, "t14_perplexity_buckets")
    # no per-bigram row stream (Generate/explode) anywhere in the final
    # plan — the vocabulary-bounded model is a broadcast int64 table
    # inside the Arrow-batched kernel (pinned on the scored sub-plan
    # below; the ranked checkpoint truncates it out of the final plan)
    assert "Generate" not in plan
    # tercile ranks come from the bucketed two-phase form: any sort-ordered
    # window must be _bk-bucket-local, not a global single-reducer sort
    for spec in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.group(1).split(",")[0].strip()
        if "ASC" in head or "DESC" in head:
            assert head.startswith("_bk"), f"global window over {head!r}"


def test_t14_scoring_is_one_kernel_pass(spark):
    """The per-doc scoring sub-plan (pre-checkpoint) must be ONE
    map-only Arrow kernel over the doc scan: no explode (Generate), no
    join, no exchange before the kernel."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from chdb_spark.operators.text import perplexity_buckets
    from chdb_spark.queries import table

    # reach the scored relation through the public operator: the bucket
    # tail is driven by checkpointed blocks, so explain the columns that
    # exist before the cumulative (id, n_bigrams, ppl_proxy projection
    # comes straight off the kernel)
    docs = table(spark, SF_CORRECT, "documents")
    out = perplexity_buckets(docs, F.col("source") == "src0")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Generate" not in plan
    assert "SortMergeJoin" not in plan


def test_dd9_substring_spans_single_scan_shape(spark):
    # r11 shape: the window-hash pass (scan → explode → substring → md5)
    # is lazily checkpointed, so the SQL plan shows ONE ExistingRDD scan
    # feeding both the dup-hash branch and the join-back — the corpus is
    # scanned and hashed once, not twice (the explode lives inside the
    # checkpointed lineage, no longer in this plan).
    plan = plan_of(spark, "dd9_substring_spans")
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan  # explode runs once, inside the checkpoint
    assert plan.count("Scan ExistingRDD") >= 2  # both consumers read it
    assert "Scan parquet" not in plan  # no second corpus scan
    # no Python in the hot path: the window pass is pure codegen
    assert "EvalPython" not in plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned writes + partition pruning — the 100 TB layout
    story: a filter on the partition column must become a PartitionFilters
    entry (directory pruning), not a data filter over every file."""
    from chdb_spark.queries import table
    from chdb_spark.sinks import write_auto

    out = str(tmp_path / "ev_part")
    ev = table(spark, SF_CORRECT, "events")
    write_auto(ev, out, fmt="parquet", partition_by=["event_type"])

    import contextlib
    import io
    import os

    assert os.path.isdir(os.path.join(out, "event_type=click"))
    df = spark.read.parquet(out).filter("event_type = 'click'").select("event_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "event_type" in pf
    # the partition predicate must NOT appear as a pushed data filter —
    # pruning happens at directory level before any file opens
    assert df.count() > 0


def test_t16_bm25_filter_before_explode_agg(spark):
    """BM25: the query-term filter must reach the exploded token stream
    before the (doc, term) agg, and the df/stats relations come back as
    broadcast joins — the shuffled relation is |matching tokens|."""
    plan = plan_of(spark, "t16_bm25_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the token explode
    # the query-term IN-filter is applied to the exploded stream (it
    # appears as a Filter over the generated term column), so the
    # (doc, term) agg shuffles matching tokens only
    assert "term#" in plan.split("Generate")[-1]


def test_t17_temperature_mix_tiny_aggregates(spark):
    """Mixing weights: one group-count hash agg; normalizers broadcast
    (no shuffle of the weight relation)."""
    plan = plan_of(spark, "t17_temperature_mix")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # the static plan recomputes the tiny group-count agg for the two
    # normalizers; at runtime AQE serves the repeats via ReusedExchange
    # (same pattern q11 pins on its executed plan)
    assert plan.count("hashpartitioning(source") <= 4


def test_cd1_snapshot_diff_single_fullouter_join(spark):
    """The CDC diff is ONE key-partitioned full-outer join — no extra
    joins, no cartesian, scan pruned to key + compared columns."""
    plan = plan_of(spark, "cd1_snapshot_diff")
    # the formatted plan prints a node in the tree AND the detail section,
    # so count the tree spelling (join type attached) exactly once
    assert plan.count("SortMergeJoin FullOuter") + plan.count(
        "ShuffledHashJoin FullOuter"
    ) == 1
    # no OTHER join nodes anywhere in the plan
    for other in ("BroadcastHashJoin", "BroadcastNestedLoopJoin",
                  "SortMergeJoin Inner", "SortMergeJoin Left"):
        assert other not in plan, other
    assert "CartesianProduct" not in plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_comment" not in read_schema and "o_clerk" not in read_schema


def test_se1_schema_evolution_no_join_no_python(spark):
    """Widened union is cast-only projections + union + aggregate: no
    join, no shuffle beyond the aggregation's, no Python nodes."""
    plan = plan_of(spark, "se1_schema_evolution")
    for bad in ("Join", "CartesianProduct", "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan, bad


def test_ru1_rollup_two_level_aggregation(spark):
    """States build at hourly grain then merge to daily: two aggregation
    levels, no window, no join."""
    plan = plan_of(spark, "ru1_rollup_merge")
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") >= 2  # hourly keys, daily keys (+ sort)


def test_q18_aggregates_lineitem_before_any_join(spark):
    """The Q18 rewrite: lineitem pre-aggregates to (orderkey, qty) and the
    HAVING-filtered sliver broadcasts into orders/customer — the big
    join's probe side is the aggregate, never raw lineitem."""
    plan = plan_of(spark, "q18_large_orders")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # the lineitem scan feeds the aggregate directly and reads ONLY the
    # two aggregation columns
    read_schemas = [
        s.splitlines()[0] for s in plan.split("ReadSchema:")[1:]
    ]
    li = [s for s in read_schemas if "l_orderkey" in s]
    assert li and all(
        "l_extendedprice" not in s and "l_shipdate" not in s for s in li
    )


def test_st5_weighted_median_refinement_shape(spark):
    """grouped_weighted_quantile: crossing set comes from a map-side
    bucket-total aggregate + bounded windows and BROADCASTS into the main
    scan; the expensive ordered walk happens after that join (on crossing
    buckets only), and both scans read just the three needed columns."""
    plan = plan_of(spark, "st5_weighted_median")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # bucket totals: partial+final hash aggregate pair under the broadcast
    assert plan.count("HashAggregate") >= 2
    for s in plan.split("ReadSchema:")[1:]:
        head = s.splitlines()[0]
        assert "l_orderkey" not in head and "l_shipdate" not in head


def test_delta_dv_antijoin_is_broadcast_hash(spark):
    """dl2: the deletion-vector filter must plan as a broadcast-hash
    LEFT ANTI join on (file, row_index) — never a nested-loop/cartesian,
    and the data side must not shuffle for a small DV set."""
    plan = plan_of(spark, "dl2_delta_deletion_vectors", mode="simple")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hudi_mor_merge_is_keyed_window(spark):
    """hu2: the MoR merge is one window over _hoodie_record_key (hash
    shuffle on the key) — no cartesian, no global single-partition sort."""
    plan = plan_of(spark, "hu2_hudi_mor", mode="simple")
    assert "_hoodie_record_key" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_iceberg_partitioned_scan_shape(spark):
    """ic2: per-partition groups union into ONE Union node; no python
    nodes anywhere in the read path (the restore is lit()+cast)."""
    plan = plan_of(spark, "ic2_iceberg_partitioned", mode="simple")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
