"""Driver-formal oracle queries for the external-store sources.

Each §2.1 source family (MySQL / PostgreSQL / MongoDB / Redis) gets a
query whose fixture loads rows FROM the parquet tables into the matching
in-process fake client (sources/rdbms.py fake_sql_connection_factory,
sources/nosql.py fake_mongo_client_factory / fake_redis_client_factory),
reads them back through the real Spark data source (partition planning,
executor-side range reads, type coercion — only the wire hop is faked),
and aggregates; the DuckDB oracle runs the equivalent SQL on the parquet
directly. This upgrades the rows from "unit-tested" to driver-formal,
the same move rc1/rc2 made for remote ClickHouse.

Reference anchors: table_functions.py:570 (mysql), :620 (postgresql),
:668 (mongodb), :722 (redis).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery


def _pdf(sf_dir: str, name: str):
    import pandas as pd

    return pd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"))


@defquery(
    "my1_mysql_source",
    """
    SELECT s_nationkey, count(*) AS n,
           CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS bal
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
    doc="mysql() table function end-to-end: supplier rows served through "
        "the in-process DB-API stand-in (bounds probe, range-partitioned "
        "executor reads — sources/rdbms.py, reference table_functions.py:"
        "570), aggregated against the parquet-derived oracle. acctbal "
        "summed as exact cents longs.",
)
def my1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.sources.rdbms import fake_sql_connection_factory, mysql

    pdf = _pdf(sf_dir, "supplier")[["s_suppkey", "s_nationkey", "s_acctbal"]]
    tables = {
        "supplier": (
            list(pdf.columns),
            [tuple(r) for r in pdf.itertuples(index=False)],
        )
    }
    df = mysql(
        spark, "db.example:3306", "tpch", "supplier",
        factory=fake_sql_connection_factory(tables), n_partitions=4,
    )
    return (
        df.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.floor(F.col("s_acctbal") * 100 + 0.5)).cast("double") / 100.0)
            .alias("bal"),
        )
        .orderBy("s_nationkey")
    )


@defquery(
    "pg1_postgres_source",
    """
    SELECT c_mktsegment, count(*) AS n
    FROM customer WHERE c_custkey <= 500
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="postgresql() table function with a DECLARED structure (schema "
        "probe skipped — the reference's structure argument path), "
        "customer slice through the fake DB-API transport, "
        "range-partitioned reads.",
)
def pg1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.sources.rdbms import fake_sql_connection_factory, postgresql

    pdf = _pdf(sf_dir, "customer")
    pdf = pdf[pdf["c_custkey"] <= 500][["c_custkey", "c_mktsegment"]]
    tables = {
        "customer": (
            list(pdf.columns),
            [tuple(r) for r in pdf.itertuples(index=False)],
        )
    }
    df = postgresql(
        spark, "pg.example:5432", "tpch", "customer",
        structure="c_custkey Int64, c_mktsegment String",
        factory=fake_sql_connection_factory(tables), n_partitions=3,
    )
    return (
        df.groupBy("c_mktsegment").agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment")
    )


@defquery(
    "mg1_mongodb_source",
    """
    SELECT n_regionkey, count(*) AS n,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    doc="mongodb() table function end-to-end: nation rows as BSON-ish docs "
        "through the pymongo-shaped stand-in (_id-range partition scans — "
        "sources/nosql.py, reference table_functions.py:668).",
)
def mg1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.sources.nosql import fake_mongo_client_factory, mongodb

    pdf = _pdf(sf_dir, "nation")
    docs = [
        {"_id": int(r.n_nationkey), "name": r.n_name, "region": int(r.n_regionkey)}
        for r in pdf.itertuples(index=False)
    ]
    df = mongodb(
        spark,
        host="fake:27017",
        database="tpch",
        collection="nation",
        structure="_id Int64, name String, region Int64",
        n_partitions=3,
        client_factory=fake_mongo_client_factory(docs),
    )
    return (
        df.groupBy(F.col("region").alias("n_regionkey"))
        .agg(
            F.count("*").alias("n"),
            F.concat_ws(",", F.array_sort(F.collect_list("name"))).alias("names"),
        )
        .orderBy("n_regionkey")
    )


@defquery(
    "rd1_redis_source",
    """
    SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
    """,
    doc="redis() table function end-to-end: region rows as redis hashes "
        "through the redis-py-shaped stand-in (scan_iter + hgetall, typed "
        "decode via the declared structure — sources/nosql.py, reference "
        "table_functions.py:722).",
)
def rd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.sources.nosql import fake_redis_client_factory, redis_table

    pdf = _pdf(sf_dir, "region")
    kv = {
        f"region:{int(r.r_regionkey)}": {"r_name": r.r_name}
        for r in pdf.itertuples(index=False)
    }
    df = redis_table(
        spark,
        host="fake:6379",
        key="k",
        structure="k String, r_name String",
        client_factory=fake_redis_client_factory(kv),
    )
    return df.select(
        F.split(F.col("k"), ":").getItem(1).cast("long").alias("r_regionkey"),
        "r_name",
    ).orderBy("r_regionkey")


@defquery(
    "sm1_streaming_window",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events GROUP BY day, event_type ORDER BY day, event_type
    """,
    doc="Structured Streaming end-to-end, driver-formal (SURVEY §2.9): the "
        "events table is re-ingested through a file-source readStream "
        "(streaming/core.py read_events_stream), aggregated with the "
        "event-time window operator (windowed_counts: watermark + 1-day "
        "tumbling windows), run to completion with trigger(availableNow) "
        "into a memory sink, and the final table must equal the batch "
        "oracle — the streaming-equals-batch consistency contract.",
)
def sm1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.streaming.core import (
        read_events_stream,
        state_partitions,
        windowed_counts,
    )

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    agg = windowed_counts(
        stream, window="1 day", watermark="1 day", keys=["event_type"]
    )
    # state keys = day grains × event types (a few hundred): size the
    # state store instances to the cardinality, not the session default
    with state_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName("sm1_mem")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table("sm1_mem")
        .select(
            F.col("win_start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("day", "event_type")
    )


@defquery(
    "sm2_incremental_mv",
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Incremental MATERIALIZED VIEW end-to-end (reference core.py:5952; "
        "SURVEY §2.2): the orders table is folded into a parquet MV by the "
        "checkpointed file-source stream (streaming/core.py "
        "materialized_view_stream — AvailableNow processes the backlog and "
        "stops; a second refresh call folds ZERO new files, proving the "
        "checkpoint makes it incremental), then the MV is read back and "
        "aggregated against the batch oracle.",
)
def sm2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from chdb_spark.streaming.core import materialized_view_stream

    work = tempfile.mkdtemp(prefix="chdb_spark_sm2_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "mv")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "orders.parquet"), src)

    def transform(batch: DataFrame) -> DataFrame:
        return batch.select("o_orderkey", "o_orderpriority", "o_totalprice")

    materialized_view_stream(spark, src, transform, out, ckpt)
    # refresh with no new files: the checkpoint must fold nothing new
    materialized_view_stream(spark, src, transform, out, ckpt)
    mv = spark.read.parquet(out)
    return (
        mv.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@defquery(
    "uf1_chdb_udf",
    """
    SELECT o_orderstatus,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 97)
                AS BIGINT) AS checksum,
           count(*) AS n
    FROM orders WHERE o_orderkey <= 2000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="chdb_udf surface end-to-end, driver-formal (SURVEY §2.10; "
        "reference docs/udf.rst:26-60 string contract): a "
        "@chdb_udf(return_type='UInt64') cents-mod-97 checksum is "
        "registered via create_function and invoked BY NAME from "
        "spark.sql; the Arrow-batched pandas_udf bridge must reproduce "
        "the oracle's pure-SQL arithmetic exactly. UDFs stay the slow "
        "path (row math here is trivial by design) — this pins the "
        "CONTRACT: CH type mapping, string in/out, per-batch vectorized "
        "dispatch.",
)
def uf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table
    from chdb_spark.udf import chdb_udf, create_function

    @chdb_udf(return_type="UInt64", name="uf1_cents_mod97")
    def uf1_cents_mod97(price):
        import math

        return int(math.floor(float(price) * 100 + 0.5)) % 97

    create_function(spark, uf1_cents_mod97)
    table(spark, sf_dir, "orders").filter("o_orderkey <= 2000").createOrReplaceTempView(
        "__uf1_orders"
    )
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(sum(uf1_cents_mod97(o_totalprice)) AS BIGINT) AS checksum,
               count(*) AS n
        FROM __uf1_orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    )


@defquery(
    "db1_dbapi_session",
    """
    SELECT c_mktsegment, count(*) AS n
    FROM customer WHERE c_acctbal > 0
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="DB-API 2.0 + stateful Session surface end-to-end, driver-formal "
        "(SURVEY §2.11; reference examples/dbapi.py): cursor.execute runs "
        "CH-dialect SQL (file() table function + countIf-free filter) "
        "through a file-backed Session, fetchall() returns the rows, and "
        "the result re-enters Spark via createDataFrame for the oracle "
        "hash-compare — cursor description/typing must survive the round "
        "trip.",
)
def db1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.dbapi import connect

    con = connect(spark=spark)
    try:
        cur = con.cursor()
        cur.execute(
            f"SELECT c_mktsegment, count() AS n "
            f"FROM file('{sf_dir}/customer.parquet', Parquet) "
            f"WHERE c_acctbal > 0 GROUP BY c_mktsegment ORDER BY c_mktsegment"
        )
        rows = cur.fetchall()
        cols = [d[0] for d in cur.description]
    finally:
        con.close()
    return spark.createDataFrame(
        [tuple(r) for r in rows], f"{cols[0]} string, {cols[1]} long"
    )


@defquery(
    "sm3_stream_dedup",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Streaming exact deduplication (SURVEY §2.9): events re-ingested "
        "file-by-file through readStream, dropDuplicates on (user_id, "
        "event_type) — keyed state store, one row per distinct pair, "
        "arrival-order independent because only the keys survive — run to "
        "completion with availableNow into a memory sink, then counted per "
        "type against the batch COUNT(DISTINCT) oracle. The unbounded-"
        "time production variant is dropDuplicatesWithinWatermark, which "
        "expires state; exact distinct here keeps state = |distinct keys|.",
)
def sm3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.streaming.core import read_events_stream, state_partitions

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    # dedup-state instances sized to the re-ingested table's trigger
    # throughput (4 files here); at production stream rates this knob
    # scales up with key cardinality
    with state_partitions(spark, 8):
        q = (
            deduped.writeStream.format("memory")
            .queryName("sm3_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table("sm3_mem")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


@defquery(
    "sm4_stateful_totals",
    """
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Custom stateful streaming operator end-to-end (SURVEY §2.9 "
        "superset): events re-ingested through readStream feed "
        "applyInPandasWithState (streaming/core.py stateful_running_totals "
        "— per-key (count, total) state sharded by the groupBy hash, "
        "timeout-evicted), run to completion with availableNow; the final "
        "update per key must equal the batch GROUP BY oracle. Values fold "
        "as integer cents (exact, associative) so state merge order can't "
        "drift the totals.",
)
def sm4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.streaming.core import (
        read_events_stream,
        state_partitions,
        stateful_running_totals,
    )

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    cents = stream.select(
        "user_id", F.floor(F.col("value") * 100 + 0.5).cast("double").alias("value")
    )
    out = stateful_running_totals(cents, key="user_id", timeout_minutes=None)
    # per-user state instances sized to this stream's throughput; the
    # same knob scales up with user cardinality in production
    with state_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName("sm4_mem")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # last update per key = the accumulated state (n_events is monotone)
    sink = spark.table("sm4_mem")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "user_id",
            "n_events",
            (F.col("total") / 100.0).alias("total_value"),
        )
        .orderBy("user_id")
    )


@defquery(
    "sm5_sliding_windows",
    """
    WITH ex AS (
      SELECT CAST(date_trunc('day', ts) - INTERVAL (k) DAY AS DATE) AS win_day,
             event_type, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    SELECT win_day, event_type, count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM ex GROUP BY win_day, event_type ORDER BY win_day, event_type
    """,
    doc="Sliding event-time windows end-to-end (SURVEY §2.9 superset — the "
        "reference has no streaming windows at all): 2-day windows sliding "
        "by 1 day over the events readStream, availableNow to completion; "
        "every event belongs to exactly two windows, which the oracle "
        "replays by exploding each event to its two covering window starts "
        "(epoch-aligned like Spark's window()). Counts and exact-cents "
        "sums per (window, type) must match the batch replay verbatim.",
)
def sm5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.streaming.core import (
        read_events_stream,
        state_partitions,
        windowed_counts,
    )

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    cents = stream.withColumn(
        "value", F.floor(F.col("value") * 100 + 0.5).cast("double")
    )
    agg = windowed_counts(
        cents, window="2 days", slide="1 day", watermark="2 days",
        keys=["event_type"],
    )
    # state keys = sliding-window grains × event types (bounded, ~2× sm1)
    with state_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName("sm5_mem")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table("sm5_mem")
        .select(
            F.col("win_start").cast("date").alias("win_day"),
            "event_type",
            "n_events",
            (F.col("sum_value") / 100.0).alias("sum_value"),
        )
        .orderBy("win_day", "event_type")
    )


@defquery(
    "sm6_streaming_neardup",
    """
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
          / len(list_distinct(a.shingles || b.shingles)) >= 0.8
    ORDER BY doc_a, doc_b
    """,
    doc="Streaming near-dup detection (SURVEY §2.9 superset): documents "
        "re-ingested file-by-file, MinHash band features computed map-only "
        "on the stream, applyInPandasWithState keyed by LSH bucket "
        "remembers bucket members across micro-batches and pairs each "
        "batch's arrivals against them — the emitted union equals the "
        "batch self-join's candidate set for ANY arrival order, then "
        "exact-verify >= 0.8 gives dd2's output and brute-force-Jaccard "
        "oracle verbatim.",
)
def sm6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_complete, scratch_dir
    from chdb_spark.operators.dedup import doc_features, verify_pairs_arrays
    from chdb_spark.queries import table
    from chdb_spark.streaming.core import (
        state_partitions,
        streaming_lsh_bucket_pairs,
    )

    import os

    docs = table(spark, sf_dir, "documents")
    # re-shard so the file source has multiple triggers' worth of input;
    # deterministic per sf_dir, so reuse it across runs (the sm7 device)
    tmp = scratch_dir("docstream", sf_dir)
    if not scratch_complete(tmp):  # _SUCCESS-gated: partial writes rewrite
        docs.repartitionByRange(4, "doc_id").write.mode("overwrite").parquet(tmp)
    stream = (
        spark.readStream.schema(spark.read.parquet(tmp).schema)
        # two files per trigger: pair state still crosses micro-batches
        # (the semantics under test, and the arrival-order-independence
        # property is already pinned cross-batch by the unit test) at
        # half the stateful-micro-batch scheduling cost
        .option("maxFilesPerTrigger", 2)
        .parquet(tmp)
    )
    banded = doc_features(stream, with_simhash=False).select(
        "doc_id", F.posexplode("band_hashes").alias("band_idx", "band_hash")
    )
    # LSH shard-state instances sized to the 4-file bench stream
    # (measured 6.3->4.2 s). Shard count rides the state-partition choice
    # (32 key-groups per state instance — enough for load balance, few
    # enough that per-key state-store commit/serialization overhead is
    # amortized): at 1024 shards every batch rewrote 1024 state entries
    # of ~80 band rows each (state commit 3.3 s summed at sf0.1); 32x8 =
    # 256 shards cut the stream 2.9 -> 2.2 s with the emitted pair union
    # unchanged (bucket identity is xxhash64(band_idx, band_hash),
    # independent of sharding). In production both knobs scale together.
    n_state_parts = 8
    with state_partitions(spark, n_state_parts):
        q = (
            streaming_lsh_bucket_pairs(banded, n_shards=32 * n_state_parts)
            .writeStream.format("memory")
            .queryName("sm6_mem")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # a pair sharing multiple buckets is emitted once per bucket → distinct,
    # exactly like the batch candidate_pairs_from_buckets
    cand = spark.table("sm6_mem").distinct()
    feats = doc_features(docs, with_simhash=False).localCheckpoint(eager=True)
    return verify_pairs_arrays(cand, feats, threshold=0.8).orderBy("doc_a", "doc_b")


@defquery(
    "sm7_streaming_dedup_watermark",
    """
    SELECT event_type,
           CAST(count(DISTINCT (user_id, CAST(date_trunc('day', ts) AS DATE)))
                AS BIGINT) AS n_user_days
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Streaming dedup with WATERMARK-BOUNDED state "
        "(dropDuplicatesWithinWatermark) — the production variant of sm3's "
        "unbounded dropDuplicates: per-key state is EVICTED once the "
        "event-time watermark passes it, so state size tracks the watermark "
        "window, not the key universe. Daily-activity keys "
        "(user, type, day); the 35-day delay exceeds the table's 30-day "
        "span, so no state expires mid-run and the emitted key set equals "
        "the batch DISTINCT for any arrival order — the eviction semantics "
        "themselves (a key re-emitted after its state expired) are pinned "
        "by tests/test_io_streaming.py::"
        "test_drop_duplicates_within_watermark_evicts_state.",
)
def sm7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_complete, scratch_dir
    from chdb_spark.streaming.core import read_events_stream, state_partitions
    from chdb_spark.session import read_table
    import os

    # re-shard events by time range so the file source delivers several
    # triggers' worth of input (same device as sm6)
    tmp = scratch_dir("evstream", sf_dir)
    if not scratch_complete(tmp):  # _SUCCESS-gated: partial writes rewrite
        read_table(spark, os.path.join(sf_dir, "events.parquet")) \
            .repartitionByRange(4, "ts").write.mode("overwrite").parquet(tmp)
    schema = spark.read.parquet(tmp).schema
    stream = (
        spark.readStream.schema(schema)
        # two files per trigger: state still crosses micro-batches (the
        # semantics under test) at half the per-trigger scheduling cost
        .option("maxFilesPerTrigger", 2)
        .parquet(tmp)
    )
    dd = (
        # round-tripped parquet infers TIMESTAMP_NTZ, which event-time ops
        # reject — normalize to TIMESTAMP before the watermark
        stream.select(
            "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
        )
        .withColumn("day", F.to_date("ts"))
        .withWatermark("ts", "35 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "day"])
    )
    # watermark-dedup state instances sized to the bench stream; scales
    # up with (user, type, day) cardinality in production
    with state_partitions(spark, 8):
        q = (
            dd.writeStream.format("memory")
            .queryName("sm7_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table("sm7_mem")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_user_days"))
        .orderBy("event_type")
    )


@defquery(
    "sm8_streaming_rollup",
    """
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum,
           min(value) AS val_min,
           max(value) AS val_max,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ORDER BY event_type, day
    """,
    doc="STREAMING rollup — the AggregatingMergeTree materialized view as "
        "a stream sink (reference datastore/core.py:5952 MV + :6004 "
        "-State engine note, composed): each micro-batch folds ONLY its "
        "own rows into hourly partial states (operators/rollup.py "
        "partial_states) appended to a state table — so the same "
        "(type, hour) group accumulates MULTIPLE state rows across "
        "batches, exactly like unmerged MergeTree parts — and the daily "
        "read merges them (merge_states) without ever revisiting raw "
        "events. The batch oracle over the raw table must match EXACTLY "
        "(decimal sums, distinct-set unions). State size per batch is "
        "|keys x hours| rows; the raw stream is touched once.",
)
def sm8(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from chdb_spark.operators import scratch_complete, scratch_dir
    from chdb_spark.operators.rollup import (
        finalize_states,
        merge_states,
        partial_states,
    )
    from chdb_spark.session import read_table

    # same time-range re-shard as sm6/sm7 so the file source delivers
    # several triggers' worth of input
    tmp = scratch_dir("evstream", sf_dir)
    if not scratch_complete(tmp):  # _SUCCESS-gated: partial writes rewrite
        read_table(spark, os.path.join(sf_dir, "events.parquet")) \
            .repartitionByRange(4, "ts").write.mode("overwrite").parquet(tmp)
    work = tempfile.mkdtemp(prefix="chdb_spark_sm8_")
    states_dir = os.path.join(work, "states")
    ckpt = os.path.join(work, "ckpt")

    aggs = {
        "cnt": ("count", None),
        "val_sum": ("sum", F.col("value").cast("decimal(18,2)")),
        "val_min": ("min", "value"),
        "val_max": ("max", "value"),
        "n_users": ("uniq_exact", "user_id"),
    }

    schema = spark.read.parquet(tmp).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(tmp)
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        b = batch.select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
            "user_id",
        )
        partial_states(
            b, ["event_type", F.date_trunc("hour", "ts").alias("hour")], aggs
        ).write.mode("append").parquet(states_dir)

    # per-batch partial_states groupBy keys = event_type × hour grains
    # (bounded); sizing the shuffle also bounds files-per-batch in the
    # states sink
    from chdb_spark.streaming.core import state_partitions

    with state_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    states = spark.read.parquet(states_dir)
    daily = merge_states(
        states, ["event_type", F.to_date("hour").alias("day")], aggs
    )
    return (
        finalize_states(daily, aggs)
        .withColumn("val_sum", F.col("val_sum").cast("double"))
        .select(
            "event_type", "day", "cnt", "val_sum", "val_min", "val_max",
            "n_users",
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# dl1 — pure-Python Delta Lake round-trip with time travel
# ---------------------------------------------------------------------------


@defquery(
    "dl1_delta_time_travel",
    """
    WITH v0 AS (SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 2 = 0),
         v1a AS (SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 2 = 1),
         v2 AS (SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 3 = 0)
    SELECT CAST((SELECT count(*) FROM v0) AS BIGINT)                 AS n_v0,
           CAST((SELECT sum(n) FROM v0) AS BIGINT)                   AS chars_v0,
           CAST((SELECT count(*) FROM v0) + (SELECT count(*) FROM v1a) AS BIGINT) AS n_v1,
           CAST((SELECT sum(n) FROM v0) + (SELECT sum(n) FROM v1a) AS BIGINT)     AS chars_v1,
           CAST((SELECT count(*) FROM v2) AS BIGINT)                 AS n_v2,
           CAST((SELECT sum(n) FROM v2) AS BIGINT)                   AS chars_v2
    """,
    doc="Delta Lake round-trip WITHOUT jars: the pure-Python log client "
        "(sources/delta_py.py — public delta.io protocol replay) creates a "
        "table from the even documents (v0), appends the odd ones (v1), "
        "then OVERWRITES with the doc_id%3 subset (v2); the query reads "
        "all three snapshots back via versionAsOf time travel and "
        "aggregates each. Oracle recomputes every snapshot straight from "
        "the parquet source. Scan stays distributed parquet (column-"
        "pruned, filter-pushed); only the metadata-sized log replay is "
        "driver-side — the same split delta-spark's DeltaLog makes.",
)
def dl1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.delta_py import (
        delta_table_version,
        read_delta_py,
        write_delta_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    path = scratch_dir("delta_dl1", sf_dir)

    def _build() -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_delta_py(docs.filter(F.col("doc_id") % 2 == 0), path, "overwrite")
        write_delta_py(docs.filter(F.col("doc_id") % 2 == 1), path, "append")
        write_delta_py(docs.filter(F.col("doc_id") % 3 == 0), path, "overwrite")

    try:
        ok = delta_table_version(path) == 2
    except Exception:
        ok = False
    if not ok:
        _build()

    def _agg(version, tag):
        return read_delta_py(spark, path, version=version).agg(
            F.count("*").alias(f"n_{tag}"),
            F.sum("n").cast("long").alias(f"chars_{tag}"),
        )

    return (
        _agg(0, "v0")
        .crossJoin(_agg(1, "v1"))
        .crossJoin(_agg(2, "v2"))
        .select("n_v0", "chars_v0", "n_v1", "chars_v1", "n_v2", "chars_v2")
    )


# ---------------------------------------------------------------------------
# ic1 / ic0 / hu1 — jar-free lakehouse round-trips (Iceberg write+read,
# Iceberg snapshot-semantics read, Hudi CoW file-slice read)
# ---------------------------------------------------------------------------


@defquery(
    "ic1_iceberg_roundtrip",
    """
    WITH s1 AS (SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 2 = 0),
         s2a AS (SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 2 = 1),
         s3 AS (SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 3 = 0)
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT)                 AS n_s1,
           CAST((SELECT sum(n) FROM s1) AS BIGINT)                   AS chars_s1,
           CAST((SELECT count(*) FROM s1) + (SELECT count(*) FROM s2a) AS BIGINT) AS n_s2,
           CAST((SELECT sum(n) FROM s1) + (SELECT sum(n) FROM s2a) AS BIGINT)     AS chars_s2,
           CAST((SELECT count(*) FROM s3) AS BIGINT)                 AS n_s3,
           CAST((SELECT sum(n) FROM s3) AS BIGINT)                   AS chars_s3
    """,
    doc="Iceberg round-trip WITHOUT jars (reference to_iceberg, "
        "pandas_compat.py:2177): the pure-Python v2 writer "
        "(sources/iceberg_py.py write_iceberg_py — spec-shaped metadata "
        "JSON + Avro manifest/manifest-list, EEXIST-atomic commit) appends "
        "the even documents (snapshot 1), appends the odd ones (snapshot "
        "2 — the prior snapshot's manifests carried forward in the new "
        "manifest list), then OVERWRITES with the doc_id%3 subset "
        "(snapshot 3). The query reads all three snapshots back by "
        "snapshot-id time travel and aggregates each; the oracle "
        "recomputes every snapshot from the parquet source. Data files "
        "are written distributed; only metadata-sized manifest I/O is "
        "driver-side — the same split the real Iceberg client makes.",
)
def ic1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.iceberg_py import (
        iceberg_snapshot_ids,
        read_iceberg_py,
        write_iceberg_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    path = scratch_dir("iceberg_ic1", sf_dir)

    def _build() -> list[int]:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        s1 = write_iceberg_py(docs.filter(F.col("doc_id") % 2 == 0), path, "append")
        s2 = write_iceberg_py(docs.filter(F.col("doc_id") % 2 == 1), path, "append")
        s3 = write_iceberg_py(docs.filter(F.col("doc_id") % 3 == 0), path, "overwrite")
        return [s1, s2, s3]

    try:
        sids = iceberg_snapshot_ids(path)
        # NOT a bare assert: under python -O asserts are stripped and a
        # partially-built scratch table (1-2 snapshots) would be reused
        # instead of rebuilt (ADVICE r9).
        if len(sids) != 3:
            raise ValueError(f"stale scratch table: {len(sids)} snapshots")
    except Exception:
        sids = _build()

    def _agg(sid, tag):
        return read_iceberg_py(spark, path, snapshot_id=sid).agg(
            F.count("*").alias(f"n_{tag}"),
            F.sum("n").cast("long").alias(f"chars_{tag}"),
        )

    return (
        _agg(sids[0], "s1")
        .crossJoin(_agg(sids[1], "s2"))
        .crossJoin(_agg(sids[2], "s3"))
        .select("n_s1", "chars_s1", "n_s2", "chars_s2", "n_s3", "chars_s3")
    )


@defquery(
    "ic0_iceberg_snapshot",
    """
    WITH live AS (
        SELECT length(text) AS n FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT 3 * length(text) AS n FROM documents WHERE doc_id % 5 = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n) AS BIGINT) AS chars
    FROM live
    """,
    doc="Iceberg READER snapshot semantics on a table this repo's writer "
        "did NOT produce (reference table_functions.py:868): the fixture "
        "hand-builds spec-shaped metadata where snapshot 2's manifest "
        "list re-lists snapshot 1's manifest with the odd-docs file "
        "marked status=2 DELETED and one EXISTING file, plus a new "
        "manifest ADDING a doc_id%5 file with tripled lengths — the "
        "reader must keep exactly the non-DELETED entries across "
        "manifests (iceberg_py.py read_iceberg_py). Oracle recomputes "
        "the expected live multiset from the parquet source.",
)
def ic0(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.iceberg_py import (
        _MANIFEST_AVRO,
        _MANIFEST_LIST_AVRO,
        _write_avro_file,
        read_iceberg_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n")
    )
    path = scratch_dir("iceberg_ic0", sf_dir)
    md = os.path.join(path, "metadata")
    marker = os.path.join(md, "v2.metadata.json")

    def _one_file(df: DataFrame, dest: str) -> None:
        """One parquet data file at dest (distributed compute, single
        committed part moved into place — fixture-sized by doc filter)."""
        import glob
        import shutil

        stage = dest + "_stage"
        shutil.rmtree(stage, ignore_errors=True)
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(part, dest)
        shutil.rmtree(stage, ignore_errors=True)

    def _build() -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(md, exist_ok=True)
        f_even = os.path.join(path, "data", "even.parquet")
        f_odd = os.path.join(path, "data", "odd.parquet")
        f_five = os.path.join(path, "data", "five.parquet")
        _one_file(docs.filter(F.col("doc_id") % 2 == 0).select("n"), f_even)
        _one_file(docs.filter(F.col("doc_id") % 2 == 1).select("n"), f_odd)
        _one_file(
            docs.filter(F.col("doc_id") % 5 == 0)
            .select((F.col("n") * 3).alias("n")),
            f_five,
        )

        def _entry(fp, status):
            return {
                "status": status,
                "snapshot_id": None,
                "data_file": {
                    "content": 0,
                    "file_path": fp,
                    "file_format": "PARQUET",
                    "record_count": 1,
                    "file_size_in_bytes": os.stat(fp).st_size,
                },
            }

        # snapshot 1: even + odd ADDED
        m1 = os.path.join(md, "m1.avro")
        _write_avro_file(
            spark, m1, _MANIFEST_AVRO, [_entry(f_even, 1), _entry(f_odd, 1)]
        )
        # snapshot 2: m1 rewritten (even EXISTING, odd DELETED) + m2 ADDS five
        m1b = os.path.join(md, "m1b.avro")
        _write_avro_file(
            spark, m1b, _MANIFEST_AVRO, [_entry(f_even, 0), _entry(f_odd, 2)]
        )
        m2 = os.path.join(md, "m2.avro")
        _write_avro_file(spark, m2, _MANIFEST_AVRO, [_entry(f_five, 1)])

        def _ml(dest, rows):
            _write_avro_file(
                spark, dest, _MANIFEST_LIST_AVRO,
                [
                    {
                        "manifest_path": mp,
                        "manifest_length": os.stat(mp).st_size,
                        "partition_spec_id": 0,
                        "content": 0,
                        "sequence_number": sid,
                        "added_snapshot_id": sid,
                    }
                    for mp, sid in rows
                ],
            )

        ml1 = os.path.join(md, "ml1.avro")
        _ml(ml1, [(m1, 1)])
        ml2 = os.path.join(md, "ml2.avro")
        _ml(ml2, [(m1b, 1), (m2, 2)])
        meta = {
            "format-version": 2,
            "table-uuid": "00000000-0000-0000-0000-00000000ic00",
            "location": path,
            "current-snapshot-id": 2,
            "schemas": [
                {
                    "schema-id": 0,
                    "type": "struct",
                    "fields": [
                        {"id": 1, "name": "n", "required": False,
                         "type": "long"}
                    ],
                }
            ],
            "current-schema-id": 0,
            "snapshots": [
                {"snapshot-id": 1, "manifest-list": ml1},
                {"snapshot-id": 2, "manifest-list": ml2},
            ],
        }
        with open(marker, "w") as f:
            _json.dump(meta, f)
        with open(os.path.join(md, "version-hint.text"), "w") as f:
            f.write("2")

    if not os.path.isfile(marker):
        _build()
    return read_iceberg_py(spark, path).agg(
        F.count("*").alias("n_rows"), F.sum("n").cast("long").alias("chars")
    )


@defquery(
    "hu1_hudi_snapshot",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 2 * length(text)
                         ELSE length(text) END) AS BIGINT) AS chars
    FROM documents
    """,
    doc="Hudi Copy-on-Write snapshot read WITHOUT the hudi-spark bundle "
        "(reference table_functions.py:956): the fixture builds a "
        "spec-shaped CoW table — two file groups (even/odd docs) at "
        "instant t1, the even group REWRITTEN at committed instant t2 "
        "with doubled lengths (file-slice supersession), and an "
        "UNCOMMITTED inflight rewrite of the odd group that must stay "
        "invisible. read_hudi_py must select the newest committed base "
        "file per file group (hudi_py.py). Oracle computes the expected "
        "final state straight from the parquet source.",
)
def hu1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.hudi_py import read_hudi_py

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n")
    )
    path = scratch_dir("hudi_hu1", sf_dir)
    hoodie = os.path.join(path, ".hoodie")
    t1, t2, t3 = "20260101000000000", "20260102000000000", "20260103000000000"
    marker = os.path.join(hoodie, f"{t2}.commit")

    def _one_file(df: DataFrame, dest: str) -> None:
        import glob
        import shutil

        stage = dest + "_stage"
        shutil.rmtree(stage, ignore_errors=True)
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(part, dest)
        shutil.rmtree(stage, ignore_errors=True)

    def _build() -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(hoodie, exist_ok=True)
        with open(os.path.join(hoodie, "hoodie.properties"), "w") as f:
            f.write("hoodie.table.name=hu1\n")
            f.write("hoodie.table.type=COPY_ON_WRITE\n")
        even = docs.filter(F.col("doc_id") % 2 == 0)
        odd = docs.filter(F.col("doc_id") % 2 == 1)
        # file group fgA: t1 slice superseded by committed t2 (n doubled)
        _one_file(even, os.path.join(path, f"fgA_0-0-0_{t1}.parquet"))
        _one_file(
            even.select("doc_id", (F.col("n") * 2).alias("n")),
            os.path.join(path, f"fgA_0-0-0_{t2}.parquet"),
        )
        # file group fgB: t1 slice + an INFLIGHT t3 rewrite (garbage values
        # that must never surface — t3 has no completed timeline instant)
        _one_file(odd, os.path.join(path, f"fgB_0-0-0_{t1}.parquet"))
        _one_file(
            odd.select("doc_id", F.lit(-1).cast("long").alias("n")),
            os.path.join(path, f"fgB_0-0-0_{t3}.parquet"),
        )
        with open(os.path.join(hoodie, f"{t1}.commit"), "w") as f:
            f.write("{}")
        with open(os.path.join(hoodie, f"{t3}.inflight"), "w") as f:
            f.write("")
        with open(marker, "w") as f:
            f.write("{}")

    if not os.path.isfile(marker):
        _build()
    return read_hudi_py(spark, path, drop_meta=True).agg(
        F.count("*").alias("n_rows"), F.sum("n").cast("long").alias("chars")
    )


@defquery(
    "dl2_delta_deletion_vectors",
    """
    WITH ranked AS (
        SELECT doc_id, length(text) AS n,
               row_number() OVER (ORDER BY doc_id) AS rn
        FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n) AS BIGINT) AS chars
    FROM ranked WHERE rn > 7
    """,
    doc="Delta DELETION VECTOR read WITHOUT jars (PROTOCOL.md §Deletion "
        "Vectors): the fixture writes one sorted data file, then commits "
        "a re-add carrying a z85-named DV file whose roaring bitmap "
        "deletes the first 7 row indexes (= the 7 lowest doc_ids). "
        "read_delta_py decodes the bitmap in executors and anti-joins "
        "on _metadata.row_index (sources/delta_dv.py, delta_py._scan_"
        "files). Oracle drops the 7 lowest doc_ids from the parquet "
        "source.",
)
def dl2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json
    import uuid as _uuid

    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.delta_dv import (
        serialize_dv,
        write_dv_file,
        z85_encode,
    )
    from chdb_spark.sources.delta_py import (
        delta_table_version,
        read_delta_py,
        write_delta_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n")
    )
    path = scratch_dir("delta_dl2_z85", sf_dir)

    def _build() -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        # ONE sorted data file so row index == doc_id rank
        write_delta_py(
            docs.repartition(1).sortWithinPartitions("doc_id"),
            path, "overwrite",
        )
        data_files = [
            os.path.basename(p)
            for p in glob.glob(os.path.join(path, "*.parquet"))
        ]
        if len(data_files) != 1:
            raise RuntimeError(f"expected one data file, got {data_files}")
        dv = serialize_dv(range(7))
        u = _uuid.uuid4()
        offs = write_dv_file(
            os.path.join(path, f"deletion_vector_{u}.bin"), [dv]
        )
        actions = [
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}},
            {"add": {
                "path": data_files[0], "partitionValues": {}, "size": 1,
                "modificationTime": 0, "dataChange": False,
                "deletionVector": {
                    "storageType": "u",
                    "pathOrInlineDv": z85_encode(u.bytes),
                    "offset": offs[0], "sizeInBytes": len(dv),
                    "cardinality": 7,
                }}},
        ]
        with open(os.path.join(path, "_delta_log",
                               f"{1:020d}.json"), "w") as f:
            for a in actions:
                f.write(_json.dumps(a) + "\n")

    try:
        ok = delta_table_version(path) == 1
    except Exception:
        ok = False
    if not ok:
        _build()
    return read_delta_py(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum("n").cast("long").alias("chars"),
    )


@defquery(
    "ic2_iceberg_partitioned",
    """
    WITH t AS (
        SELECT doc_id, lang, length(text) AS n FROM documents
        UNION ALL
        SELECT doc_id, lang, length(text) AS n FROM documents
        WHERE doc_id % 2 = 0
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n) AS BIGINT) AS chars
    FROM t GROUP BY lang ORDER BY lang
    """,
    doc="Identity-PARTITIONED Iceberg table round-trip through the "
        "jar-free writer+reader (reference to_iceberg, "
        "pandas_compat.py:2177; spec §Partitioning): write documents "
        "partitioned by lang, append the even half (spec inherited, no "
        "partition_by), read back — the reader restores the lang column "
        "from manifest partition tuples (§Column Projection rule 2) and "
        "groups per-partition scans. Oracle reproduces both writes from "
        "the parquet source.",
)
def ic2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.iceberg_py import (
        iceberg_snapshot_ids,
        read_iceberg_py,
        write_iceberg_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").cast("long").alias("n")
    )
    path = scratch_dir("iceberg_ic2", sf_dir)

    def _build() -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_iceberg_py(docs, path, partition_by=["lang"])
        write_iceberg_py(
            docs.filter(F.col("doc_id") % 2 == 0), path, mode="append"
        )

    try:
        if len(iceberg_snapshot_ids(path)) != 2:
            raise ValueError("stale scratch table")
    except Exception:
        _build()
    return (
        read_iceberg_py(spark, path)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n").cast("long").alias("chars"),
        )
        .orderBy("lang")
    )


@defquery(
    "ic3_iceberg_pos_delete",
    """
    WITH ranked AS (
        SELECT doc_id, length(text) AS n,
               row_number() OVER (ORDER BY doc_id) AS rn
        FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n) AS BIGINT) AS chars
    FROM ranked WHERE rn > 7
    """,
    doc="Iceberg v2 POSITION-DELETE read WITHOUT jars (spec §Position "
        "Delete Files): one sorted data file, then a snapshot-2 delete "
        "manifest whose parquet (file_path, pos) file removes the 7 "
        "lowest row indexes. read_iceberg_py reads the delete files with "
        "Spark itself and anti-joins on _metadata.row_index "
        "(iceberg_py._scan_with_pos_deletes). Oracle drops the 7 lowest "
        "doc_ids from the parquet source.",
)
def ic3(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import uuid as _uuid

    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.iceberg_py import (
        _avro_records,
        _current_metadata_file,
        _local_path,
        _manifest_avro_schema,
        _metadata_dir,
        _write_avro_file,
        iceberg_snapshot_ids,
        read_iceberg_py,
        write_iceberg_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n")
    )
    path = scratch_dir("iceberg_ic3", sf_dir)

    def _build() -> None:
        import glob
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_iceberg_py(
            docs.repartition(1).sortWithinPartitions("doc_id"), path
        )
        md = _metadata_dir(path)
        with open(_current_metadata_file(md)) as f:
            meta = _json.load(f)
        data_files = glob.glob(os.path.join(path, "data", "*.parquet"))
        if len(data_files) != 1:
            raise RuntimeError(f"expected one data file: {data_files}")
        # position-delete parquet: rows 0..6 of the single data file
        import pyarrow as pa
        import pyarrow.parquet as pq

        pd_file = os.path.join(path, "data", f"pd-{_uuid.uuid4().hex}.parquet")
        pq.write_table(
            pa.table({
                "file_path": pa.array([data_files[0]] * 7, pa.string()),
                "pos": pa.array(list(range(7)), pa.int64()),
            }),
            pd_file,
        )
        # delete manifest + snapshot-2 manifest list carrying both
        snap1 = meta["snapshots"][-1]
        mdel = os.path.join(md, f"m-del-{_uuid.uuid4().hex}.avro")
        _write_avro_file(
            spark, mdel, _manifest_avro_schema([]),
            [{
                "status": 1, "snapshot_id": None,
                "data_file": {
                    "content": 1, "file_path": pd_file,
                    "file_format": "PARQUET", "record_count": 7,
                    "file_size_in_bytes": os.stat(pd_file).st_size,
                },
            }],
        )
        list_rows = [{
            "manifest_path": mdel,
            "manifest_length": os.stat(mdel).st_size,
            "partition_spec_id": 0, "content": 1, "sequence_number": 2,
            "added_snapshot_id": 2,
        }]
        for rec in _avro_records(
            spark, _local_path(snap1["manifest-list"], path)
        ):
            try:
                mseq = rec.get("sequence_number")
            except Exception:
                mseq = None
            list_rows.append({
                "manifest_path": str(rec.get("manifest_path")),
                "manifest_length": int(str(rec.get("manifest_length") or 0)),
                "partition_spec_id": 0,
                "content": int(str(rec.get("content") or 0)),
                "sequence_number": int(str(mseq)) if mseq is not None else 1,
                "added_snapshot_id": int(
                    str(rec.get("added_snapshot_id") or 1)
                ),
            })
        from chdb_spark.sources.iceberg_py import _MANIFEST_LIST_AVRO

        ml2 = os.path.join(md, f"snap-2-{_uuid.uuid4().hex}.avro")
        _write_avro_file(spark, ml2, _MANIFEST_LIST_AVRO, list_rows)
        sid2 = snap1["snapshot-id"] + 1
        meta["snapshots"].append(
            {"snapshot-id": sid2, "sequence-number": sid2,
             "manifest-list": ml2, "summary": {"operation": "delete"}}
        )
        meta["current-snapshot-id"] = sid2
        with open(os.path.join(md, "v2.metadata.json"), "w") as f:
            _json.dump(meta, f)
        with open(os.path.join(md, "version-hint.text"), "w") as f:
            f.write("2")

    try:
        if len(iceberg_snapshot_ids(path)) != 2:
            raise ValueError("stale scratch table")
    except Exception:
        _build()
    return read_iceberg_py(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum("n").cast("long").alias("chars"),
    )


@defquery(
    "hu2_hudi_mor",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 2 * length(text)
                         ELSE length(text) END) AS BIGINT) AS chars
    FROM documents
    """,
    doc="Hudi MERGE-ON-READ snapshot read WITHOUT the hudi-spark bundle "
        "(reference table_functions.py:956; HoodieLogFormat spec): the "
        "fixture writes a base file at deltacommit t1, a log file whose "
        "PARQUET_DATA_BLOCK at committed t2 doubles n for doc_id%3==0, "
        "and a second block at t3 that never completes (must stay "
        "invisible). read_hudi_py merges base+log per "
        "(_hoodie_partition_path, _hoodie_record_key) "
        "— executor-side block parsing, one key shuffle "
        "(sources/hudi_py.py _read_mor). Oracle computes the merged "
        "state straight from the parquet source.",
)
def hu2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.hudi_py import (
        _BLOCK_PARQUET_DATA,
        _HDR_INSTANT_TIME,
        append_log_block,
        read_hudi_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("_hoodie_record_key"),
        F.lit("").alias("_hoodie_partition_path"),
        "doc_id",
        F.length("text").cast("long").alias("n"),
    )
    # _v2: r11 added the spec-required _hoodie_partition_path meta column
    # to the merge key — older scratch fixtures lack it and must rebuild
    path = scratch_dir("hudi_hu2_v2", sf_dir)
    hoodie = os.path.join(path, ".hoodie")
    t1, t2, t3 = "20260101000000000", "20260102000000000", "20260103000000000"
    file_id = "fgM"
    marker = os.path.join(hoodie, f"{t2}.deltacommit")

    def _one_file(df: DataFrame, dest: str) -> str:
        import glob
        import shutil

        stage = dest + "_stage"
        shutil.rmtree(stage, ignore_errors=True)
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(part, dest)
        shutil.rmtree(stage, ignore_errors=True)
        return dest

    def _build() -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(hoodie, exist_ok=True)
        with open(os.path.join(hoodie, "hoodie.properties"), "w") as f:
            f.write("hoodie.table.name=hu2\n")
            f.write("hoodie.table.type=MERGE_ON_READ\n")
        _one_file(docs, os.path.join(path, f"{file_id}_0-0-0_{t1}.parquet"))
        # log payloads: complete parquet byte streams (spec: the
        # PARQUET_DATA_BLOCK content IS a parquet file)
        upd = _one_file(
            docs.filter(F.col("doc_id") % 3 == 0)
                .withColumn("n", F.col("n") * 2),
            os.path.join(path, "_stage_upd.parquet"),
        )
        junk = _one_file(
            docs.limit(5).withColumn("n", F.lit(-1).cast("long")),
            os.path.join(path, "_stage_junk.parquet"),
        )
        log = os.path.join(path, f".{file_id}_{t1}.log.1_0-0-0")
        for src, instant in ((upd, t2), (junk, t3)):
            with open(src, "rb") as f:
                content = f.read()
            append_log_block(
                log, _BLOCK_PARQUET_DATA, {_HDR_INSTANT_TIME: instant}, content
            )
            os.remove(src)
        with open(os.path.join(hoodie, f"{t1}.deltacommit"), "w") as f:
            f.write("{}")
        with open(os.path.join(hoodie, f"{t3}.inflight"), "w") as f:
            f.write("")
        with open(marker, "w") as f:
            f.write("{}")

    if not os.path.isfile(marker):
        _build()
    return read_hudi_py(spark, path, drop_meta=True).agg(
        F.count("*").alias("n_rows"), F.sum("n").cast("long").alias("chars")
    )


@defquery(
    "ic4_iceberg_bucket_days",
    """
    SELECT CAST(d AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n) AS BIGINT) AS chars
    FROM (
        SELECT DATE '2026-01-01' + CAST(doc_id % 5 AS INT) AS d,
               length(text) AS n
        FROM documents
    )
    GROUP BY d ORDER BY d
    """,
    doc="NON-IDENTITY partition transform READ (reference "
        "table_functions.py:868; spec §Partition Transforms): the "
        "fixture lays out documents as a jar writer would for "
        "PARTITIONED BY (bucket(4, doc_id), day(d)) — real "
        "murmur3_x86_32 bucket values (spec Appendix B vectors pinned) "
        "and day ordinals in the manifest partition tuples, source "
        "columns present in every data file. read_iceberg_py scans the "
        "20 per-partition files as one plain distributed union (no "
        "identity columns to restore; transform tuples are "
        "pruning-metadata only, which the spec lets a reader ignore). "
        "Oracle recomputes the day rollup from the parquet source.",
)
def ic4(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt
    import json as _json
    import uuid as _uuid

    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.iceberg_py import (
        _MANIFEST_LIST_AVRO,
        _manifest_avro_schema,
        _write_avro_file,
        iceberg_bucket,
        iceberg_day,
        iceberg_snapshot_ids,
        read_iceberg_py,
    )

    path = scratch_dir("iceberg_ic4", sf_dir)

    def _build() -> None:
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        shutil.rmtree(path, ignore_errors=True)
        # fixture-sized driver pull by design (3 narrow columns of the
        # documents table) — the QUERY under test is the distributed read
        pdf = (
            table(spark, sf_dir, "documents")
            .select("doc_id", F.length("text").cast("long").alias("n"))
            .toPandas()
        )
        epoch = _dt.date(1970, 1, 1)
        base = _dt.date(2026, 1, 1)
        pdf["d"] = [base + _dt.timedelta(days=int(i) % 5) for i in pdf["doc_id"]]
        pdf["_bucket"] = [iceberg_bucket(int(i), 4) for i in pdf["doc_id"]]
        pdf["_day"] = [iceberg_day(d) for d in pdf["d"]]
        md = os.path.join(path, "metadata")
        os.makedirs(md, exist_ok=True)
        entries = []
        for (b, day_ord), grp in pdf.groupby(["_bucket", "_day"]):
            sub = os.path.join(
                path, "data", f"doc_id_bucket={b}",
                f"d_day={epoch + _dt.timedelta(days=int(day_ord))}",
            )
            os.makedirs(sub, exist_ok=True)
            fp = os.path.join(sub, f"{_uuid.uuid4().hex}.parquet")
            tbl = pa.table({
                "doc_id": pa.array(grp["doc_id"], pa.int64()),
                "n": pa.array(grp["n"], pa.int64()),
                "d": pa.array(grp["d"], pa.date32()),
            })
            pq.write_table(tbl, fp)
            entries.append({
                "status": 1, "snapshot_id": None,
                "data_file": {
                    "content": 0,
                    "partition": {
                        "doc_id_bucket": int(b), "d_day": int(day_ord),
                    },
                    "file_path": fp, "file_format": "PARQUET",
                    "record_count": len(grp),
                    "file_size_in_bytes": os.stat(fp).st_size,
                },
            })
        manifest = os.path.join(md, f"m-{_uuid.uuid4().hex}.avro")
        _write_avro_file(
            spark, manifest,
            _manifest_avro_schema(
                [("doc_id_bucket", "int"), ("d_day", "int")]
            ),
            entries,
        )
        ml = os.path.join(md, f"snap-1-{_uuid.uuid4().hex}.avro")
        _write_avro_file(
            spark, ml, _MANIFEST_LIST_AVRO,
            [{
                "manifest_path": manifest,
                "manifest_length": os.stat(manifest).st_size,
                "partition_spec_id": 0, "content": 0,
                "sequence_number": 1, "added_snapshot_id": 1,
            }],
        )
        meta = {
            "format-version": 2,
            "table-uuid": str(_uuid.uuid4()),
            "location": path,
            "last-sequence-number": 1,
            "last-column-id": 3,
            "current-snapshot-id": 1,
            "schemas": [{
                "schema-id": 0, "type": "struct",
                "fields": [
                    {"id": 1, "name": "doc_id", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "n", "required": False,
                     "type": "long"},
                    {"id": 3, "name": "d", "required": False,
                     "type": "date"},
                ],
            }],
            "current-schema-id": 0,
            "partition-specs": [{
                "spec-id": 0,
                "fields": [
                    {"name": "doc_id_bucket", "transform": "bucket[4]",
                     "source-id": 1, "field-id": 1000},
                    {"name": "d_day", "transform": "day",
                     "source-id": 3, "field-id": 1001},
                ],
            }],
            "default-spec-id": 0,
            "snapshots": [{
                "snapshot-id": 1, "sequence-number": 1,
                "manifest-list": ml,
                "summary": {"operation": "append"},
            }],
        }
        with open(os.path.join(md, "v1.metadata.json"), "w") as f:
            _json.dump(meta, f)
        with open(os.path.join(md, "version-hint.text"), "w") as f:
            f.write("1")

    try:
        if len(iceberg_snapshot_ids(path)) != 1:
            raise ValueError("stale scratch table")
    except Exception:
        _build()
    return (
        read_iceberg_py(spark, path)
        .groupBy("d")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n").cast("long").alias("chars"),
        )
        .orderBy("d")
    )


@defquery(
    "dl3_delta_delete_dv",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS chars,
           CAST(min(doc_id) AS BIGINT) AS min_id
    FROM documents WHERE doc_id % 7 <> 3
    """,
    doc="DELETE producing DELETION VECTORS without jars (PROTOCOL.md "
        "§Deletion Vectors; delta-spark's DV-enabled DELETE): the "
        "fixture writes documents as a 2-file Delta table, then "
        "delete_delta_py('doc_id % 7 = 3') serializes real roaring "
        "bitmaps into a spec-shaped DV file, commits remove+add with "
        "descriptors and upgrades the protocol — no data file "
        "rewritten. read_delta_py applies the DVs via the broadcast "
        "row-index anti-join (sources/delta_py.py _scan_files). Oracle "
        "recomputes the surviving set from the parquet source.",
)
def dl3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.delta_py import (
        delete_delta_py,
        delta_table_version,
        read_delta_py,
        write_delta_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n")
    )
    path = scratch_dir("delta_dl3", sf_dir)

    def _build() -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_delta_py(docs.repartition(2), path)
        _v, n = delete_delta_py(spark, path, "doc_id % 7 = 3")
        if n == 0:
            raise RuntimeError("dl3 fixture: delete matched nothing")

    try:
        if delta_table_version(path) != 1:
            raise ValueError("stale scratch table")
    except Exception:
        _build()
    return read_delta_py(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum("n").cast("long").alias("chars"),
        F.min("doc_id").cast("long").alias("min_id"),
    )


@defquery(
    "ic5_iceberg_nested",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS chars,
           CAST(sum(doc_id + 1) AS BIGINT) AS pair2_sum
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="NESTED-TYPE (struct + array) Iceberg round-trip through the "
        "jar-free writer+reader (r11; spec §Schemas nested types): "
        "documents written as (doc_id, struct<lang,n> meta, "
        "array<long> pair) with spec field ids allocated pre-order and "
        "struct fields stamped into the parquet footers, then appended "
        "once (committed ids reused) and read back. The aggregation "
        "drills into meta.lang / meta.n / element_at(pair, 2), so any "
        "nested misread breaks the hash. Oracle recomputes from the "
        "parquet source.",
)
def ic5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table
    from chdb_spark.sources.iceberg_py import (
        iceberg_snapshot_ids,
        read_iceberg_py,
        write_iceberg_py,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.struct(
            F.col("lang").alias("lang"),
            F.length("text").cast("long").alias("n"),
        ).alias("meta"),
        F.array(F.col("doc_id"), F.col("doc_id") + 1).alias("pair"),
    )
    path = scratch_dir("iceberg_ic5", sf_dir)

    def _build() -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_iceberg_py(docs.filter(F.col("doc_id") % 2 == 0), path)
        write_iceberg_py(
            docs.filter(F.col("doc_id") % 2 != 0), path, mode="append"
        )

    try:
        if len(iceberg_snapshot_ids(path)) != 2:
            raise ValueError("stale scratch table")
    except Exception:
        _build()
    return (
        read_iceberg_py(spark, path)
        .groupBy(F.col("meta.lang").alias("lang"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("meta.n").cast("long").alias("chars"),
            F.sum(F.element_at("pair", 2)).cast("long").alias("pair2_sum"),
        )
        .orderBy("lang")
    )
