"""ClickHouse-dialect end-to-end queries — the CH SQL *text* goes in, the
dialect layer (chdb_spark/dialect.py) rewrites it, Spark executes it.

These entries prove the drop-in contract the reference offers (reference
chdb/__init__.py:145-217 — ``chdb.query`` takes CH SQL): a user's existing
CH query strings run unmodified. Each query here is CH dialect verbatim
(uniq/countIf/quantileExact/toYYYYMM/toStartOfMonth/splitByChar/numbers()/
PREWHERE/SETTINGS), executed through ``session.query`` so the whole
rewrite → plan → execute path is covered by the oracle gate.

Plans are identical to hand-written Spark SQL — the rewrite is pure text,
so Catalyst sees ordinary expressions (pushdown/codegen intact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table


def _ch(spark: SparkSession, sf_dir: str, sql: str, views: list[str]) -> DataFrame:
    """Register the named sf tables as temp views and run CH-dialect SQL."""
    from chdb_spark import session as chs

    for t in views:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return chs.query(spark, sql, "DataFrame")


@defquery(
    "ch1_dialect_aggs",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey)                                     AS n_cust,
           count(*) FILTER (WHERE o_totalprice > 150000)                 AS n_big,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS f_total,
           round(quantile_cont(o_totalprice, 0.5), 2)                    AS med_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="CH-dialect aggregate surface end-to-end: uniqExact/countIf/sumIf/"
        "quantileExact parametric syntax through the rewrite layer.",
)
def ch1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The distinct agg is split from the quantile into a self-join on the
    # 5-row group key (r11, guide §5.1): combining count(DISTINCT) with a
    # TypedImperative agg makes Catalyst key the first aggregate by
    # (group, distinct-col), building and merging a percentile buffer PER
    # CUSTOMER (~100k object buffers through two extra merge stages)
    # instead of per priority. Split form measured 2x faster at sf0.1
    # (1.81 -> 0.93 s) and row-identical; at scale it removes the
    # per-distinct-key buffer stage outright. All four dialect aggregates
    # still translate through the rewrite layer.
    return _ch(
        spark,
        sf_dir,
        """
        SELECT a.o_orderpriority,
               b.n_cust,
               a.n_big,
               a.f_total,
               a.med_price
        FROM (
            SELECT o_orderpriority,
                   countIf(o_totalprice > 150000)                    AS n_big,
                   round(sumIf(o_totalprice, o_orderstatus = 'F'), 2) AS f_total,
                   round(quantileExact(0.5)(o_totalprice), 2)        AS med_price
            FROM orders
            GROUP BY o_orderpriority
        ) a
        JOIN (
            SELECT o_orderpriority, uniqExact(o_custkey) AS n_cust
            FROM orders
            GROUP BY o_orderpriority
        ) b ON a.o_orderpriority = b.o_orderpriority
        ORDER BY a.o_orderpriority
        SETTINGS max_threads=4
        """,
        ["orders"],
    )


@defquery(
    "ch2_dialect_dates",
    """
    SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS ym,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY 1, 2
    ORDER BY ym
    """,
    doc="CH-dialect datetime surface: toYYYYMM/toStartOfMonth/toDate through "
        "the rewrite layer; filter still reaches the parquet scan.",
)
def ch2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT toYYYYMM(o_orderdate)       AS ym,
               toStartOfMonth(o_orderdate) AS month_start,
               count(*)                    AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        PREWHERE o_orderdate >= toDate('1995-01-01')
        GROUP BY ym, month_start
        ORDER BY ym
        """,
        ["orders"],
    )


@defquery(
    "ch3_dialect_numbers",
    """
    SELECT (r % 7) AS bucket,
           count(*) AS n,
           CAST(sum(r) AS BIGINT) AS s
    FROM (SELECT CAST(range AS BIGINT) AS r FROM range(0, 100000))
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="CH numbers() generator table function → Spark range TVF; "
        "map-side partial agg over a synthesized integer stream.",
)
def ch3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark import session as chs

    return chs.query(
        spark,
        """
        SELECT modulo(number, 7) AS bucket,
               count(*)          AS n,
               sum(number)       AS s
        FROM numbers(100000)
        GROUP BY bucket
        ORDER BY bucket
        """,
        "DataFrame",
    )


@defquery(
    "ch4_dialect_strings",
    """
    SELECT p_brand,
           count(*) FILTER (WHERE regexp_matches(p_type, 'BRASS|COPPER'))   AS n_metal,
           count(DISTINCT string_split(p_type, ' ')[1])                     AS n_first,
           max(length(replace(p_name, ' ', '')))                           AS max_len,
           count(*) FILTER (WHERE p_name LIKE '%green%')                    AS n_green
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="CH-dialect string surface: match/splitByChar/replaceAll/countIf/"
        "arrayElement through the rewrite layer (all codegen'd Spark builtins).",
)
def ch4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT p_brand,
               countIf(match(p_type, 'BRASS|COPPER'))                 AS n_metal,
               uniqExact(arrayElement(splitByChar(' ', p_type), 1))   AS n_first,
               max(lengthUTF8(replaceAll(p_name, ' ', '')))           AS max_len,
               countIf(p_name LIKE '%green%')                         AS n_green
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand
        """,
        ["part"],
    )


@defquery(
    "ch5_dialect_limit_by",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders WHERE o_custkey <= 50
    )
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM ranked WHERE rn <= 2
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    doc="CH `LIMIT 2 BY o_custkey` (per-group top-n clause) through the "
        "rewrite layer — becomes one windowed row_number filter, no "
        "per-group sub-sorts.",
)
def ch5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders WHERE o_custkey <= 50
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2 BY o_custkey
        """,
        ["orders"],
    )


@defquery(
    "ch6_dialect_array_join",
    """
    SELECT p_brand, w AS word, count(*) AS n
    FROM part, unnest(string_split(p_type, ' ')) t(w)
    GROUP BY p_brand, w
    ORDER BY n DESC, p_brand, word
    LIMIT 20
    """,
    doc="CH `ARRAY JOIN splitByChar(...) AS word` through the rewrite "
        "layer — LATERAL VIEW explode, grouped word counts.",
)
def ch6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT p_brand, word, count(*) AS n
        FROM part ARRAY JOIN splitByChar(' ', p_type) AS word
        GROUP BY p_brand, word
        ORDER BY n DESC, p_brand, word
        LIMIT 20
        """,
        ["part"],
    )


@defquery(
    "sq1_sqlite_roundtrip",
    """
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey <= 1000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="sqlite() table function end-to-end: orders slice exported to a "
        "SQLite file (driver-side, bounded), read back through the "
        "rowid-partitioned Spark data source, aggregated — proving the "
        "source against the same parquet-derived oracle.",
)
def sq1(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import sqlite3
    import tempfile

    from chdb_spark.sources.sqlite import read_sqlite

    rows = (
        table(spark, sf_dir, "orders")
        .filter("o_orderkey <= 1000")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()  # bounded by the o_orderkey predicate (≤1000 keys)
    )
    db = os.path.join(tempfile.gettempdir(), f"chdb_spark_sq1_{os.getpid()}.db")
    if os.path.exists(db):
        os.unlink(db)
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE orders (o_orderkey INTEGER, o_orderstatus TEXT, o_totalprice REAL)"
    )
    con.executemany(
        "INSERT INTO orders VALUES (?, ?, ?)",
        [(r.o_orderkey, r.o_orderstatus, float(r.o_totalprice)) for r in rows],
    )
    con.commit()
    con.close()
    from pyspark.sql import functions as F

    return (
        read_sqlite(spark, db, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@defquery(
    "rc1_remote_clickhouse",
    """
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
    FROM customer WHERE c_custkey <= 500
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="remote() table function end-to-end: customer slice served through "
        "an in-process ClickHouse-HTTP stand-in (DESCRIBE/min-max/"
        "ArrowStream protocol — sources/remote_ch.py, reference "
        "table_functions.py:808), read back range-partitioned, aggregated "
        "against the parquet-derived oracle. Fixture bounded by the "
        "c_custkey predicate (≤500 keys).",
)
def rc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from chdb_spark.sources.remote_ch import fake_ch_post_factory, remote

    rows = [
        (r.c_custkey, r.c_mktsegment, float(r.c_acctbal))
        for r in table(spark, sf_dir, "customer")
        .filter("c_custkey <= 500")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .collect()  # bounded by the c_custkey predicate (≤500 keys)
    ]
    cols = [
        ("c_custkey", "UInt64"),
        ("c_mktsegment", "String"),
        ("c_acctbal", "Float64"),
    ]
    return (
        remote(
            spark,
            "fake:8123",
            "default",
            "customer",
            http_factory=fake_ch_post_factory(rows, cols),
            n_partitions=4,
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
        .orderBy("c_mktsegment")
    )


@defquery(
    "rc2_remote_clickhouse_write",
    """
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey <= 2000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="to_clickhouse() write path end-to-end (reference core.py:5523-5562 "
        "DataFrame-upload leg): an orders slice is written over REAL "
        "localhost HTTP as per-partition INSERT ... FORMAT ArrowStream "
        "(sources/remote_ch.py to_clickhouse), read back with remote() "
        "range-partitioned, and aggregated against the parquet oracle. "
        "Executor tasks POST their own partitions — row data never passes "
        "through the driver on the write.",
)
def rc2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from chdb_spark.sources.remote_ch import FakeChServer, remote, to_clickhouse

    src = (
        table(spark, sf_dir, "orders")
        .filter("o_orderkey <= 2000")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartition(4)
    )
    server = FakeChServer()
    host, httpd = server.serve()
    try:
        to_clickhouse(src, host, "default", "orders_rc2", if_exists="replace")
        back = remote(spark, host, "default", "orders_rc2", n_partitions=3)
        rows = (
            back.groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
                .cast("double")
                .alias("total"),
            )
            .orderBy("o_orderstatus")
            .collect()  # materialize before the localhost server goes away
        )
    finally:
        httpd.shutdown()
    return spark.createDataFrame(rows)


@defquery(
    "u1_url_table",
    """
    SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
    """,
    doc="url() table function end-to-end (reference table_functions.py:208 "
        "URLTableFunction): region.parquet served over REAL localhost HTTP, "
        "fetched by sources/uri.py _read_url (driver-side bootstrap "
        "download -> parquet scan), compared to the direct-file oracle. "
        "Flips the §2.1 URL row from plumbing-tested to driver-formal; "
        "non-localhost networking remains environment-gated.",
)
def u1(spark: SparkSession, sf_dir: str) -> DataFrame:
    import http.server
    import os
    import threading

    from chdb_spark.sources import open_uri

    serve_dir = os.path.abspath(sf_dir)

    def handler(*a, **kw):
        return http.server.SimpleHTTPRequestHandler(*a, directory=serve_dir, **kw)

    httpd = http.server.HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        df = open_uri(
            spark, f"http://127.0.0.1:{httpd.server_address[1]}/region.parquet"
        )
        # the URL route downloads to a driver tmp file; the scan is lazy on
        # that local copy, so the server can go away after this returns
        return df.select("r_regionkey", "r_name").orderBy("r_regionkey")
    finally:
        httpd.shutdown()


@defquery(
    "py1_python_source",
    """
    SELECT n_regionkey, count(*) AS n, string_agg(n_name, ',' ORDER BY n_name)
               AS names
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    doc="Python()/from_df in-memory source end-to-end (reference "
        "table_functions.py:1143; cc_extension zero-copy): the nation rows "
        "travel pandas -> Arrow-accelerated createDataFrame -> Spark agg, "
        "compared to the direct-parquet oracle. Flips the §2.1 in-memory "
        "DF/Arrow row to driver-formal.",
)
def py1(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from chdb_spark.sources.files import from_pandas

    pdf = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    df = from_pandas(spark, pdf)
    return (
        df.groupBy("n_regionkey")
        .agg(
            F.count("*").alias("n"),
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("names"),
        )
        .orderBy("n_regionkey")
    )


@defquery(
    "ch7_with_fill",
    """
    WITH agg AS (
      SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
      FROM events
      WHERE event_type = 'purchase' AND value > 90 AND user_id < 60
      GROUP BY user_id
    )
    SELECT g.k AS user_id, coalesce(n, 0) AS n, coalesce(total, 0) AS total
    FROM (SELECT unnest(generate_series(0, 59)) AS k) g
    LEFT JOIN agg ON agg.user_id = g.k
    ORDER BY user_id
    """,
    doc="CH `ORDER BY … WITH FILL FROM a TO b` gap filling end-to-end: the "
        "dialect splits the fill spec, the executor joins a generated key "
        "frame (sequence/explode, no driver materialization) and fills gap "
        "rows with CH column defaults (0).",
)
def ch7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT user_id, count() AS n, round(sum(value), 2) AS total
        FROM events
        WHERE event_type = 'purchase' AND value > 90 AND user_id < 60
        GROUP BY user_id
        ORDER BY user_id WITH FILL FROM 0 TO 60
        """,
        ["events"],
    )


@defquery(
    "ch8_with_totals",
    """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), ())
    ORDER BY o_orderstatus
    """,
    doc="CH `GROUP BY … WITH TOTALS` → empty grouping set (grand-total row); "
        "single partial+final hash aggregate, no extra scan for the totals.",
)
def ch8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, count() AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY o_orderstatus WITH TOTALS
        ORDER BY o_orderstatus
        """,
        ["orders"],
    )


@defquery(
    "ch9_qualify",
    """
    SELECT user_id, event_id, value
    FROM events
    WHERE user_id < 20
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) = 1
    ORDER BY user_id
    """,
    doc="CH QUALIFY clause (filter on window results) → projected flag + "
        "outer filter; per-user top-1 stays a partitioned window, no "
        "global sort. DuckDB's native QUALIFY is the oracle.",
)
def ch9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT user_id, event_id, value
        FROM events
        WHERE user_id < 20
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) = 1
        ORDER BY user_id
        """,
        ["events"],
    )


# ---------------------------------------------------------------------------
# ch10+ — the r5 dialect tail: names mapped by the generated/hand template
# pass (VERDICT r4 item 1). Each query is CH SQL text through session.query.
# ---------------------------------------------------------------------------


@defquery(
    "ch10_vector_tail",
    """
    SELECT vec_id,
           round(sqrt(list_inner_product(emb, emb)), 2) AS l2,
           round(list_aggregate(list_transform(emb, x -> abs(x)), 'max'), 2) AS linf,
           round(list_inner_product(emb, emb), 2) AS dp
    FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
          FROM embeddings WHERE vec_id < 40)
    ORDER BY vec_id
    """,
    doc="CH vector tail as SQL text: L2Norm / LinfNorm / dotProduct over "
        "the embedding column — auto-derived HOF templates "
        "(dialect_gen.py), JVM-side transform/aggregate, no Python.",
)
def ch10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT vec_id,
               round(L2Norm(embedding), 2) AS l2,
               round(LinfNorm(embedding), 2) AS linf,
               round(dotProduct(embedding, embedding), 2) AS dp
        FROM embeddings WHERE vec_id < 40
        ORDER BY vec_id
        """,
        ["embeddings"],
    )


@defquery(
    "ch11_string_search_tail",
    """
    SELECT doc_id,
           CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS INT) AS n_the,
           coalesce(list_position(list_transform(['data', 'model', 'the'],
                                                 p -> contains(text, p)), true), 0) AS first_ix
    FROM documents WHERE doc_id < 40
    ORDER BY doc_id
    """,
    doc="countSubstrings + multiSearchFirstIndex (bracket array literal) as "
        "CH text — hand templates over replace/locate/HOFs, scan-speed.",
)
def ch11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT doc_id,
               countSubstrings(text, 'the') AS n_the,
               multiSearchFirstIndex(text, ['data', 'model', 'the']) AS first_ix
        FROM documents WHERE doc_id < 40
        ORDER BY doc_id
        """,
        ["documents"],
    )


@defquery(
    "ch12_array_fold_tail",
    """
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS fold_sum,
           round(sum(l_quantity), 2) AS plain_sum
    FROM lineitem WHERE l_orderkey < 500
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="arrayFold (CH lambda-first, hand template -> aggregate()) over "
        "arraySort(groupArray(x)) reproduces sum(x) exactly — proves the "
        "fold path against the plain aggregate oracle.",
)
def ch12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT l_returnflag,
               round(arrayFold((acc, x) -> acc + x,
                               arraySort(groupArray(l_quantity)),
                               toFloat64(0)), 2) AS fold_sum,
               round(sum(l_quantity), 2) AS plain_sum
        FROM lineitem WHERE l_orderkey < 500
        GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        ["lineitem"],
    )


@defquery(
    "ch13_json_tail",
    """
    SELECT o_orderkey,
           json_extract_string(j, '$.status') AS status,
           json_extract_string(j, '$.status') AS raw
    FROM (SELECT o_orderkey, concat('{"status":"', o_orderstatus, '"}') AS j
          FROM orders WHERE o_orderkey < 200)
    ORDER BY o_orderkey
    """,
    doc="JSON_VALUE / simpleJSONExtractRaw as CH text — standard-form and "
        "simpleJSON key templates over get_json_object.",
)
def ch13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               JSON_VALUE(j, '$.status') AS status,
               simpleJSONExtractRaw(j, 'status') AS raw
        FROM (SELECT o_orderkey, concat('{"status":"', o_orderstatus, '"}') AS j
              FROM orders WHERE o_orderkey < 200)
        ORDER BY o_orderkey
        """,
        ["orders"],
    )


@defquery(
    "ch14_bit_ip_tail",
    """
    SELECT c_custkey,
           concat_ws('.', ((k >> 24) & 255)::VARCHAR, ((k >> 16) & 255)::VARCHAR,
                     ((k >> 8) & 255)::VARCHAR, (k & 255)::VARCHAR) AS ip,
           (c_custkey >> 2) & 1 AS b2,
           (c_custkey << 3) AS rot
    FROM (SELECT c_custkey, (c_custkey * 2654435761) % 4294967296 AS k
          FROM customer WHERE c_custkey < 100)
    ORDER BY c_custkey
    """,
    doc="IPv4NumToString (auto-derived bit-shift template) + bitTest + "
        "bitRotateLeft (hand templates) as CH text; small keys keep the "
        "rotate equal to a plain shift so DuckDB mirrors it exactly.",
)
def ch14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT c_custkey,
               IPv4NumToString(toUInt32((c_custkey * 2654435761) % 4294967296)) AS ip,
               bitTest(c_custkey, 2) AS b2,
               bitRotateLeft(c_custkey, 3) AS rot
        FROM customer WHERE c_custkey < 100
        ORDER BY c_custkey
        """,
        ["customer"],
    )


@defquery(
    "ch15_cast_transform_tail",
    """
    SELECT o_orderkey,
           try_cast(o_orderpriority AS BIGINT) AS bad_cast,
           CAST(CAST(o_totalprice AS DECIMAL(38, 1)) AS VARCHAR) AS price_str,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done' ELSE '?' END AS st
    FROM orders WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    doc="accurateCastOrNull / toDecimalString / CH transform() value remap "
        "as SQL text — 2-arg cast family and lookup-map hand templates.",
)
def ch15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               accurateCastOrNull(o_orderpriority, 'Int64') AS bad_cast,
               toDecimalString(o_totalprice, 1) AS price_str,
               transform(o_orderstatus, ['O', 'F'], ['open', 'done'], '?') AS st
        FROM orders WHERE o_orderkey < 200
        ORDER BY o_orderkey
        """,
        ["orders"],
    )


@defquery(
    "ch16_asof_join",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), views_t AS (
      SELECT user_id, ts AS vts, max(value) AS vvalue
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.user_id, p.event_id, v.vts AS view_ts, v.vvalue AS view_value
    FROM purchases p ASOF JOIN views_t v
      ON p.user_id = v.user_id AND v.vts <= p.ts
    ORDER BY p.event_id
    """,
    doc="ClickHouse ASOF JOIN as SQL text (public CH join kind the "
        "reference engine runs natively): each purchase matched to the "
        "user's latest prior view. dialect.resolve_asof_join routes the "
        "constrained form through operators/asof.merge_asof_backward — "
        "one union + user-partitioned window, NOT the LATERAL-subquery "
        "decorrelation (measured: that plans a BroadcastNestedLoopJoin, "
        "forbidden by the suite plan pins and quadratic at scale). The "
        "oracle is DuckDB's native ASOF JOIN, verbatim semantics.",
)
def ch16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    ).createOrReplaceTempView("purchases")
    (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("vts"))
        .agg(F.max("value").alias("vvalue"))
    ).createOrReplaceTempView("views_t")
    from chdb_spark import session as chs

    return chs.query(
        spark,
        """
        SELECT p.user_id, p.event_id, v.vts AS view_ts, v.vvalue AS view_value
        FROM purchases p ASOF JOIN views_t v
          ON p.user_id = v.user_id AND v.vts <= p.ts
        ORDER BY p.event_id
        """,
        "DataFrame",
    )


@defquery(
    "ch17_any_join",
    """
    WITH first_orders AS (
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT c.c_custkey, o.o_orderkey AS first_order,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS first_price
    FROM customer c LEFT JOIN first_orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey <= 200
    ORDER BY c.c_custkey
    """,
    doc="ClickHouse ANY JOIN strictness as SQL text: at most one order row "
        "per customer. CH picks an arbitrary match; dialect.resolve_any_join "
        "uses the deterministic smallest-right-tuple refinement (documented "
        "divergence) via a key-partitioned row_number — per-key-bounded "
        "window, no global sort — which the oracle replays exactly "
        "(o_orderkey is unique, so ordering by it pins the pick).",
)
def ch17(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    from chdb_spark import session as chs

    return chs.query(
        spark,
        """
        SELECT c.c_custkey, o.o_orderkey AS first_order,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS first_price
        FROM customer c ANY LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey <= 200
        ORDER BY c.c_custkey
        """,
        "DataFrame",
    )


@defquery(
    "ch18_recursive_cte",
    """
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
             CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
      FROM orders
    ), months(m, hi) AS (
      SELECT lo, hi FROM bounds
      UNION ALL
      SELECT CAST((m + INTERVAL 1 MONTH) AS DATE), hi FROM months WHERE m < hi
    )
    SELECT m, count(o_orderkey) AS n
    FROM months LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
    GROUP BY m ORDER BY m
    """,
    doc="WITH RECURSIVE (public CH >= 24.4 SQL surface) passes through to "
        "Spark 4's native recursive CTE execution: a recursive month "
        "series spanning min..max order dates, LEFT JOINed to per-month "
        "order counts — the gap-filling idiom (months with zero orders "
        "appear with n=0). The min/max bounds are computed ONCE and carried "
        "through the recursion state — a correlated scalar subquery in the "
        "recursive step re-scans the table per iteration (measured 14.6 s "
        "vs 1 s at sf0.1). The recursion is driver-bounded (one row per "
        "month); the join/agg stay distributed.",
)
def ch18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        WITH RECURSIVE bounds AS (
          SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
                 CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
          FROM orders
        ), months(m, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT CAST((m + INTERVAL '1' MONTH) AS DATE), hi FROM months WHERE m < hi
        )
        SELECT m, count(o_orderkey) AS n
        FROM months LEFT JOIN orders
          ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY m ORDER BY m
        """,
        ["orders"],
    )


@defquery(
    "ch19_state_merge",
    """
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum,
           min(value) AS val_min,
           max(value) AS val_max,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
               AS val_avg,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ORDER BY event_type, day
    """,
    doc="-State/-Merge combinators in CH query text (the AggregatingMergeTree "
        "materialized-view pattern, reference datastore/core.py:6004): the "
        "inner SELECT builds hourly partial states (countState/sumState/"
        "minState/maxState/avgState/uniqExactState), the outer query "
        "re-aggregates them to daily grain with the matching -Merge "
        "functions. States are plain-value representations (dialect.py "
        "combinator block), so the merge is exact and the oracle is the "
        "direct daily aggregation over raw rows. Decimal sums keep the "
        "partial-merge order out of the float bits (g2 lesson).",
)
def ch19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ch(
        spark,
        sf_dir,
        """
        SELECT event_type,
               toDate(hour) AS day,
               countMerge(c_st) AS cnt,
               toFloat64(sumMerge(s_st)) AS val_sum,
               minMerge(mn_st) AS val_min,
               maxMerge(mx_st) AS val_max,
               avgMerge(a_st) AS val_avg,
               uniqExactMerge(u_st) AS n_users
        FROM (
            SELECT event_type,
                   toStartOfHour(ts) AS hour,
                   countState() AS c_st,
                   sumState(toDecimal64(value, 2)) AS s_st,
                   minState(value) AS mn_st,
                   maxState(value) AS mx_st,
                   avgState(toDecimal64(value, 2)) AS a_st,
                   uniqExactState(user_id) AS u_st
            FROM events
            GROUP BY event_type, toStartOfHour(ts)
        )
        GROUP BY event_type, toDate(hour)
        ORDER BY event_type, day
        """,
        ["events"],
    )
