"""Headline query suite — TPC-H-shaped analytics over the synthetic tables.

Mirrors the reference's benchmark surface (examples/chDB_tpch.ipynb: 22
TPC-H queries over parquet via the file() table function;
benchmark/clickbench.py:14-60: GROUP BY + ORDER BY + LIMIT shapes), adapted
to the driver schema (TESTDATA.md).

Every query is defined twice, deliberately:
  * ``spark``  — a Callable[(SparkSession, sf_dir) -> DataFrame] built with
    the DataFrame API (Catalyst plans it; filters/projections push into the
    parquet scan, AQE picks join strategies at runtime).
  * ``oracle`` — the equivalent ANSI SQL for the DuckDB correctness oracle.

Column-name parity between the two is load-bearing: the driver sorts columns
by name and hashes values, so every computed column is aliased identically
on both sides. Double-typed aggregates are rounded to 2 decimals on BOTH
sides so floating-point summation order (Spark's parallel partial aggs vs
DuckDB's) cannot flip the hash.

Scale notes (the point of this repo — 100 TB posture, SURVEY.md §4.2):
  * region/nation are always broadcast (tiny dimension tables at any SF).
  * Joins between big tables (lineitem x orders) shuffle on the join key —
    co-partitioned, no driver-side collection anywhere.
  * Aggregations are expressed so Catalyst emits partial (map-side) +
    final hash aggregation; no Python crosses the row path.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


_QUERIES: dict[str, QueryDef] = {}


def defquery(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _QUERIES[name] = QueryDef(name, fn, oracle, doc)
        return fn

    return deco


def _family(name: str) -> str:
    """Leading alpha prefix: q1→q, cb21→cb, ch3→ch, dd2→dd, fx2→fx …"""
    i = 0
    while i < len(name) and name[i].isalpha():
        i += 1
    return name[:i] or name


def _driver_check_history() -> dict[str, tuple[int, bool]]:
    """Map query name → (most recent round whose CORRECTNESS_r{N}.json
    sampled it, whether that most-recent sample was fully green). Never
    sampled → absent. Reads the driver-written files at the repo root;
    tolerant of absence (fresh clone, tests)."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        if not isinstance(rows, dict):
            continue  # tolerant contract: a list/scalar payload is skipped
        for name, row in rows.items():
            green = bool(
                row.get("rows_match", True)
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and row.get("err") is None
            ) if isinstance(row, dict) else True
            if name not in last or rnd > last[name][0]:
                last[name] = (rnd, green)
    return last


def all_queries() -> dict[str, QueryDef]:
    # import registers operator-backed queries too
    from chdb_spark.operators import register_operator_queries

    register_operator_queries()
    # Round-robin interleave by family prefix, each family's lane ordered
    # by "rounds since last driver check". The driver's CORRECTNESS sample
    # takes the FIRST 50 dict entries; plain registration order put ~all
    # TPC-H/dedup first and left newer families formally unsampled
    # (VERDICT r4 item 5 → interleave), and a FIXED interleave re-samples
    # the same 50 forever, leaving ~half the suite never driver-checked
    # (VERDICT r5 next-round #3 → rotate). Sorting each lane by
    # least-recently-checked (never-checked first, stable on registration
    # order) makes each round's prefix drain the unchecked backlog while
    # staying family-representative.
    history = _driver_check_history()
    out: dict[str, QueryDef] = {}

    def _interleave(qdefs: list[QueryDef]) -> None:
        buckets: dict[str, list[QueryDef]] = {}
        for q in qdefs:
            buckets.setdefault(_family(q.name), []).append(q)
        lanes = list(buckets.values())
        i = 0
        while any(lanes):
            for lane in lanes:
                if i < len(lane):
                    out[lane[i].name] = lane[i]
            lanes = [ln for ln in lanes if len(ln) > i + 1]
            i += 1

    # tier 0: queries whose MOST RECENT driver sample was RED — after a fix
    #   they are the only rows the brief counts as fail, so they must be
    #   re-verified before the backlog drains (VERDICT r6 next-round #2),
    # tier 1: everything the driver has NEVER checked (family-interleaved —
    #   the backlog should drain family-representative),
    # tier 2: checked-green queries in STRICT least-recently-checked order
    #   (no family interleave: once the backlog is empty the goal flips
    #   from family coverage to bounded staleness — strict LRU re-verifies
    #   every green within ceil(N/50) rounds, where the r8-era interleave
    #   let a large family's old members age ~indefinitely behind other
    #   families' fresher heads; VERDICT r8 next-round #7)
    qs = list(_QUERIES.values())
    _interleave([q for q in qs if q.name in history and not history[q.name][1]])
    _interleave([q for q in qs if q.name not in history])
    for q in sorted((q for q in qs if q.name in history and history[q.name][1]),
                    key=lambda q: history[q.name][0]):
        out[q.name] = q
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from chdb_spark.session import read_table

    return read_table(spark, os.path.join(sf_dir, f"{name}.parquet"))


def table_rows_upper_bound(sf_dir: str, name: str) -> int | None:
    """Row count of a source table from parquet footer metadata — the
    catalog statistic a production metastore (or Spark CBO with ANALYZE
    TABLE stats) provides for free, read here straight from the footers
    (no Spark job, no scan). Callers use it as an UPPER BOUND on derived
    relations (any per-row transformation without joins/explodes yields
    ≤ this many rows) to pick cost-based lanes without a runtime probe
    job — see pagerank/triangle_stats ``input_rows``. None when the path
    is not local parquet (caller falls back to the probe)."""
    try:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.ParquetFile(
                            os.path.join(root, f)
                        ).metadata.num_rows
            return total
    except Exception:
        return None
    return None


def _r2(c) -> F.Column:
    return F.round(c, 2)


# ---------------------------------------------------------------------------
# Q1 — pricing summary report (TPC-H Q1 shape; reference chDB_tpch.ipynb q1)
# ---------------------------------------------------------------------------


@defquery(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                    AS avg_qty,
           round(avg(l_extendedprice), 2)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="scan → filter → 8-agg groupBy → sort. Partial+final hash agg; filter pushed to parquet.",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(disc_price)).alias("sum_disc_price"),
            _r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r2(F.avg("l_quantity")).alias("avg_qty"),
            _r2(F.avg("l_extendedprice")).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q3 — top unshipped orders by revenue (TPC-H Q3 shape)
# ---------------------------------------------------------------------------


@defquery(
    "q3_top_orders",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="3-way join (customer filtered before join) → agg → top-10 (TakeOrdered).",
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (TPC-H Q4 shape: EXISTS → left-semi join)
# ---------------------------------------------------------------------------


@defquery(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="EXISTS → left_semi join (no row multiplication, no distinct needed).",
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (TPC-H Q5 shape; multi-join with broadcast dims)
# ---------------------------------------------------------------------------


@defquery(
    "q5_region_revenue",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="6-way join; nation/region broadcast explicitly; big sides shuffle on keys.",
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (TPC-H Q6; pure scan-filter-sum)
# ---------------------------------------------------------------------------


@defquery(
    "q6_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="all 4 predicates pushed to parquet scan; single global agg.",
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


# ---------------------------------------------------------------------------
# Q10 — returned item reporting (TPC-H Q10 shape; top 20 customers)
# ---------------------------------------------------------------------------


@defquery(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="fact-fact shuffle join + broadcast nation; top-20 via TakeOrdered.",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", _r2(F.col("c_acctbal")).alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12-ish — shipping mode / priority cross-aggregation with conditional aggs
# ---------------------------------------------------------------------------


@defquery(
    "q12_priority_shipping",
    """
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="conditional aggregation (countIf analogue: sum(when)) after equi-join.",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13-ish — customer order-count distribution (left outer join + two-level agg)
# ---------------------------------------------------------------------------


@defquery(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="left outer join + double aggregation (the classic two-shuffle shape).",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14-ish — brand revenue share (join part + conditional agg ratio)
# ---------------------------------------------------------------------------


@defquery(
    "q14_promo_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="join + ratio of conditional sums, one pass.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev), 2
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q18-ish — large-volume customers (agg → having → join back)
# ---------------------------------------------------------------------------


@defquery(
    "q18_large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 150
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    doc="agg + HAVING (post-agg filter) + top-100.",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # Aggregate lineitem by orderkey BEFORE any join (the classic Q18
    # rewrite): the 5-key groupBy is keyed by o_orderkey anyway (c_name /
    # o_orderdate / o_totalprice are functionally dependent on it), so
    # summing first shuffles ONE narrow column pair instead of the joined
    # row, and the >150 HAVING cuts the surviving keys to a sliver that
    # then joins orders/customer — at 100 TB the big join's probe side
    # shrinks from all of lineitem to the filtered aggregate.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sum_qty_raw"))
        .filter(F.col("_sum_qty_raw") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            _r2(F.col("o_totalprice")).alias("o_totalprice"),
            _r2(F.col("_sum_qty_raw")).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# top-k per group — window function headline (SURVEY §2.6)
# ---------------------------------------------------------------------------


@defquery(
    "w1_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t
    WHERE rn <= 3 AND o_custkey <= 100
    ORDER BY o_custkey, rn
    """,
    doc="row_number over (partition by customer) — single hash-partition shuffle, no sort-merge.",
)
def w1(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") <= 100))
        .select("o_custkey", "o_orderkey", _r2(F.col("o_totalprice")).alias("o_totalprice"), "rn")
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# cumulative window — running revenue per customer over time
# ---------------------------------------------------------------------------


@defquery(
    "w2_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
    doc="cumulative frame (pandas cumsum analogue, SURVEY §2.6 runningAccumulate).",
)
def w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            _r2(F.sum("o_totalprice").over(w)).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# lag/lead — day-over-day event deltas
# ---------------------------------------------------------------------------


@defquery(
    "w3_event_deltas",
    """
    SELECT day, n_events,
           n_events - lag(n_events) OVER (ORDER BY day) AS delta
    FROM (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1
    ) t
    ORDER BY day
    """,
    doc="agg → lag over ordered window (single-partition window on day grain: tiny cardinality).",
)
def w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("n_events"))
    w = Window.orderBy("day")
    return (
        daily.withColumn("delta", F.col("n_events") - F.lag("n_events").over(w))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# distinct / dedup / set ops
# ---------------------------------------------------------------------------


@defquery(
    "d1_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="uniqExact analogue — count_distinct with partial aggregation.",
)
def d1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@defquery(
    "d2_dedup_keep_first",
    """
    SELECT user_id, event_type, event_id
    FROM (
        SELECT user_id, event_type, event_id,
               row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events
    ) t WHERE rn = 1 AND user_id <= 30
    ORDER BY user_id, event_type
    """,
    doc="drop_duplicates(subset, keep='first') → row_number window (SURVEY §2.7: LIMIT 1 BY analogue).",
)
def d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("user_id") <= 30))
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# array / higher-order — vector math over embeddings (SURVEY §2.8-Geo)
# ---------------------------------------------------------------------------


@defquery(
    "v1_vector_norms",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding, x -> x * x))), 4) AS l2_norm,
           round(list_sum(list_transform(embedding, x -> abs(x))), 4)      AS l1_norm,
           len(embedding) AS dim
    FROM embeddings
    WHERE vec_id < 50
    ORDER BY vec_id
    """,
    doc="higher-order array functions (aggregate/transform) — JVM-side, no UDF.",
)
def v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.functions import fn

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id",
        F.round(fn("L2Norm")(F.col("embedding")), 4).alias("l2_norm"),
        F.round(fn("L1Norm")(F.col("embedding")), 4).alias("l1_norm"),
        F.size("embedding").alias("dim"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# grouping sets / rollup (Spark-native superset, SURVEY §2.5)
# ---------------------------------------------------------------------------


@defquery(
    "g1_rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP — exposed natively (reference reaches it only via raw SQL, SURVEY §2.5).",
)
def g1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_r2(F.sum("l_extendedprice")).alias("sum_price"), F.count("*").alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )
