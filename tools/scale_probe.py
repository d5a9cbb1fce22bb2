#!/usr/bin/env python
"""Floor-amortization probe (r10 verdict #1): run the floor-dominated
and heavy queries PAIRED (Spark + DuckDB oracle, interleaved in one
session on one host) at sf0.1 AND at a key-shifted larger sf
(tools/gen_scaled_sf.py), and report how the Spark/DuckDB ratio moves
as data grows. Interleaved A/B per the repo's bench discipline — host
drift cancels inside a pair; the ratio-of-ratios is the signal.

Usage: python tools/scale_probe.py [SCALED_DIR] [RUNS]
Writes JSON to stdout and to /tmp/scale_probe_result.json.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # floor-dominated at sf0.1 (multi-job / fresh-plan cost >> data cost)
    "tc1_triangle_stats", "st2_rank_corr", "q21_waiting_suppliers",
    "ch7_with_fill", "cb20_paginated_range", "cb23_multi_like_uniq",
    # heavy families (real data work)
    "dd2_minhash_lsh", "dd3_simhash", "s2_ann_ivf", "e1_window_funnel",
    "wr1_token_shards",
    # control (already near-parity)
    "q1_pricing_summary",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"'{p}'" if os.path.isfile(p) else f"'{p}/*.parquet'"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})"
        )
    return con


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chdb_scaled_sf05"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from chdb_spark.queries import all_queries
    from chdb_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out: dict = {"load_at_start": list(os.getloadavg()), "runs": runs,
                 "sf_dirs": {}}
    for sf_dir in ["/root/testdata/sf0.1", scaled]:
        con = duck_con(sf_dir)
        # untimed warmup: plan caches, fixture builds (wr1 shards, s2 ivf)
        for name in QUERIES:
            qs[name].spark(spark, sf_dir).collect()
            con.execute(qs[name].oracle).fetchall()
        res = {}
        for name in QUERIES:
            s_t, d_t = [], []
            for _ in range(runs):  # interleaved pairs: drift cancels
                t0 = time.perf_counter()
                qs[name].spark(spark, sf_dir).collect()
                s_t.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                con.execute(qs[name].oracle).fetchall()
                d_t.append(time.perf_counter() - t0)
            res[name] = {
                "spark": round(statistics.median(s_t), 4),
                "duckdb": round(statistics.median(d_t), 4),
                "ratio": round(
                    statistics.median(s_t) / max(statistics.median(d_t), 1e-9),
                    3,
                ),
            }
            print(f"{os.path.basename(sf_dir)} {name}: {res[name]}",
                  flush=True)
        out["sf_dirs"][sf_dir] = res
        con.close()
    out["load_at_end"] = list(os.getloadavg())
    with open("/tmp/scale_probe_result.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
