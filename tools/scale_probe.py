#!/usr/bin/env python
"""Floor-amortization probe (r10 verdict #1): run the floor-dominated
and heavy queries PAIRED (Spark + DuckDB oracle, interleaved in one
session on one host) at sf0.1 AND at a key-shifted larger sf
(tools/gen_scaled_sf.py), and report how the Spark/DuckDB ratio moves
as data grows. Interleaved A/B per the repo's bench discipline — host
drift cancels inside a pair; the ratio-of-ratios is the signal.

Queries whose ORACLE is structurally super-linear (dd2/dd3's brute-force
O(N^2) pair scan, e1's triple self-join — 45 s in DuckDB at sf0.1
already) are measured Spark-side at both scale factors with ONE capped
DuckDB attempt (subprocess, hard-killed at the cap): at scale the oracle is the
infeasible formulation and that asymmetry is itself the §O finding.

Usage: python tools/scale_probe.py [SCALED_DIR] [RUNS] [DUCK_CAP_S]
Writes JSON to /tmp/scale_probe_result.json and prints progress lines.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRED = [
    # floor-dominated at sf0.1 (multi-job / fresh-plan cost >> data cost)
    "tc1_triangle_stats", "st2_rank_corr", "q21_waiting_suppliers",
    "ch7_with_fill", "cb20_paginated_range", "cb23_multi_like_uniq",
    # heavy families with tractable oracles
    "s2_ann_ivf", "wr1_token_shards",
    # control (already near-parity)
    "q1_pricing_summary",
]

#: oracle structurally super-linear — Spark timings + one capped attempt
SPARK_ONLY = ["dd2_minhash_lsh", "dd3_simhash", "e1_window_funnel"]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def log(line: str) -> None:
    print(line, flush=True)
    with open("/tmp/scale_probe_progress.log", "a") as f:
        f.write(line + "\n")


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


def duck_capped(sf_dir: str, sql: str, cap_s: float):
    """(seconds, finished?) — the oracle runs in a SUBPROCESS killed at
    the cap (duckdb's in-process interrupt proved unreliable inside big
    pipelines: an e1 attempt ran 7+ min past a 120 s timer)."""
    import subprocess

    prog = (
        "import sys, time, os, duckdb\n"
        f"sf = {sf_dir!r}\n"
        "con = duckdb.connect()\n"
        f"tables = {TABLES!r}\n"
        "for t in tables:\n"
        "    p = os.path.join(sf, t + '.parquet')\n"
        "    src = repr(p) if os.path.isfile(p) else repr(p + '/*.parquet')\n"
        "    con.execute('CREATE VIEW ' + t + ' AS SELECT * FROM "
        "read_parquet(' + src + ')')\n"
        "t0 = time.perf_counter()\n"
        f"con.execute({sql!r}).fetchall()\n"
        "print(time.perf_counter() - t0)\n"
    )
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-c", prog], capture_output=True,
            timeout=cap_s, text=True,
        )
        if out.returncode == 0:
            return float(out.stdout.strip().splitlines()[-1]), True
        return time.perf_counter() - t0, False
    except subprocess.TimeoutExpired:
        return time.perf_counter() - t0, False


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chdb_scaled_sf05"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cap = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    from chdb_spark.queries import all_queries
    from chdb_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out: dict = {"load_at_start": list(os.getloadavg()), "runs": runs,
                 "duck_cap_s": cap, "sf_dirs": {}}
    for sf_dir in ["/root/testdata/sf0.1", scaled]:
        tag = os.path.basename(sf_dir)
        con = duck_con(sf_dir)
        # untimed warmup: plan caches, fixture builds (wr1 shards, s2 ivf)
        for name in PAIRED + SPARK_ONLY:
            log(f"warmup {tag} {name}")
            qs[name].spark(spark, sf_dir).collect()
        for name in PAIRED:
            con.execute(qs[name].oracle).fetchall()  # duck warmup
        res = {}
        for name in PAIRED:
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
                    statistics.median(s_t)
                    / max(statistics.median(d_t), 1e-9),
                    3,
                ),
            }
            log(f"{tag} {name}: {res[name]}")
            out["sf_dirs"][sf_dir] = res
            with open("/tmp/scale_probe_result.json", "w") as f:
                json.dump(out, f, indent=1)
        for name in SPARK_ONLY:
            s_t = []
            for _ in range(runs):
                t0 = time.perf_counter()
                qs[name].spark(spark, sf_dir).collect()
                s_t.append(time.perf_counter() - t0)
            d_s, finished = duck_capped(sf_dir, qs[name].oracle, cap)
            res[name] = {
                "spark": round(statistics.median(s_t), 4),
                "duckdb": round(d_s, 2) if finished else None,
                "duckdb_infeasible_over_s": None if finished else cap,
            }
            log(f"{tag} {name}: {res[name]}")
            out["sf_dirs"][sf_dir] = res
            with open("/tmp/scale_probe_result.json", "w") as f:
                json.dump(out, f, indent=1)  # incremental: survive kills
        con.close()
    out["load_at_end"] = list(os.getloadavg())
    with open("/tmp/scale_probe_result.json", "w") as f:
        json.dump(out, f, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
