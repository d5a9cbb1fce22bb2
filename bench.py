#!/usr/bin/env python
"""Benchmark runner — times every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a JVM/parquet-footer warmup pass, timed
to full materialization (collect) — the same work the driver's oracle does.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from chdb_spark.queries import all_queries
    from chdb_spark.session import get_spark

    spark = get_spark(app_name="chdb_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warmup: spin the JVM, Python workers, and parquet footers once.
    queries["q1_pricing_summary"].spark(spark, sf_dir).collect()
    # Python/Arrow worker pool warmup (first mapInPandas in a session pays
    # daemon spawn + numpy/pandas import across all worker slots).
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (pdf.assign(x=__import__("numpy").float64(1.0)) for pdf in it),
        "id long, x double",
    ).collect()

    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    # Full per-query map goes to a file (the ~3 KB one-liner got truncated
    # by the driver's stdout tail window in round 1); the FINAL stdout line
    # is a compact (<500 char) summary the driver can always parse.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "mean_sec": round(total / max(len(timings), 1), 4),
                "slowest": slowest,
                "queries_file": "BENCH_full.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
