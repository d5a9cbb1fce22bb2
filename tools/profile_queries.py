#!/usr/bin/env python
"""Ad-hoc per-query timer for perf work: times the named queries at
$SPARK_GRAFT_SF_DIR (default sf0.1) with the same session config as
bench.py, printing per-run samples (not just the median) so job-level
variance is visible while iterating.

Usage: python tools/profile_queries.py tc1_triangle_stats st2_rank_corr ...
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))

    from chdb_spark.queries import all_queries
    from chdb_spark.session import get_spark

    spark = get_spark(app_name="chdb_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    # same warmup as bench.py
    queries["q1_pricing_summary"].spark(spark, sf_dir).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (pdf.assign(x=__import__("numpy").float64(1.0)) for pdf in it),
        "id long, x double",
    ).collect()

    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            queries[name].spark(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: median={statistics.median(samples):.3f} runs={samples}",
              flush=True)


if __name__ == "__main__":
    main()
