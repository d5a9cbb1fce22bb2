#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds (guide §1).

Times a named subset of headline queries in one warmed session:
  * timed action = the bench's `.collect()` (driver-comparable) and,
    with --noop, ALSO the noop sink (computation-only, guide §1.4);
  * N runs each (median reported, all samples kept);
  * optionally dumps `.explain("formatted")` to plans/<tag>/<name>_<suffix>.txt.

Usage:
  python tools/opt_measure.py q21_waiting_suppliers st2_rank_corr \
      [--runs 3] [--sf-dir /root/testdata/sf0.1] [--noop] \
      [--plans plans/r11 --suffix before] [--json /tmp/out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    from bench import prewarm_memory
    from chdb_spark.queries import all_queries
    from chdb_spark.session import get_spark

    prewarm_memory()  # untimed guest-RAM fault-in (bench.py r11 finding)
    spark = get_spark(app_name="opt_measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; known e.g. {list(queries)[:5]}")

    # Warmup identical to bench.py: JVM, Python worker pool, parquet footers.
    queries["q1_pricing_summary"].spark(spark, args.sf_dir).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (pdf.assign(x=__import__("numpy").float64(1.0)) for pdf in it),
        "id long, x double",
    ).collect()
    # Fixture queries build scratch state on first run — warm each target once.
    for name in args.names:
        queries[name].spark(spark, args.sf_dir).collect()

    out: dict[str, dict] = {}
    for name in args.names:
        q = queries[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        rec: dict = {}
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            q.spark(spark, args.sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        rec["collect"] = {"median": round(statistics.median(samples), 4), "samples": samples}
        if args.noop:
            nsamples = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                q.spark(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                nsamples.append(round(time.perf_counter() - t0, 4))
            rec["noop"] = {"median": round(statistics.median(nsamples), 4), "samples": nsamples}
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = queries[name].spark(spark, args.sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(json.dumps({name: rec}))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
