#!/usr/bin/env python
"""Capture explain('formatted') for every headline query and flag
plan-shape pathologies (guide §7.2): Python-eval nodes, nested-loop /
cartesian joins, duplicated scan subtrees, unexpected single-partition
exchanges. Plans are written to --out-dir; a JSON summary to --json.

Note: building some queries executes driver-side work (eager
checkpoints, training loops); this sweep is for *shape* analysis, not
timing.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="/tmp/plans_all")
    ap.add_argument("--json", dest="json_out", default="/tmp/plan_sweep.json")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from chdb_spark.queries import all_queries
    from chdb_spark.session import get_spark

    spark = get_spark(app_name="plan_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    os.makedirs(args.out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    summary: dict[str, dict] = {}
    names = args.only or sorted(queries)
    for name in names:
        q = queries[name]
        rec: dict = {}
        try:
            df = q.spark(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            rec["error"] = f"{type(exc).__name__}: {exc}"
            summary[name] = rec
            traceback.print_exc(limit=1)
            continue
        with open(os.path.join(args.out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        rec["n_exchange"] = len(re.findall(r"\bExchange\b", plan))
        rec["single_part"] = len(re.findall(r"SinglePartition", plan))
        rec["python_eval"] = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython", plan)
        )
        rec["map_in_x"] = len(re.findall(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan))
        rec["bnlj"] = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        rec["cartesian"] = len(re.findall(r"CartesianProduct", plan))
        rec["smj"] = len(re.findall(r"SortMergeJoin", plan))
        rec["bhj"] = len(re.findall(r"BroadcastHashJoin", plan))
        rec["window"] = len(re.findall(r"\bWindow\b", plan))
        rec["sort"] = len(re.findall(r"\bSort\b", plan))
        # duplicated scan subtrees: same parquet location scanned k times
        locs = re.findall(r"Location: \S+\[([^\]]*)\]", plan)
        from collections import Counter

        dup = {loc.split("/")[-1]: c for loc, c in Counter(locs).items() if c > 1}
        if dup:
            rec["dup_scans"] = dup
        rows_scans = re.findall(r"Scan ExistingRDD", plan)
        rec["existing_rdd"] = len(rows_scans)
        summary[name] = rec
    with open(args.json_out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    flagged = {
        n: r
        for n, r in summary.items()
        if r.get("bnlj") or r.get("cartesian") or r.get("dup_scans")
        or (r.get("python_eval", 0) >= 2) or r.get("error")
    }
    print(json.dumps(flagged, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
