#!/usr/bin/env python
"""Generate a LARGER scale factor from the driver's sf0.1 testdata by
key-shifted replication (BASELINE.md §O / r10 verdict #1: measure the
fixed fresh-plan floor amortizing end-to-end, not just by decomposition).

K copies of every fact table, entity keys shifted by a copy stride so
referential integrity holds exactly (lineitem.l_orderkey -> orders,
orders.o_custkey -> customer, ...); dimension tables (region, nation)
are shared. Texts/vectors repeat verbatim — a fair A/B (Spark and
DuckDB read the SAME files) even where duplication densifies the
near-dup workload.

Usage: python tools/gen_scaled_sf.py [K] [OUT_DIR]
  default K=5 → "sf0.5" from sf0.1, OUT_DIR=/tmp/chdb_scaled_sf05
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 100_000_000  # far above any sf0.1 key range

#: table -> columns to shift by copy*STRIDE (referential pairs share it)
SHIFT = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else f"/tmp/chdb_scaled_sf0{k}"
    )
    src = "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from chdb_spark.session import get_spark, read_table

    spark = get_spark(app_name="gen_scaled_sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for table, shift_cols in SHIFT.items():
        dest = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            continue
        df = read_table(spark, os.path.join(src, f"{table}.parquet"))
        if not shift_cols:
            out = df  # shared dimension
        else:
            copies = []
            for c in range(k):
                cp = df
                for col in shift_cols:
                    cp = cp.withColumn(
                        col, F.col(col) + F.lit(c * STRIDE).cast("long")
                    )
                if table == "documents" and c > 0:
                    # per-copy deterministic text transforms: verbatim
                    # copies would make every doc 4 identical twins and
                    # blow the near-dup pair count (and the O(pairs)
                    # brute-force oracles) QUADRATICALLY in k — a real
                    # 5x corpus has ~5x the near-dup mass, not 25x
                    t = F.col("text")
                    t = [
                        t,
                        F.reverse(t),
                        F.translate(t, "aeiouAEIOU", "0123401234"),
                        F.reverse(F.translate(t, "aeiouAEIOU", "0123401234")),
                        F.translate(t, "etaoinETAOIN", "xzqwvyXZQWVY"),
                    ][c % 5]
                    cp = cp.withColumn("text", t).withColumn(
                        "n_chars", F.length("text").cast("long")
                    )
                copies.append(cp)
            out = copies[0]
            for cp in copies[1:]:
                out = out.unionByName(cp)
        out.write.mode("overwrite").parquet(dest)
        print(f"{table}: {out.count()} rows -> {dest}", flush=True)


if __name__ == "__main__":
    main()
