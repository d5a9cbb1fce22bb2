#!/usr/bin/env python
"""Benchmark runner — times every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line to stdout (keys: metric, value, unit, sf,
queries — the full per-query timing map, r11 driver contract —
n_queries, mean_sec, slowest, queries_file) and also writes the
per-query map to BENCH_full.json next to this script (stdout tail
windows truncate; the file is the durable copy).

Conditions are pinned so round-over-round deltas mean something
(round-2 lesson: a busy machine produced a uniform ~2x phantom
"regression" across queries whose code hadn't changed):
  * each query runs BENCH_RUNS times (default 3) and reports the MEDIAN;
  * the 1-min load average before the run is recorded in BENCH_full.json
    ("load_1m_at_start") so a loaded-machine run is visibly suspect;
  * warmup spins the JVM, the Python/Arrow worker pool, and parquet
    footers before any timing.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def should_snapshot_round(
    sf_dir_env: str | None,
    load_1m: float | None,
    load_5m: float | None = None,
    load_15m: float | None = None,
) -> bool:
    """Whether this run may write the round's BENCH_full_r{N}.json.

    False when (a) the run targets a non-default sf dir (a quick sf0.01 dev
    drive must not clobber the round's sf0.1 artifact — happened r8), or
    (b) the host was loaded at start: load_1m > 2 (r9's driver run at load
    7.15 inflated every query ~29% and minted 12 phantom outliers,
    BASELINE.md §J), load_5m > 6 (r10: a RECOVERING host right after the
    43-min suite showed load_1m 0.23 / load_5 ≈ 8 and minted 13 phantom
    outliers, §N), or load_15m > 4 (r10 verdict: the committed artifact
    was minted at load_1m 0.10 / load_5 0.93 / load_15 10.96 — the first
    two alone passed the guard while the run carried a ~1.3× drift tail).
    BENCH_full.json is still written either way.
    """
    if sf_dir_env not in (None, "/root/testdata/sf0.1"):
        return False
    if load_1m is not None and load_1m > 2.0:
        return False
    if load_5m is not None and load_5m > 6.0:
        return False
    if load_15m is not None and load_15m > 4.0:
        return False
    return True


#: Queries whose FIRST run at an sf_dir builds an on-disk artifact
#: (lakehouse scratch tables, streaming re-shards, persisted indexes,
#: the token-shard/Z-order layouts). The driver times single runs, so a
#: first-run build would enter the committed per-query map as a phantom
#: outlier (r10: dl2/ic2/ic3/hu2 carried ~1-2 s of fixture build) —
#: bench warms these once UNTIMED before the timed loop.
FIXTURE_QUERIES = [
    "dl1_delta_time_travel", "dl2_delta_deletion_vectors",
    "dl3_delta_delete_dv",
    "hu1_hudi_snapshot", "hu2_hudi_mor",
    "ic0_iceberg_snapshot", "ic1_iceberg_roundtrip",
    "ic2_iceberg_partitioned", "ic3_iceberg_pos_delete",
    "ic4_iceberg_bucket_days", "ic5_iceberg_nested",
    "sm6_streaming_neardup", "sm7_streaming_dedup_watermark",
    "sm8_streaming_rollup", "wr1_token_shards",
    "zo1_zorder_rectangle", "dd14_incremental_dedup", "s5_ivf_index",
    "sp1_spread_sample",
]


def prewarm_memory(gb: int = 24) -> float:
    """Fault guest RAM in UNTIMED, before any query timing (r11 finding).

    This sandbox's VM lazily backs guest memory (dmesg: "Free page
    reporting enabled"): the first 4 KiB-page touch of never-yet-backed
    memory costs ~130-470 µs — a fresh 2 GB numpy buffer measured 50-230 s
    to first-touch on a cold pool, and the effect is THE mechanism behind
    the "~1.3x host-day drift" BASELINE.md has tracked since r2 (JVM
    heap growth, Arrow buffers, and Python worker allocations all pay it
    mid-query, non-deterministically). Touching one byte per 2 MiB region
    of a MADV_HUGEPAGE mapping faults the same memory ~512x cheaper, so a
    few seconds here removes minutes of noise from the timed loop.
    Touches min(gb, MemAvailable - 8) GiB; never raises (best-effort —
    timing-noise insurance, not a correctness step)."""
    import ctypes
    import mmap

    t0 = time.perf_counter()
    try:
        with open("/proc/meminfo") as f:
            avail_gb = next(
                int(line.split()[1]) // (1024 * 1024)
                for line in f
                if line.startswith("MemAvailable")
            )
        target = max(0, min(gb, avail_gb - 8))
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        chunk = 4 << 30
        bufs = []
        try:
            for _ in range(max(0, target * (1 << 30) // chunk)):
                buf = mmap.mmap(-1, chunk)
                addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
                libc.madvise(
                    ctypes.c_void_p(addr), ctypes.c_size_t(chunk), 14
                )  # MADV_HUGEPAGE
                for off in range(0, chunk, 2 << 20):
                    buf[off] = 1
                bufs.append(buf)
        finally:
            for buf in bufs:
                buf.close()
    except Exception:
        pass
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    runs = int(os.environ.get("BENCH_RUNS", "3"))

    from chdb_spark.queries import all_queries
    from chdb_spark.session import get_spark

    try:
        la = os.getloadavg()
        load_1m = round(la[0], 2)
        load_5m, load_15m = round(la[1], 2), round(la[2], 2)
    except OSError:
        load_1m = load_5m = load_15m = None

    prewarm_sec = prewarm_memory()

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
    # Untimed fixture pre-build (r10 verdict #2): first-run scratch
    # builds must never enter the committed per-query map.
    for name in FIXTURE_QUERIES:
        if name in queries:
            queries[name].spark(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs_per_query": runs,
        "aggregation": "median",
        "load_1m_at_start": load_1m,
        # r10 lesson (BASELINE.md §N): a recovering host shows load_1m
        # near 0 while load_5/15 are still double digits — record all
        # three so a reader can spot the §J signature either way
        "load_5m_at_start": load_5m,
        "load_15m_at_start": load_15m,
        "memory_prewarm_sec": prewarm_sec,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "BENCH_full.json")
    # Per-round retention (VERDICT r3 item 7): snapshot the per-query map as
    # BENCH_full_r{N}.json, N = the next round judging from the driver's
    # BENCH_r{N}.json files, so a judge can diff per-query regressions
    # instead of only suite totals. Overwritten within a round, kept across.
    # Snapshot ONLY the driver-shaped run (default sf dir): a quick
    # sf0.01 dev drive must not clobber the round's sf0.1 artifact
    # (happened in r8 — restored from git).
    snapshot_round = should_snapshot_round(
        os.environ.get("SPARK_GRAFT_SF_DIR"), load_1m, load_5m, load_15m
    )
    if not snapshot_round and (
        (load_1m is not None and load_1m > 2.0)
        or (load_5m is not None and load_5m > 6.0)
        or (load_15m is not None and load_15m > 4.0)
    ):
        full["snapshot_skipped_loaded_host"] = True
    import glob as _glob

    rounds = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
    ]
    r_next = (max(rounds) + 1) if rounds else 1
    # Per-query outlier flags (VERDICT r5 item 5: a 3x single-query jump
    # must surface in the artifact, not vanish into the suite total).
    # Compared against the PREVIOUS round's per-query map at the same sf;
    # >=2.5x AND >=0.5 s absolute slower is flagged. Host drift between
    # sessions is uniform (~1.3x measured) — a per-query 2.5x is real.
    prev_path = os.path.join(here, f"BENCH_full_r{r_next - 1:02d}.json")
    outliers = {}
    if os.path.exists(prev_path):
        try:
            with open(prev_path) as f:
                prev = json.load(f)
            if prev.get("sf") == sf_val:
                for name, t in timings.items():
                    p = prev.get("queries", {}).get(name)
                    if p and t >= 2.5 * p and t - p >= 0.5:
                        outliers[name] = {"prev": p, "now": t}
        except (ValueError, OSError):
            pass
    full["outliers_vs_prev_round"] = outliers
    # Lakehouse availability probe (VERDICT r6 #6): record WHY the
    # Iceberg/Delta/Hudi SURVEY rows stay `partial` in this environment —
    # the gated tests (tests/test_lakehouse_gated.py) activate the moment
    # any probe flips to true, with zero code changes.
    def _jvm_class(cls: str) -> bool:
        try:
            spark.sparkContext._jvm.java.lang.Class.forName(cls)
            return True
        except Exception:
            return False

    try:
        import importlib.util as _ilu

        _pip_delta = _ilu.find_spec("delta") is not None
    except Exception:
        _pip_delta = False
    full["lakehouse_probe"] = {
        "iceberg_jar": _jvm_class("org.apache.iceberg.spark.SparkCatalog"),
        "delta_jar": _jvm_class("org.apache.spark.sql.delta.catalog.DeltaCatalog"),
        "hudi_jar": _jvm_class("org.apache.hudi.DefaultSource"),
        "pip_delta_spark": _pip_delta,
        "note": "jar probes (tests/test_lakehouse_gated.py runs the jar "
        "round-trips when present). Since r8 the jars are no longer "
        "required for local tables: Delta reads+writes and Hudi-CoW/"
        "Iceberg read via the pure-Python clients (sources/delta_py.py, "
        "hudi_py.py, iceberg_py.py; driver-checked by dl1)",
    }
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    if snapshot_round:
        with open(
            os.path.join(here, f"BENCH_full_r{r_next:02d}.json"), "w"
        ) as f:
            json.dump(full, f, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "queries": timings,
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
