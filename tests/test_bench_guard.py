"""bench.py round-snapshot guard (VERDICT r9 #5): a loaded-host or
off-default-sf run must never clobber the round's BENCH_full_r{N}.json."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import should_snapshot_round


def test_settled_default_run_snapshots():
    assert should_snapshot_round(None, 0.08)
    assert should_snapshot_round("/root/testdata/sf0.1", 1.5)


def test_loaded_host_refuses_snapshot():
    # r9 driver run started at load 7.15: uniform ~29% inflation, 12
    # phantom outliers. Threshold is 2.0.
    assert not should_snapshot_round(None, 7.15)
    assert not should_snapshot_round("/root/testdata/sf0.1", 2.01)
    # boundary: exactly 2.0 is allowed (guard is strict >)
    assert should_snapshot_round(None, 2.0)


def test_unknown_load_is_permissive():
    # os.getloadavg unavailable (non-POSIX): don't block the artifact.
    assert should_snapshot_round(None, None)


def test_recovering_host_refuses_snapshot():
    # r10 lesson (BASELINE.md §N): load_1m near 0 but load_5 still high
    # right after a long suite — 13 phantom outliers. load_5 > 6 voids.
    assert not should_snapshot_round(None, 0.23, 8.0)
    # pair-1 conditions (kept artifact) remain allowed
    assert should_snapshot_round(None, 1.86, 4.62)


def test_long_recovering_host_refuses_snapshot():
    # r10 verdict (What's wrong #1): the committed artifact was minted at
    # load_1m 0.10 / load_5 0.93 / load_15 10.96 — the 43-min suite's
    # residual — and passed the load_1m/load_5 guard while carrying a
    # ~1.3× uniform drift tail. load_15 > 4 now voids the snapshot.
    assert not should_snapshot_round(None, 0.10, 0.93, 10.96)
    assert not should_snapshot_round("/root/testdata/sf0.1", 0.0, 0.0, 4.01)
    # boundary: exactly 4.0 allowed (strict >); settled history allowed
    assert should_snapshot_round(None, 0.1, 0.5, 4.0)
    assert should_snapshot_round(None, 1.86, 4.62, 3.2)


def test_fixture_warmup_list_matches_registry():
    # every FIXTURE_QUERIES name must exist in the registry — a renamed
    # query would silently drop out of the untimed warmup pass
    from bench import FIXTURE_QUERIES
    from chdb_spark.queries import all_queries

    missing = [n for n in FIXTURE_QUERIES if n not in all_queries()]
    assert missing == []


def test_dev_sf_dir_refuses_snapshot():
    # r8 lesson: a quick sf0.01 drive clobbered the round's sf0.1 map.
    assert not should_snapshot_round("/root/testdata/sf0.01", 0.1)


def test_prewarm_memory_is_bounded_and_nonfatal():
    """r11: prewarm_memory must touch at most the requested GiB, never
    raise, and report its own (untimed-region) duration."""
    from bench import prewarm_memory

    dt = prewarm_memory(gb=1)
    assert isinstance(dt, float) and dt >= 0.0
    # gb=0 degenerates to a no-op
    assert prewarm_memory(gb=0) >= 0.0
