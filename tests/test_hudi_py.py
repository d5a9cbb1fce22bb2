"""Pure-Python Hudi CoW snapshot reader (sources/hudi_py.py) — tables
are built BY HAND to the public storage-layout spec (base-file naming +
timeline instants), pinning the reader to the format."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

FILE_ID_A = "5a3463cb-0000-0000-0000-000000000001-0"
FILE_ID_B = "5a3463cb-0000-0000-0000-000000000002-0"


def _record_batch(instant, ids, vals, partition=""):
    cols = {
        "_hoodie_commit_time": pa.array([instant] * len(ids), pa.string()),
        "_hoodie_record_key": pa.array([str(i) for i in ids], pa.string()),
        # spec-conforming base files always carry the partition path
        # ("" for unpartitioned tables) — the MoR merge keys on it
        "_hoodie_partition_path": pa.array(
            [partition] * len(ids), pa.string()
        ),
        "id": pa.array(ids, pa.int64()),
        "v": pa.array(vals, pa.float64()),
    }
    if partition:
        p_val = partition.split("=", 1)[1]
        cols["p"] = pa.array([p_val] * len(ids), pa.string())
    return pa.table(cols)


def _base_file(table, partition, file_id, instant, ids, vals):
    d = os.path.join(table, partition) if partition else table
    os.makedirs(d, exist_ok=True)
    name = f"{file_id}_0-1-0_{instant}.parquet"
    pq.write_table(_record_batch(instant, ids, vals, partition), os.path.join(d, name))
    return name


def _parquet_bytes(tbl) -> bytes:
    import io

    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    return buf.getvalue()


def _log_data_block(log_path, instant, ids, vals, partition=""):
    """Append one PARQUET_DATA_BLOCK carrying upserts for ``ids``."""
    from chdb_spark.sources.hudi_py import (
        _BLOCK_PARQUET_DATA,
        _HDR_INSTANT_TIME,
        append_log_block,
    )

    append_log_block(
        log_path,
        _BLOCK_PARQUET_DATA,
        {_HDR_INSTANT_TIME: instant},
        _parquet_bytes(_record_batch(instant, ids, vals, partition)),
    )


def _mk_table(tmp_path, name="h", table_type="COPY_ON_WRITE"):
    table = str(tmp_path / name)
    hoodie = os.path.join(table, ".hoodie")
    os.makedirs(hoodie)
    with open(os.path.join(hoodie, "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=t\n")
        f.write(f"hoodie.table.type={table_type}\n")
    return table, hoodie


def _commit(hoodie, instant, action="commit", meta=None):
    with open(os.path.join(hoodie, f"{instant}.{action}"), "w") as f:
        if meta is not None:
            json.dump(meta, f)


def test_hudi_file_slice_resolution_and_uncommitted(spark, tmp_path):
    """Newest COMMITTED base file wins per file group; an inflight
    (uncommitted) rewrite stays invisible; file groups merge across
    commits."""
    table, hoodie = _mk_table(tmp_path)
    _base_file(table, "", FILE_ID_A, "20260101000000000", [1, 2], [1.0, 2.0])
    _base_file(table, "", FILE_ID_A, "20260102000000000", [1, 2], [10.0, 20.0])
    _base_file(table, "", FILE_ID_B, "20260101000000000", [3], [3.0])
    # uncommitted rewrite of group A (only .inflight exists)
    _base_file(table, "", FILE_ID_A, "20260103000000000", [1, 2], [99.0, 99.0])
    _commit(hoodie, "20260101000000000")
    _commit(hoodie, "20260102000000000")
    with open(os.path.join(hoodie, "20260103000000000.inflight"), "w"):
        pass

    from chdb_spark.sources.hudi_py import read_hudi_py

    got = {r.id: r.v for r in read_hudi_py(spark, table).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 3.0}
    # drop_meta strips the _hoodie_* columns
    cols = read_hudi_py(spark, table, drop_meta=True).columns
    assert not any(c.startswith("_hoodie_") for c in cols)


def test_hudi_partitioned_and_replacecommit(spark, tmp_path):
    """Partition dirs scan through; a replacecommit retires the replaced
    file group and makes its replacement visible."""
    table, hoodie = _mk_table(tmp_path)
    _base_file(table, "p=a", FILE_ID_A, "20260101000000000", [1], [1.0])
    _base_file(table, "p=b", FILE_ID_B, "20260101000000000", [2], [2.0])
    _commit(hoodie, "20260101000000000")
    # clustering rewrites group A in partition p=a under a NEW file id
    new_id = "5a3463cb-0000-0000-0000-00000000000f-0"
    _base_file(table, "p=a", new_id, "20260104000000000", [1], [100.0])
    _commit(
        hoodie,
        "20260104000000000",
        action="replacecommit",
        meta={"partitionToReplaceFileIds": {"p=a": [FILE_ID_A]}},
    )

    from chdb_spark.sources.hudi_py import read_hudi_py

    got = {(r.p, r.id): r.v for r in read_hudi_py(spark, table).collect()}
    assert got == {("a", 1): 100.0, ("b", 2): 2.0}


def test_hudi_cow_with_log_files_is_corrupt(spark, tmp_path):
    from chdb_spark.sources.hudi_py import read_hudi_py

    table2, hoodie2 = _mk_table(tmp_path, name="cow_logs")
    _base_file(table2, "", FILE_ID_A, "20260101000000000", [1], [1.0])
    _commit(hoodie2, "20260101000000000")
    with open(
        os.path.join(table2, f".{FILE_ID_A}_20260101000000000.log.1_0-1-0"),
        "w",
    ):
        pass
    with pytest.raises(ValueError, match="COPY_ON_WRITE"):
        read_hudi_py(spark, table2)


# -- Merge-on-Read (round 10) -------------------------------------------------


def _mor_table(tmp_path, name="mor"):
    return _mk_table(tmp_path, name=name, table_type="MERGE_ON_READ")


def test_hudi_mor_snapshot_merge(spark, tmp_path):
    """Base at t1, two deltacommit log blocks (t2 updates id 2, t3
    updates ids 2 and 3): newest committed version per record key wins —
    the later BLOCK beats the earlier one, both beat the base."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2, t3 = "20260101000000000", "20260102000000000", "20260103000000000"
    table, hoodie = _mor_table(tmp_path)
    _base_file(table, "", FILE_ID_A, t1, [1, 2, 3], [1.0, 2.0, 3.0])
    _commit(hoodie, t1, action="deltacommit")
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [2], [20.0])
    _log_data_block(log, t3, [2, 3], [200.0, 30.0])
    _commit(hoodie, t2, action="deltacommit")
    _commit(hoodie, t3, action="deltacommit")
    got = {r.id: r.v for r in read_hudi_py(spark, table).collect()}
    assert got == {1: 1.0, 2: 200.0, 3: 30.0}


def test_hudi_mor_same_key_across_partitions(spark, tmp_path):
    """Record keys are only unique PER PARTITION (default non-global
    index): the same key in two partitions must yield TWO rows, and a
    log update in one partition must not clobber the other's base row
    (ADVICE r10 high — key-alone merge silently lost one of them)."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2 = "20260101000000000", "20260102000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_xpart")
    _base_file(table, "p=a", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    _base_file(table, "p=b", FILE_ID_B, t1, [1, 2], [10.0, 20.0])
    _commit(hoodie, t1, action="deltacommit")
    log = os.path.join(table, "p=a", f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [1], [100.0], partition="p=a")
    _commit(hoodie, t2, action="deltacommit")
    rows = read_hudi_py(spark, table).collect()
    assert len(rows) == 4
    got = {(r.p, r.id): r.v for r in rows}
    assert got == {
        ("a", 1): 100.0,  # updated by the p=a log block
        ("a", 2): 2.0,
        ("b", 1): 10.0,  # must NOT be clobbered or dropped
        ("b", 2): 20.0,
    }


def test_hudi_mor_missing_partition_path_refuses(spark, tmp_path):
    """A base file lacking the _hoodie_partition_path meta column (non-
    spec-conforming) refuses loudly instead of merging best-effort."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2 = "20260101000000000", "20260102000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_nopp")
    d = table
    os.makedirs(d, exist_ok=True)
    tbl = _record_batch(t1, [1, 2], [1.0, 2.0]).drop(
        ["_hoodie_partition_path"]
    )
    pq.write_table(tbl, os.path.join(d, f"{FILE_ID_A}_0-1-0_{t1}.parquet"))
    _commit(hoodie, t1, action="deltacommit")
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [1], [100.0])
    _commit(hoodie, t2, action="deltacommit")
    with pytest.raises(ValueError, match="_hoodie_partition_path"):
        read_hudi_py(spark, table).collect()


def test_hudi_mor_uncommitted_block_invisible(spark, tmp_path):
    """A log block whose instant has no completed timeline instant is
    invisible — same rule as uncommitted base files."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2 = "20260101000000000", "20260102000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_uncommitted")
    _base_file(table, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    _commit(hoodie, t1, action="deltacommit")
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [2], [-99.0])  # t2 never completes
    got = {r.id: r.v for r in read_hudi_py(spark, table).collect()}
    assert got == {1: 1.0, 2: 2.0}


def test_hudi_mor_rollback_command_block(spark, tmp_path):
    """A COMMAND_BLOCK rollback drops prior blocks of its target instant
    (HoodieLogFormat spec: TARGET_INSTANT_TIME header)."""
    from chdb_spark.sources.hudi_py import (
        _BLOCK_COMMAND,
        _HDR_COMMAND_BLOCK_TYPE,
        _HDR_INSTANT_TIME,
        _HDR_TARGET_INSTANT_TIME,
        append_log_block,
        read_hudi_py,
    )

    t1, t2, t3 = "20260101000000000", "20260102000000000", "20260103000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_rollback")
    _base_file(table, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    _commit(hoodie, t1, action="deltacommit")
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [2], [-99.0])
    # rollback of t2 appended by the writer's failure recovery; t2 ALSO
    # completes in the timeline here to prove the command block alone
    # hides the data ("0" = ROLLBACK_PREVIOUS_BLOCK)
    append_log_block(
        log,
        _BLOCK_COMMAND,
        {
            _HDR_INSTANT_TIME: t3,
            _HDR_TARGET_INSTANT_TIME: t2,
            _HDR_COMMAND_BLOCK_TYPE: "0",
        },
        b"",
    )
    _commit(hoodie, t2, action="deltacommit")
    got = {r.id: r.v for r in read_hudi_py(spark, table).collect()}
    assert got == {1: 1.0, 2: 2.0}


def test_hudi_mor_unsupported_blocks_refuse(spark, tmp_path):
    """DELETE/AVRO blocks carry Avro payloads — loud refusal, and the
    whole read fails rather than silently dropping the delta."""
    from chdb_spark.sources.hudi_py import (
        _BLOCK_DELETE,
        _HDR_INSTANT_TIME,
        append_log_block,
        read_hudi_py,
    )

    t1, t2 = "20260101000000000", "20260102000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_delete")
    _base_file(table, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    _commit(hoodie, t1, action="deltacommit")
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    append_log_block(log, _BLOCK_DELETE, {_HDR_INSTANT_TIME: t2}, b"\x00")
    _commit(hoodie, t2, action="deltacommit")
    with pytest.raises(Exception) as ei:
        read_hudi_py(spark, table).collect()
    assert "DELETE_BLOCK" in str(ei.value)


def test_hudi_mor_log_only_slice_refused(spark, tmp_path):
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1 = "20260101000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_logonly")
    _commit(hoodie, t1, action="deltacommit")
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t1, [1], [1.0])
    with pytest.raises(NotImplementedError, match="log-only"):
        read_hudi_py(spark, table)


def test_hudi_mor_compacted_and_stale_slice_logs(spark, tmp_path):
    """After compaction (new base at t3), log files keyed to the OLD
    base instant are dead — the slice is (newest base, its logs only).
    A fully-compacted table with no live logs is a plain base scan."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2, t3 = "20260101000000000", "20260102000000000", "20260103000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_compacted")
    _base_file(table, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [2], [20.0])
    # compaction at t3 folded the t2 update into a new base file
    _base_file(table, "", FILE_ID_A, t3, [1, 2], [1.0, 20.0])
    for t in (t1, t2):
        _commit(hoodie, t, action="deltacommit")
    _commit(hoodie, t3, action="commit")
    got = {r.id: r.v for r in read_hudi_py(spark, table).collect()}
    assert got == {1: 1.0, 2: 20.0}


def test_hudi_mor_replacecommit_retires_logs_too(spark, tmp_path):
    """A replacecommit retiring a file group kills its LOG files along
    with its base files (clustering semantics) — the orphaned logs must
    not trip the log-only-slice refusal nor resurrect data."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2, t3 = "20260101000000000", "20260102000000000", "20260103000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_replace")
    _base_file(table, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [2], [20.0])
    # clustering rewrote group A into group B at t3
    _base_file(table, "", FILE_ID_B, t3, [1, 2], [1.0, 20.0])
    _commit(hoodie, t1, action="deltacommit")
    _commit(hoodie, t2, action="deltacommit")
    _commit(hoodie, t3, action="replacecommit",
            meta={"partitionToReplaceFileIds": {"": [FILE_ID_A]}})
    got = {r.id: r.v for r in read_hudi_py(spark, table).collect()}
    assert got == {1: 1.0, 2: 20.0}


def test_hudi_mor_pending_compaction_logs_included(spark, tmp_path):
    """While a compaction is PENDING (instant C scheduled, no base file
    yet), writers name new log files after C — those committed deltas
    belong to the snapshot even though the newest base is still B
    (r10 review: dropping them silently lost committed updates)."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2, t3, t4 = (
        "20260101000000000", "20260102000000000",
        "20260103000000000", "20260104000000000",
    )
    table, hoodie = _mor_table(tmp_path, name="mor_pending")
    _base_file(table, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    log_b = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log_b, t2, [2], [20.0])
    # compaction scheduled at t3 (no base file written); the next
    # deltacommit's log attaches to t3
    log_c = os.path.join(table, f".{FILE_ID_A}_{t3}.log.1_0-1-0")
    _log_data_block(log_c, t4, [1], [100.0])
    for t in (t1, t2, t4):
        _commit(hoodie, t, action="deltacommit")
    got = {r.id: r.v for r in read_hudi_py(spark, table).collect()}
    assert got == {1: 100.0, 2: 20.0}


def test_hudi_as_of_time_travel(spark, tmp_path):
    """as_of reads the state at an instant (Hudi as.of.instant): later
    base rewrites, later log blocks, and later replacecommit
    retirements are all invisible; an as_of before the first commit
    refuses."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2 = "20260101000000000", "20260102000000000"
    # CoW: group rewritten at t2 — as_of=t1 sees the t1 slice
    cow, hoodie = _mk_table(tmp_path, name="cow_asof")
    _base_file(cow, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    _base_file(cow, "", FILE_ID_A, t2, [1, 2], [10.0, 20.0])
    _commit(hoodie, t1)
    _commit(hoodie, t2)
    assert {r.v for r in read_hudi_py(spark, cow, as_of=t1).collect()} == {1.0, 2.0}
    assert {r.v for r in read_hudi_py(spark, cow).collect()} == {10.0, 20.0}
    with pytest.raises(ValueError, match="no completed instant"):
        read_hudi_py(spark, cow, as_of="19990101000000000")

    # MoR: block at t2 invisible at as_of=t1
    mor, hoodie2 = _mor_table(tmp_path, name="mor_asof")
    _base_file(mor, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    _commit(hoodie2, t1, action="deltacommit")
    log = os.path.join(mor, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [2], [20.0])
    _commit(hoodie2, t2, action="deltacommit")
    got1 = {r.id: r.v for r in read_hudi_py(spark, mor, as_of=t1).collect()}
    assert got1 == {1: 1.0, 2: 2.0}
    got2 = {r.id: r.v for r in read_hudi_py(spark, mor).collect()}
    assert got2 == {1: 1.0, 2: 20.0}

    # replacecommit after as_of must not retire the group
    rep, hoodie3 = _mk_table(tmp_path, name="cow_asof_rep")
    _base_file(rep, "", FILE_ID_A, t1, [1], [1.0])
    _base_file(rep, "", FILE_ID_B, t2, [1], [99.0])
    _commit(hoodie3, t1)
    _commit(hoodie3, t2, action="replacecommit",
            meta={"partitionToReplaceFileIds": {"": [FILE_ID_A]}})
    assert {r.v for r in read_hudi_py(spark, rep).collect()} == {99.0}
    assert {r.v for r in read_hudi_py(spark, rep, as_of=t1).collect()} == {1.0}


def test_hudi_as_of_hides_later_group_with_logs(spark, tmp_path):
    """A file group CREATED after as_of (base + log file, both later)
    must be invisible — not trip the log-only-slice refusal (r10
    third-pass review). Genuinely base-less groups still refuse."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2, t3 = "20260101000000000", "20260102000000000", "20260103000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_asof_late")
    _base_file(table, "", FILE_ID_A, t1, [1], [1.0])
    _commit(hoodie, t1, action="deltacommit")
    # group B born at t2: base + a log block at t3
    _base_file(table, "", FILE_ID_B, t2, [2], [2.0])
    log_b = os.path.join(table, f".{FILE_ID_B}_{t2}.log.1_0-1-0")
    _log_data_block(log_b, t3, [2], [20.0])
    _commit(hoodie, t2, action="deltacommit")
    _commit(hoodie, t3, action="deltacommit")
    got = {r.id: r.v for r in read_hudi_py(spark, table, as_of=t1).collect()}
    assert got == {1: 1.0}  # group B invisible, no refusal
    got_now = {r.id: r.v for r in read_hudi_py(spark, table).collect()}
    assert got_now == {1: 1.0, 2: 20.0}


def test_dialect_hudi_mor_table_function(spark, tmp_path):
    """CH-dialect `hudi('<path>')` reads Merge-on-Read tables through the
    same jar-free dispatch (reference table_functions.py:956)."""
    import chdb_spark.session as chs

    t1, t2 = "20260101000000000", "20260102000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_dialect")
    _base_file(table, "", FILE_ID_A, t1, [1, 2], [1.0, 2.0])
    _commit(hoodie, t1, action="deltacommit")
    log = os.path.join(table, f".{FILE_ID_A}_{t1}.log.1_0-1-0")
    _log_data_block(log, t2, [2], [20.0])
    _commit(hoodie, t2, action="deltacommit")
    out = chs.query(spark, f"SELECT sum(v) AS s FROM hudi('{table}')", "Pandas")
    assert out.to_dict("records") == [{"s": 21.0}]


def test_parse_log_file_container_roundtrip(tmp_path):
    """The binary container round-trips: multiple blocks, headers, and
    payloads come back byte-exact in append order (no completion filter
    when completed=None)."""
    from chdb_spark.sources.hudi_py import (
        _BLOCK_PARQUET_DATA,
        _HDR_INSTANT_TIME,
        append_log_block,
        parse_log_file,
    )

    p = str(tmp_path / "x.log")
    append_log_block(p, _BLOCK_PARQUET_DATA, {_HDR_INSTANT_TIME: "t1"}, b"abc")
    append_log_block(p, _BLOCK_PARQUET_DATA, {_HDR_INSTANT_TIME: "t2"}, b"defgh")
    with open(p, "rb") as f:
        blocks = parse_log_file(f.read())
    assert [(b[0], b[3]) for b in blocks] == [("t1", b"abc"), ("t2", b"defgh")]


def test_hudi_routes_through_read_auto(spark, tmp_path):
    table, hoodie = _mk_table(tmp_path)
    _base_file(table, "", FILE_ID_A, "20260101000000000", [1, 2], [1.0, 2.0])
    _commit(hoodie, "20260101000000000")
    from chdb_spark.sources.files import read_auto

    got = {r.id: r.v for r in read_auto(spark, table, fmt="hudi").collect()}
    assert got == {1: 1.0, 2: 2.0}


def test_dialect_hudi_table_function_executes(spark, tmp_path):
    """CH-dialect `hudi('<path>')` (reference table_functions.py:956)
    executes jar-free through the CoW snapshot reader."""
    import chdb_spark.session as chs

    table, hoodie = _mk_table(tmp_path, name="dialect")
    _base_file(table, "", FILE_ID_A, "20260101000000000", [1, 2], [1.0, 2.0])
    _commit(hoodie, "20260101000000000")
    out = chs.query(spark, f"SELECT sum(v) AS s FROM hudi('{table}')", "Pandas")
    assert out.to_dict("records") == [{"s": 3.0}]


def test_hudi_mor_crashed_compaction_of_log_only_slice_refuses(spark, tmp_path):
    """A slice with COMMITTED log blocks whose only base file never
    committed (crashed compaction of a log-only slice) must refuse, not
    silently drop the committed rows (r10 fourth-pass review)."""
    from chdb_spark.sources.hudi_py import read_hudi_py

    t1, t2, t5 = "20260101000000000", "20260102000000000", "20260105000000000"
    table, hoodie = _mor_table(tmp_path, name="mor_crashed")
    _base_file(table, "", FILE_ID_A, t1, [1], [1.0])
    _commit(hoodie, t1, action="deltacommit")
    # group B: committed log blocks, base only from an UNCOMMITTED
    # compaction at t5
    log_b = os.path.join(table, f".{FILE_ID_B}_{t2}.log.1_0-1-0")
    _log_data_block(log_b, t2, [2], [2.0])
    _commit(hoodie, t2, action="deltacommit")
    _base_file(table, "", FILE_ID_B, t5, [2], [2.0])  # no t5 commit
    with pytest.raises(NotImplementedError, match="log-only|committed log"):
        read_hudi_py(spark, table)
