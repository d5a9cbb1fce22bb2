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


def _base_file(table, partition, file_id, instant, ids, vals):
    d = os.path.join(table, partition) if partition else table
    os.makedirs(d, exist_ok=True)
    name = f"{file_id}_0-1-0_{instant}.parquet"
    cols = {
        "_hoodie_commit_time": pa.array([instant] * len(ids), pa.string()),
        "id": pa.array(ids, pa.int64()),
        "v": pa.array(vals, pa.float64()),
    }
    if partition:
        p_val = partition.split("=", 1)[1]
        cols["p"] = pa.array([p_val] * len(ids), pa.string())
    pq.write_table(pa.table(cols), os.path.join(d, name))
    return name


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


def test_hudi_mor_and_log_files_refused(spark, tmp_path):
    from chdb_spark.sources.hudi_py import read_hudi_py

    table, hoodie = _mk_table(tmp_path, name="mor", table_type="MERGE_ON_READ")
    with pytest.raises(NotImplementedError, match="COPY_ON_WRITE"):
        read_hudi_py(spark, table)

    table2, hoodie2 = _mk_table(tmp_path, name="cow_logs")
    _base_file(table2, "", FILE_ID_A, "20260101000000000", [1], [1.0])
    _commit(hoodie2, "20260101000000000")
    with open(
        os.path.join(table2, f".{FILE_ID_A}_20260101000000000.log.1_0-1-0"),
        "w",
    ):
        pass
    with pytest.raises(NotImplementedError, match="log"):
        read_hudi_py(spark, table2)


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
