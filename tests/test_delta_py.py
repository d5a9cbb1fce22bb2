"""Pure-Python Delta snapshot reader (sources/delta_py.py) — tables are
built BY HAND to the public protocol spec (delta.io PROTOCOL.md):
parquet data files + ordered JSON commits + an optional classic
checkpoint. This keeps the tests jar-free AND pins the reader to the
spec rather than to any writer implementation."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta(partition_cols=()):
    schema = json.loads(SCHEMA_JSON)
    if partition_cols:
        schema["fields"].append(
            {"name": "p", "type": "string", "nullable": True, "metadata": {}}
        )
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": list(partition_cols),
            "configuration": {},
            "createdTime": 0,
        }
    }


def _protocol(reader=1, writer=2, reader_features=None):
    p = {"minReaderVersion": reader, "minWriterVersion": writer}
    if reader_features is not None:
        p["readerFeatures"] = reader_features
    return {"protocol": p}


def _add(path, pv=None):
    return {
        "add": {
            "path": path,
            "partitionValues": pv or {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def _remove(path):
    return {"remove": {"path": path, "deletionTimestamp": 0, "dataChange": True}}


def _commit(log_dir, version, actions):
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _data_file(table_dir, rel, ids, vs):
    p = os.path.join(table_dir, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "v": pa.array(vs, pa.float64())}),
        p,
    )
    return rel


def _mk_table(tmp_path, name="t"):
    table_dir = str(tmp_path / name)
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir)
    return table_dir, log_dir


def test_delta_replay_add_remove_and_time_travel(spark, tmp_path):
    table_dir, log_dir = _mk_table(tmp_path)
    f1 = _data_file(table_dir, "part-0001.parquet", [1, 2], [1.0, 2.0])
    f2 = _data_file(table_dir, "part-0002.parquet", [3], [3.0])
    f3 = _data_file(table_dir, "part-0003.parquet", [10, 20], [10.0, 20.0])
    _commit(log_dir, 0, [_protocol(), _meta(), _add(f1), _add(f2)])
    # commit 1: compaction — f1 retired, f3 added
    _commit(log_dir, 1, [_remove(f1), _add(f3)])

    from chdb_spark.sources.delta_py import delta_table_version, read_delta_py

    assert delta_table_version(table_dir) == 1
    latest = {r.id: r.v for r in read_delta_py(spark, table_dir).collect()}
    assert latest == {3: 3.0, 10: 10.0, 20: 20.0}
    v0 = {r.id: r.v for r in read_delta_py(spark, table_dir, version=0).collect()}
    assert v0 == {1: 1.0, 2: 2.0, 3: 3.0}
    with pytest.raises(ValueError, match="versionAsOf"):
        read_delta_py(spark, table_dir, version=7)


def test_delta_partition_values_from_log(spark, tmp_path):
    """Partition values come from the LOG, not directory names — a file
    deliberately placed outside its hive-style directory must still get
    its declared value; a null partitionValue maps to NULL."""
    table_dir, log_dir = _mk_table(tmp_path)
    fa = _data_file(table_dir, "p=a/part-0001.parquet", [1], [1.0])
    fb = _data_file(table_dir, "misplaced/part-0002.parquet", [2], [2.0])
    fn = _data_file(table_dir, "part-0003.parquet", [3], [3.0])
    _commit(
        log_dir,
        0,
        [
            _protocol(),
            _meta(partition_cols=("p",)),
            _add(fa, {"p": "a"}),
            _add(fb, {"p": "b"}),
            _add(fn, {"p": None}),
        ],
    )
    from chdb_spark.sources.delta_py import read_delta_py

    rows = {r.id: r.p for r in read_delta_py(spark, table_dir).collect()}
    assert rows == {1: "a", 2: "b", 3: None}


def test_delta_checkpoint_replay(spark, tmp_path):
    """Replay must start from the newest checkpoint ≤ target: commit 0 is
    deleted, so only the checkpoint carries the metaData + base adds."""
    table_dir, log_dir = _mk_table(tmp_path)
    f1 = _data_file(table_dir, "part-0001.parquet", [1], [1.0])
    f2 = _data_file(table_dir, "part-0002.parquet", [2], [2.0])
    _commit(log_dir, 0, [_protocol(), _meta(), _add(f1)])
    _commit(log_dir, 1, [_add(f2)])
    # classic single-file checkpoint at version 1
    meta = _meta()["metaData"]
    proto = _protocol()["protocol"]
    adds = [_add(f1)["add"], _add(f2)["add"]]
    # explicit Arrow types, matching real checkpoints: partitionValues is
    # a MAP column, metaData.format a nested struct
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    cp = pa.table(
        {
            "add": pa.array(adds + [None, None], type=add_t),
            "metaData": pa.array([None, None, meta, None], type=meta_t),
            "protocol": pa.array([None, None, None, proto], type=proto_t),
        }
    )
    pq.write_table(cp, os.path.join(log_dir, f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 4}, f)
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    f3 = _data_file(table_dir, "part-0003.parquet", [3], [3.0])
    _commit(log_dir, 2, [_remove(f1), _add(f3)])

    from chdb_spark.sources.delta_py import read_delta_py

    latest = {r.id for r in read_delta_py(spark, table_dir).collect()}
    assert latest == {2, 3}
    v1 = {r.id for r in read_delta_py(spark, table_dir, version=1).collect()}
    assert v1 == {1, 2}


def test_delta_protocol_guard(spark, tmp_path):
    table_dir, log_dir = _mk_table(tmp_path)
    f1 = _data_file(table_dir, "part-0001.parquet", [1], [1.0])
    _commit(
        log_dir,
        0,
        [
            _protocol(reader=3, reader_features=["typeWidening"]),
            _meta(),
            _add(f1),
        ],
    )
    from chdb_spark.sources.delta_py import read_delta_py

    # unknown reader features MUST fail the read (spec rule); the
    # deletionVectors feature itself is supported since round 10
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta_py(spark, table_dir)


def test_delta_routes_through_read_auto(spark, tmp_path):
    """fmt='delta' in read_auto: jar-free environments take the
    pure-Python replay transparently (the jar path is exercised by
    test_lakehouse_gated when a classpath provides DeltaLog)."""
    table_dir, log_dir = _mk_table(tmp_path)
    f1 = _data_file(table_dir, "part-0001.parquet", [1, 2], [1.0, 2.0])
    _commit(log_dir, 0, [_protocol(), _meta(), _add(f1)])
    from chdb_spark.sources.files import read_auto

    got = {r.id: r.v for r in read_auto(spark, table_dir, fmt="delta").collect()}
    assert got == {1: 1.0, 2: 2.0}
    got0 = read_auto(spark, table_dir, fmt="delta", versionAsOf=0).count()
    assert got0 == 2


def test_delta_write_read_round_trip(spark, tmp_path):
    """write_delta_py overwrite → append → overwrite: every snapshot stays
    time-travelable, the latest reflects the last overwrite, partitioned
    variant carries typed partition values through the log."""
    from chdb_spark.sources.delta_py import (
        delta_table_version,
        read_delta_py,
        write_delta_py,
    )

    path = str(tmp_path / "w")
    df1 = spark.range(4).selectExpr("id", "CAST(id * 1.5 AS DOUBLE) AS v")
    assert write_delta_py(df1, path, mode="overwrite") == 0
    df2 = spark.range(4, 6).selectExpr("id", "CAST(0.0 AS DOUBLE) AS v")
    assert write_delta_py(df2, path, mode="append") == 1
    got = {r.id for r in read_delta_py(spark, path).collect()}
    assert got == set(range(6))
    df3 = spark.range(100, 102).selectExpr("id", "CAST(1.0 AS DOUBLE) AS v")
    assert write_delta_py(df3, path, mode="overwrite") == 2
    assert {r.id for r in read_delta_py(spark, path).collect()} == {100, 101}
    # time travel across all three commits
    assert {r.id for r in read_delta_py(spark, path, version=0).collect()} == set(range(4))
    assert {r.id for r in read_delta_py(spark, path, version=1).collect()} == set(range(6))
    assert delta_table_version(path) == 2

    # partitioned table
    ppath = str(tmp_path / "wp")
    pdf = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, None)], "id long, v double, p string"
    )
    write_delta_py(pdf, ppath, mode="overwrite", partition_by=["p"])
    back = {r.id: r.p for r in read_delta_py(spark, ppath).collect()}
    assert back == {1: "a", 2: "b", 3: None}
    # schema mismatch guard on append with different partitioning
    import pytest as _pytest

    with _pytest.raises(ValueError, match="partition columns"):
        write_delta_py(pdf, ppath, mode="append", partition_by=[])


def test_dialect_delta_lake_table_function_executes(spark, tmp_path):
    """The CH-dialect `deltaLake('<path>')` table function (reference
    table_functions.py:915) executes jar-free end-to-end through the
    pure-Python log client."""
    from chdb_spark.sources.delta_py import write_delta_py
    import chdb_spark.session as chs

    path = str(tmp_path / "dialect_t")
    write_delta_py(spark.range(5).selectExpr("id", "id * 2 AS v"), path)
    out = chs.query(spark, f"SELECT sum(v) AS s FROM deltaLake('{path}')", "Pandas")
    assert out.to_dict("records") == [{"s": 20}]


def test_delta_writer_emits_checkpoints(spark, tmp_path):
    """write_delta_py writes a classic checkpoint every
    checkpoint_interval commits (+ _last_checkpoint): replay works from
    the checkpoint alone after pre-checkpoint commits are deleted, with
    partitioned tables incl. null partition values, and a schema-
    evolving overwrite lands its NEW metaData in the checkpoint."""
    import json as _json

    from chdb_spark.sources.delta_py import (
        _list_versions,
        _log_dir,
        read_delta_py,
        write_delta_py,
    )

    p = str(tmp_path / "t")
    kw = dict(partition_by=["p"], checkpoint_interval=2)
    write_delta_py(
        spark.range(3).selectExpr("id", "CAST(id AS STRING) AS p"),
        p, "overwrite", **kw,
    )
    write_delta_py(
        spark.range(3, 5).selectExpr("id", "CAST(NULL AS STRING) AS p"),
        p, "append", **kw,
    )
    write_delta_py(
        spark.range(10, 12).selectExpr("id", "CAST(id AS STRING) AS p"),
        p, "append", **kw,
    )
    commits, cps = _list_versions(_log_dir(p))
    assert sorted(cps) == [2]
    lc = _json.load(open(os.path.join(p, "_delta_log", "_last_checkpoint")))
    assert lc["version"] == 2
    # force checkpoint replay: drop every pre-checkpoint commit
    for v in (0, 1, 2):
        os.remove(commits[v])
    assert sorted(r.id for r in read_delta_py(spark, p).collect()) == [
        0, 1, 2, 3, 4, 10, 11,
    ]
    null_p = [r.p for r in read_delta_py(spark, p, version=2).collect()
              if r.id in (3, 4)]
    assert null_p == [None, None]

    # schema-evolving overwrite at a checkpoint version: the checkpoint
    # must carry the NEW metaData (v4 = 2nd interval)
    write_delta_py(
        spark.range(50, 52).selectExpr("id", "CAST(id AS STRING) AS p"),
        p, "overwrite", **kw,
    )
    write_delta_py(
        spark.range(60, 62).selectExpr(
            "id", "CAST(id AS STRING) AS p", "id * 2 AS extra"
        ),
        p, "overwrite", overwrite_schema=True, **kw,
    )
    commits, cps = _list_versions(_log_dir(p))
    assert sorted(cps) == [2, 4]
    os.remove(commits[3])  # v4 must be readable from its checkpoint alone
    out = read_delta_py(spark, p)
    assert out.columns == ["id", "p", "extra"]
    assert sorted((r.id, r.extra) for r in out.collect()) == [
        (60, 120), (61, 122),
    ]


def test_delta_column_mapping_name_mode(spark, tmp_path):
    """columnMapping mode='name' (PROTOCOL.md §Column Mapping): parquet
    files carry PHYSICAL column names (col-<uuid>); logical names come
    from schemaString field metadata. Covers flat columns, a nested
    struct (positional cast restores inner logical names), a mapped
    partition column (partitionValues keyed by physical name), and the
    mode='id' loud refusal."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir, log_dir = _mk_table(tmp_path, name="cm")
    # physical file: col-a (long), col-b (struct<col-c: double>)
    inner = pa.array([{"col-c": 1.5}, {"col-c": 2.5}],
                     type=pa.struct([("col-c", pa.float64())]))
    pq.write_table(
        pa.table({"col-a": pa.array([1, 2], pa.int64()), "col-b": inner}),
        os.path.join(table_dir, "f1.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-a"}},
            {"name": "s", "nullable": True,
             "type": {"type": "struct", "fields": [
                 {"name": "x", "type": "double", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "col-c"}}]},
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-b"}},
            {"name": "p", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 4,
                          "delta.columnMapping.physicalName": "col-p"}},
        ],
    }
    meta = {
        "metaData": {
            "id": "00000000-0000-0000-0000-0000000000cm",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["p"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "4"},
            "createdTime": 0,
        }
    }
    _commit(
        log_dir, 0,
        [
            _protocol(reader=2, writer=5),
            meta,
            _add("f1.parquet", pv={"col-p": "east"}),  # physical pv key
        ],
    )
    from chdb_spark.sources.delta_py import read_delta_py

    out = read_delta_py(spark, table_dir)
    assert out.columns == ["n", "s", "p"]
    rows = {r.n: (r.s.x, r.p) for r in out.collect()}
    assert rows == {1: (1.5, "east"), 2: (2.5, "east")}

    # v3 readerFeatures=[columnMapping] is accepted for name mode too
    table2, log2 = _mk_table(tmp_path, name="cm3")
    pq.write_table(
        pa.table({"col-a": pa.array([7], pa.int64())}),
        os.path.join(table2, "f1.parquet"),
    )
    schema2 = {"type": "struct", "fields": [schema["fields"][0]]}
    meta2 = {
        "metaData": {
            "id": "00000000-0000-0000-0000-0000000000c3",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema2),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 0,
        }
    }
    _commit(log2, 0, [
        _protocol(reader=3, writer=7, reader_features=["columnMapping"]),
        meta2, _add("f1.parquet"),
    ])
    assert [r.n for r in read_delta_py(spark, table2).collect()] == [7]

    # mode='id' with no parquet field ids: physicalName fallback reads
    # (footer has col-a), validated rather than refused
    table3, log3 = _mk_table(tmp_path, name="cmid")
    meta3 = json.loads(json.dumps(meta2))
    meta3["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
    pq.write_table(
        pa.table({"col-a": pa.array([7], pa.int64())}),
        os.path.join(table3, "f1.parquet"),
    )
    _commit(log3, 0, [_protocol(reader=2, writer=5), meta3, _add("f1.parquet")])
    assert [r.n for r in read_delta_py(spark, table3).collect()] == [7]


def test_dv_roaring_roundtrip():
    """Roaring serialization round-trips across container kinds: small
    array, large bitmap (>4096 per 16-bit chunk), multi-chunk, and the
    64-bit high-key split; run containers parse from a crafted buffer."""
    import struct

    import numpy as np

    from chdb_spark.sources.delta_dv import parse_dv, serialize_dv

    for idx in (
        [0, 2, 5],
        list(range(5000)),  # bitmap container
        [1, 70000, 2**33 + 7, 2**33 + 8],  # chunk + high-key splits
        [],
    ):
        got = parse_dv(serialize_dv(idx)).tolist()
        assert got == sorted(set(idx)), idx

    # run-container buffer: cookie 12347, 1 container (run), runs
    # [(3, len 2)] → {3,4,5}; n<4 so no offset section
    rb = struct.pack("<I", 12347 | (0 << 16)) + b"\x01"  # run flag set
    rb += struct.pack("<HH", 0, 3 - 1)  # key 0, cardinality 3
    rb += struct.pack("<H", 1) + struct.pack("<HH", 3, 2)
    data = struct.pack("<i", 1681511377) + struct.pack("<q", 1)
    data += struct.pack("<i", 0) + rb
    assert parse_dv(data).tolist() == [3, 4, 5]


def _meta_n():
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-00000000dddd",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": [
                    {"name": "n", "type": "long", "nullable": True,
                     "metadata": {}}]}
            ),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 0,
        }
    }


def test_delta_deletion_vector_reads(spark, tmp_path):
    """Deletion vectors (PROTOCOL.md §DV): file-stored ('u', z85 uuid
    name, offset/size/CRC framing) and inline ('i') vectors filter rows
    by parquet row index; files without a DV scan untouched; a RE-ADD
    of the same file with a larger DV supersedes (last add wins)."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chdb_spark.sources.delta_dv import (
        serialize_dv,
        write_dv_file,
        z85_encode,
    )
    from chdb_spark.sources.delta_py import read_delta_py

    table_dir, log_dir = _mk_table(tmp_path, name="dv")
    for fname, vals in (("f1.parquet", [0, 1, 2, 3]), ("f2.parquet", [10, 11])):
        pq.write_table(
            pa.table({"n": pa.array(vals, pa.int64())}),
            os.path.join(table_dir, fname),
        )
    u = _uuid.uuid4()
    offsets = write_dv_file(
        os.path.join(table_dir, f"deletion_vector_{u}.bin"),
        [serialize_dv([0, 2]), serialize_dv([0, 1, 2])],
    )
    enc = z85_encode(u.bytes)

    def dv_u(i, card):
        return {
            "storageType": "u", "pathOrInlineDv": enc,
            "offset": offsets[i],
            "sizeInBytes": None, "cardinality": card,
        }

    # sizeInBytes must be the data length — recompute
    sizes = [len(serialize_dv([0, 2])), len(serialize_dv([0, 1, 2]))]

    add1 = _add("f1.parquet")
    add1["add"]["deletionVector"] = {**dv_u(0, 2), "sizeInBytes": sizes[0]}
    _commit(
        log_dir, 0,
        [_protocol(reader=3, writer=7, reader_features=["deletionVectors"]),
         _meta_n(), add1, _add("f2.parquet")],
    )
    got = sorted(r.n for r in read_delta_py(spark, table_dir).collect())
    assert got == [1, 3, 10, 11]  # rows 0,2 of f1 deleted; f2 untouched

    # v1: re-add f1 with the larger DV (row 1 now deleted too)
    add2 = _add("f1.parquet")
    add2["add"]["deletionVector"] = {**dv_u(1, 3), "sizeInBytes": sizes[1]}
    _commit(log_dir, 1, [add2])
    got = sorted(r.n for r in read_delta_py(spark, table_dir).collect())
    assert got == [3, 10, 11]
    # time travel back to v0 sees the first DV
    got0 = sorted(
        r.n for r in read_delta_py(spark, table_dir, version=0).collect()
    )
    assert got0 == [1, 3, 10, 11]

    # v2: inline DV on f2 ('i' storage, base85 payload, no file framing)
    inline = serialize_dv([1])
    add3 = _add("f2.parquet")
    add3["add"]["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(inline),
        "offset": None, "sizeInBytes": len(inline), "cardinality": 1,
    }
    _commit(log_dir, 2, [add3])
    got = sorted(r.n for r in read_delta_py(spark, table_dir).collect())
    assert got == [3, 10]


def test_delta_dv_survives_checkpoint(spark, tmp_path):
    """Appending to a DV-carrying table until a checkpoint is emitted
    must preserve the adds' deletionVector descriptors AND the v3
    protocol's feature lists in the checkpoint — dropping either
    silently resurrects deleted rows for reads anchored at the
    checkpoint (r10)."""
    import uuid as _uuid

    from chdb_spark.sources.delta_dv import (
        serialize_dv,
        write_dv_file,
        z85_encode,
    )
    from chdb_spark.sources.delta_py import read_delta_py, write_delta_py

    table_dir, log_dir = _mk_table(tmp_path, name="dvcp")
    pq.write_table(
        pa.table({"n": pa.array([0, 1, 2], pa.int64())}),
        os.path.join(table_dir, "f1.parquet"),
    )
    u = _uuid.uuid4()
    dv = serialize_dv([1])
    offs = write_dv_file(
        os.path.join(table_dir, f"deletion_vector_{u}.bin"), [dv]
    )
    add1 = _add("f1.parquet")
    add1["add"]["deletionVector"] = {
        "storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
        "offset": offs[0], "sizeInBytes": len(dv), "cardinality": 1,
    }
    _commit(
        log_dir, 0,
        [_protocol(reader=3, writer=7, reader_features=["deletionVectors"]),
         _meta_n(), add1],
    )
    assert sorted(r.n for r in read_delta_py(spark, table_dir).collect()) \
        == [0, 2]
    # append with checkpoint_interval=1 → checkpoint at v1
    write_delta_py(
        spark.createDataFrame([(10,)], "n long"), table_dir,
        mode="append", checkpoint_interval=1,
    )
    assert any(
        name.endswith(".checkpoint.parquet") for name in os.listdir(log_dir)
    )
    # remove the pre-checkpoint commit: replay must anchor at the
    # checkpoint and STILL filter the DV'd row
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    got = sorted(r.n for r in read_delta_py(spark, table_dir).collect())
    assert got == [0, 2, 10]


def test_delta_dv_checksum_guard(spark, tmp_path):
    """A corrupted DV payload fails the CRC check loudly instead of
    silently filtering the wrong rows."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chdb_spark.sources.delta_dv import (
        serialize_dv,
        write_dv_file,
        z85_encode,
    )
    from chdb_spark.sources.delta_py import read_delta_py

    table_dir, log_dir = _mk_table(tmp_path, name="dvc")
    pq.write_table(
        pa.table({"n": pa.array([0, 1], pa.int64())}),
        os.path.join(table_dir, "f1.parquet"),
    )
    u = _uuid.uuid4()
    data = serialize_dv([0])
    dv_path = os.path.join(table_dir, f"deletion_vector_{u}.bin")
    offs = write_dv_file(dv_path, [data])
    # flip a payload byte after the size field
    with open(dv_path, "r+b") as f:
        f.seek(offs[0] + 4 + 5)
        b = f.read(1)
        f.seek(offs[0] + 4 + 5)
        f.write(bytes([b[0] ^ 0xFF]))
    add1 = _add("f1.parquet")
    add1["add"]["deletionVector"] = {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": offs[0], "sizeInBytes": len(data), "cardinality": 1,
    }
    _commit(
        log_dir, 0,
        [_protocol(reader=3, writer=7, reader_features=["deletionVectors"]),
         _meta_n(), add1],
    )
    with pytest.raises(Exception) as ei:
        read_delta_py(spark, table_dir).collect()
    assert "checksum" in str(ei.value)


def _id_field(name, pa_type, fid):
    import pyarrow as pa

    return pa.field(
        name, pa_type, metadata={b"PARQUET:field_id": str(fid).encode()}
    )


def test_delta_column_mapping_id_mode(spark, tmp_path):
    """columnMapping mode='id' (PROTOCOL.md §Column Mapping): columns
    resolve by PARQUET FIELD ID, not name. Two files whose parquet names
    for field id 1 DIFFER (physical rename an id-mode writer may do)
    both resolve to the logical name; a column added after the first
    file was written reads as NULL there; name-mode resolution would
    have misread both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir, log_dir = _mk_table(tmp_path, name="idm")
    pq.write_table(
        pa.table(
            [pa.array([1, 2], pa.int64())],
            schema=pa.schema([_id_field("zz-old", pa.int64(), 1)]),
        ),
        os.path.join(table_dir, "f1.parquet"),
    )
    pq.write_table(
        pa.table(
            [pa.array([3], pa.int64()), pa.array(["c"], pa.string())],
            schema=pa.schema(
                [
                    _id_field("zz-new", pa.int64(), 1),
                    _id_field("yy", pa.string(), 2),
                ]
            ),
        ),
        os.path.join(table_dir, "f2.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "zz-new"}},
            {"name": "tag", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "yy"}},
        ],
    }
    meta = {
        "metaData": {
            "id": "00000000-0000-0000-0000-0000000000id",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": 0,
        }
    }
    _commit(
        log_dir, 0,
        [_protocol(reader=2, writer=5), meta,
         _add("f1.parquet"), _add("f2.parquet")],
    )
    from chdb_spark.sources.delta_py import read_delta_py

    out = read_delta_py(spark, table_dir)
    assert out.columns == ["n", "tag"]
    got = {r.n: r.tag for r in out.collect()}
    assert got == {1: None, 2: None, 3: "c"}


def test_delta_column_mapping_id_mode_partitioned(spark, tmp_path):
    """id-mode + partition columns: partitionValues stay keyed by
    physical name; data columns resolve by field id per group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir, log_dir = _mk_table(tmp_path, name="idp")
    for fname, vals in (("e.parquet", [1, 2]), ("w.parquet", [3])):
        pq.write_table(
            pa.table(
                [pa.array(vals, pa.int64())],
                schema=pa.schema([_id_field("col-a", pa.int64(), 1)]),
            ),
            os.path.join(table_dir, fname),
        )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-a"}},
            {"name": "p", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-p"}},
        ],
    }
    meta = {
        "metaData": {
            "id": "00000000-0000-0000-0000-0000000000ip",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["p"],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 0,
        }
    }
    _commit(
        log_dir, 0,
        [_protocol(reader=2, writer=5), meta,
         _add("e.parquet", pv={"col-p": "east"}),
         _add("w.parquet", pv={"col-p": "west"})],
    )
    from chdb_spark.sources.delta_py import read_delta_py

    got = {(r.n, r.p) for r in read_delta_py(spark, table_dir).collect()}
    assert got == {(1, "east"), (2, "east"), (3, "west")}


def test_delta_id_mode_partial_field_ids_use_physical_names(spark, tmp_path):
    """A PARTIALLY field-id-stamped footer (one column stamped, one not)
    must not be treated as authoritative: the unstamped column's data
    exists under its physical name, and the partial-map path would
    project it as NULL (ADVICE r10, medium). The all-or-nothing rule
    falls back to the validated physicalName resolution."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir, log_dir = _mk_table(tmp_path, name="idpartial")
    pq.write_table(
        pa.table(
            [pa.array([1, 2], pa.int64()), pa.array(["a", "b"], pa.string())],
            schema=pa.schema(
                [_id_field("col-a", pa.int64(), 1),
                 pa.field("col-b", pa.string())]  # NO field id
            ),
        ),
        os.path.join(table_dir, "part.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-a"}},
            {"name": "tag", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-b"}},
        ],
    }
    meta = {
        "metaData": {
            "id": "00000000-0000-0000-0000-00000000part",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 0,
        }
    }
    _commit(
        log_dir, 0,
        [_protocol(reader=2, writer=5), meta, _add("part.parquet")],
    )
    from chdb_spark.sources.delta_py import read_delta_py

    got = {r.n: r.tag for r in read_delta_py(spark, table_dir).collect()}
    assert got == {1: "a", 2: "b"}  # tag must NOT silently read as NULL


def test_delta_id_mode_missing_physical_refuses(spark, tmp_path):
    """id-mode file with NO field ids whose footer also lacks the
    physical names: loud refusal, never a silent all-NULL read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir, log_dir = _mk_table(tmp_path, name="idx")
    pq.write_table(
        pa.table({"other": pa.array([1], pa.int64())}),
        os.path.join(table_dir, "f1.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-a"}},
        ],
    }
    meta = {
        "metaData": {
            "id": "00000000-0000-0000-0000-0000000000ix",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 0,
        }
    }
    _commit(log_dir, 0,
            [_protocol(reader=2, writer=5), meta, _add("f1.parquet")])
    from chdb_spark.sources.delta_py import read_delta_py

    with pytest.raises(NotImplementedError, match="field ids"):
        read_delta_py(spark, table_dir)


def test_delta_writer_refuses_column_mapped_tables(spark, tmp_path):
    """The jar-free writer emits logical-named parquet; appending to a
    columnMapping table would silently read back all-NULL, so it refuses."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chdb_spark.sources.delta_py import write_delta_py

    table_dir, log_dir = _mk_table(tmp_path, name="cmw")
    pq.write_table(
        pa.table({"col-a": pa.array([1], pa.int64())}),
        os.path.join(table_dir, "f1.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-a"}}
        ],
    }
    meta = {
        "metaData": {
            "id": "00000000-0000-0000-0000-0000000000cw",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 0,
        }
    }
    _commit(log_dir, 0, [_protocol(reader=2, writer=5), meta, _add("f1.parquet")])
    with pytest.raises(NotImplementedError, match="columnMapping"):
        write_delta_py(
            spark.createDataFrame([(2,)], "n long"), table_dir, mode="append"
        )


def test_delta_checkpoint_replay_preserves_configuration_maps(spark, tmp_path):
    """metaData replayed from a checkpoint parquet surfaces MAP columns
    (configuration, format.options) as (k,v) tuple lists — the replay
    must normalize them to dicts or every downstream .get() crashes
    (r9 review finding: any checkpointed table with table properties
    became unreadable)."""
    from chdb_spark.sources.delta_py import (
        _list_versions,
        _log_dir,
        read_delta_py,
        write_delta_py,
    )

    table_dir, log_dir = _mk_table(tmp_path, name="cfg")
    f1 = _data_file(table_dir, "part-0001.parquet", [1], [1.0])
    meta = _meta()
    meta["metaData"]["configuration"] = {"delta.appendOnly": "false"}
    _commit(log_dir, 0, [_protocol(), meta, _add(f1)])
    # our writer checkpoints at every commit; the checkpoint carries the
    # prior metaData with its non-empty configuration map
    write_delta_py(
        spark.createDataFrame([(2, 2.0)], "id long, v double"),
        table_dir, mode="append", checkpoint_interval=1,
    )
    commits, cps = _list_versions(_log_dir(table_dir))
    assert sorted(cps) == [1]
    os.remove(commits[0])  # force checkpoint-only replay
    assert {r.id for r in read_delta_py(spark, table_dir).collect()} == {1, 2}
    # and a further write replays that checkpointed metaData cleanly
    write_delta_py(
        spark.createDataFrame([(3, 3.0)], "id long, v double"),
        table_dir, mode="append", checkpoint_interval=0,
    )
    assert read_delta_py(spark, table_dir).count() == 3


def test_delta_multipart_checkpoint_named_in_error(spark, tmp_path):
    """Multi-part checkpoints aren't replayed; when the log chain is
    broken because delta-spark's cleanup removed pre-checkpoint commits,
    the error names the multi-part checkpoint instead of a generic
    broken-chain message."""
    from chdb_spark.sources.delta_py import read_delta_py

    table_dir, log_dir = _mk_table(tmp_path, name="mp")
    f1 = _data_file(table_dir, "part-0001.parquet", [1], [1.0])
    # commit 0 was cleaned up; only commit 1 + a 2-part checkpoint remain.
    # Replaying the suffix would silently drop pre-cleanup files — refuse.
    _commit(log_dir, 1, [_protocol(), _meta(), _add(f1)])
    for part in (1, 2):
        with open(
            os.path.join(
                log_dir,
                f"{1:020d}.checkpoint.{part:010d}.{2:010d}.parquet",
            ),
            "wb",
        ):
            pass
    with pytest.raises(ValueError, match="multi-part checkpoint"):
        read_delta_py(spark, table_dir)
    # same cleanup WITHOUT any checkpoint file: still refuses (suffix
    # replay is never safe), with the generic cleaned-up message
    table2, log2 = _mk_table(tmp_path, name="mp2")
    f2 = _data_file(table2, "part-0001.parquet", [2], [2.0])
    _commit(log2, 3, [_protocol(), _meta(), _add(f2)])
    with pytest.raises(ValueError, match="cleaned up"):
        read_delta_py(spark, table2)


def test_dv_path_resolution():
    """Descriptor → DV file path: 'u' decodes the trailing 20 Z85 chars
    to the uuid (optional random prefix becomes a subdirectory); 'p'
    takes the path as given; unknown storage types refuse."""
    import uuid as _uuid

    from chdb_spark.sources.delta_dv import dv_local_path, z85_encode

    u = _uuid.UUID("12345678-1234-5678-1234-567812345678")
    enc = z85_encode(u.bytes)
    assert dv_local_path(
        {"storageType": "u", "pathOrInlineDv": enc}, "/tbl"
    ) == f"/tbl/deletion_vector_{u}.bin"
    assert dv_local_path(
        {"storageType": "u", "pathOrInlineDv": "ab" + enc}, "/tbl"
    ) == f"/tbl/ab/deletion_vector_{u}.bin"
    assert dv_local_path(
        {"storageType": "p", "pathOrInlineDv": "/abs/x.bin"}, "/tbl"
    ) == "/abs/x.bin"
    assert dv_local_path(
        {"storageType": "p", "pathOrInlineDv": "rel/x.bin"}, "/tbl"
    ) == "/tbl/rel/x.bin"
    with pytest.raises(NotImplementedError):
        dv_local_path({"storageType": "z", "pathOrInlineDv": ""}, "/tbl")


def test_dv_parser_rejects_garbage():
    """Malformed DV buffers fail with ValueError (bad magic / truncation
    / unknown cookie), never a silent wrong answer or an index crash."""
    import struct

    from chdb_spark.sources.delta_dv import DV_MAGIC, parse_dv, serialize_dv

    with pytest.raises(ValueError, match="magic"):
        parse_dv(b"\x00" * 16)
    # valid magic, truncated bitmap section
    good = serialize_dv([1, 2, 3])
    with pytest.raises(Exception):
        parse_dv(good[: len(good) - 4])
    # unknown cookie
    bad = struct.pack("<i", DV_MAGIC) + struct.pack("<q", 1)
    bad += struct.pack("<i", 0) + struct.pack("<I", 99)
    with pytest.raises(ValueError, match="cookie"):
        parse_dv(bad)


def test_dv_roundtrip_fuzz():
    """Hypothesis-grade randomized round-trip without the dependency on
    a Spark session: random index sets across the uint32 boundary."""
    import random

    from chdb_spark.sources.delta_dv import parse_dv, serialize_dv

    rng = random.Random(20260816)
    for _ in range(25):
        n = rng.randrange(0, 2000)
        idx = {rng.randrange(0, 2**33) for _ in range(n)}
        assert parse_dv(serialize_dv(idx)).tolist() == sorted(idx)


def test_z85_rfc32_vector():
    """The official ZeroMQ RFC 32 test vector pins the ALPHABET — the
    r10 review found the first cut used Python's RFC-1924 b85 (letter/
    digit ranges swapped), which round-tripped against its own fixtures
    while misreading every real Delta DV uuid."""
    from chdb_spark.sources.delta_dv import z85_decode, z85_encode

    v = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(v) == "HelloWorld"
    assert z85_decode("HelloWorld") == v
    # non-multiple-of-4 inputs zero-pad (delta Base85Codec behavior)
    assert z85_decode(z85_encode(b"abc"))[:3] == b"abc"
    with pytest.raises(ValueError, match="invalid character"):
        z85_decode('"aaaa')


def test_delete_delta_py_deletion_vectors(spark, tmp_path):
    """delete_delta_py marks rows deleted via a real DV file (no data
    rewrite): deleted rows vanish from the snapshot read, time travel
    still sees them, the protocol upgrades to
    readerFeatures=[deletionVectors], and a SECOND delete unions with
    the existing DV (the spec's replacement rule)."""
    from chdb_spark.sources.delta_py import (
        delete_delta_py,
        read_delta_py,
        write_delta_py,
    )

    p = str(tmp_path / "dv")
    df = spark.range(20).selectExpr("id", "id * 2 AS v")
    write_delta_py(df.repartition(2), p)

    v1, n1 = delete_delta_py(spark, p, "id % 5 = 0")
    assert (v1, n1) == (1, 4)
    got = {r.id for r in read_delta_py(spark, p).collect()}
    assert got == {i for i in range(20) if i % 5 != 0}
    # data files were NOT rewritten; a DV file appeared
    assert any(
        n.startswith("deletion_vector_") for n in os.listdir(p)
    )
    # time travel to before the delete still sees every row
    v0 = {r.id for r in read_delta_py(spark, p, version=0).collect()}
    assert v0 == set(range(20))
    # protocol upgraded
    with open(os.path.join(p, "_delta_log", f"{1:020d}.json")) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]

    # second delete: union with existing DVs, prior deletes persist
    v2, n2 = delete_delta_py(spark, p, "id IN (3, 5, 10)")
    assert v2 == 2 and n2 == 1  # 5 and 10 were already deleted
    got = {r.id for r in read_delta_py(spark, p).collect()}
    assert got == {i for i in range(20) if i % 5 != 0 and i != 3}

    # no-match predicate: nothing committed
    v3, n3 = delete_delta_py(spark, p, "id = 999")
    assert (v3, n3) == (2, 0)


def test_delete_delta_py_partition_predicate(spark, tmp_path):
    """Predicates over PARTITION columns work (values restored from
    partitionValues per group) and appends through write_delta_py keep
    the DV adds alive."""
    from chdb_spark.sources.delta_py import (
        delete_delta_py,
        read_delta_py,
        write_delta_py,
    )

    p = str(tmp_path / "dvp")
    df = spark.range(12).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS part"
    )
    write_delta_py(df, p, partition_by=["part"])
    v1, n1 = delete_delta_py(spark, p, "part = '1' AND id < 8")
    assert n1 == 3  # ids 1, 4, 7
    got = {r.id for r in read_delta_py(spark, p).collect()}
    assert got == set(range(12)) - {1, 4, 7}
    # append after the delete: DV survives the carried adds
    write_delta_py(
        spark.range(12, 15).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part"
        ),
        p, mode="append", partition_by=["part"],
    )
    got = {r.id for r in read_delta_py(spark, p).collect()}
    assert got == set(range(15)) - {1, 4, 7}


def test_delete_delta_py_bound_refuses(spark, tmp_path):
    """The driver-side DV serialization bound refuses loudly instead of
    silently materializing an unbounded matched set."""
    from chdb_spark.sources.delta_py import delete_delta_py, write_delta_py

    p = str(tmp_path / "dvb")
    write_delta_py(spark.range(100).selectExpr("id"), p)
    with pytest.raises(NotImplementedError, match="max_deleted_rows"):
        delete_delta_py(spark, p, "id >= 0", max_deleted_rows=50)
