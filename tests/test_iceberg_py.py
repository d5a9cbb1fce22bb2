"""Jar-light Iceberg snapshot reader (sources/iceberg_py.py) — fixtures
are built to the public table spec (iceberg.apache.org/spec): JSON
metadata + Avro manifest lists / manifests written through the SAME
bundled org.apache.avro classes the reader uses, with the spec's field
names. Pins the metadata walk, the status/content semantics, and the
fail-loud guards."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_MANIFEST_LIST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int", "default": 0},
            {"name": "added_snapshot_id", "type": "long"},
        ],
    }
)

_MANIFEST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file_r",
                    "fields": [
                        {"name": "content", "type": "int", "default": 0},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
)


def _write_avro(spark, path, schema_json, rows):
    """rows: list of dicts; nested dicts become sub-records."""
    jvm = spark.sparkContext._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    dfw.create(sch, jvm.java.io.File(path))

    def mk(schema, d):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        for k, v in d.items():
            if isinstance(v, dict):
                fschema = schema.getField(k).schema()
                rec.put(k, mk(fschema, v))
            else:
                rec.put(k, v)
        return rec

    for d in rows:
        dfw.append(mk(sch, d))
    dfw.close()


def _data_file(table, rel, ids):
    p = os.path.join(table, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64())}), p
    )
    return p


def _entry(path, status=1, content=0):
    return {
        "status": status,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": 1,
            "file_size_in_bytes": 1,
        },
    }


def _metadata(table, snapshots, current, version=1):
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": table,
        "current-snapshot-id": current,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"}
                ],
            }
        ],
        "current-schema-id": 0,
        "snapshots": snapshots,
    }
    with open(os.path.join(md, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write(str(version))
    return md


def test_iceberg_snapshot_read_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "t")
    f1 = _data_file(table, "data/f1.parquet", [1, 2])
    f2 = _data_file(table, "data/f2.parquet", [3])
    f3 = _data_file(table, "data/f3.parquet", [99])
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)
    # snapshot 100: f1 + f3; snapshot 200: f1 EXISTING, f2 ADDED, f3 DELETED
    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_SCHEMA, [_entry(f1), _entry(f3)])
    m2 = os.path.join(md, "m2.avro")
    _write_avro(
        spark, m2, _MANIFEST_SCHEMA,
        [_entry(f1, status=0), _entry(f2, status=1), _entry(f3, status=2)],
    )
    ml1 = os.path.join(md, "ml1.avro")
    _write_avro(
        spark, ml1, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 100}],
    )
    ml2 = os.path.join(md, "ml2.avro")
    _write_avro(
        spark, ml2, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m2, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 200}],
    )
    _metadata(
        table,
        [
            {"snapshot-id": 100, "manifest-list": ml1},
            {"snapshot-id": 200, "manifest-list": ml2},
        ],
        current=200,
    )

    from chdb_spark.sources.iceberg_py import (
        iceberg_snapshot_ids,
        read_iceberg_py,
    )

    assert iceberg_snapshot_ids(table) == [100, 200]
    cur = {r.id for r in read_iceberg_py(spark, table).collect()}
    assert cur == {1, 2, 3}  # f3's DELETED entry dropped
    old = {r.id for r in read_iceberg_py(spark, table, snapshot_id=100).collect()}
    assert old == {1, 2, 99}
    with pytest.raises(ValueError, match="snapshot-id 7 not found"):
        read_iceberg_py(spark, table, snapshot_id=7)


def test_iceberg_delete_guards(spark, tmp_path):
    from chdb_spark.sources.iceberg_py import read_iceberg_py

    table = str(tmp_path / "d")
    f1 = _data_file(table, "data/f1.parquet", [1])
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)
    # an EQUALITY delete (content=2) in a delete manifest must refuse;
    # position deletes are supported (test_iceberg_position_deletes)
    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_SCHEMA, [_entry(f1)])
    meq = os.path.join(md, "meq.avro")
    _write_avro(spark, meq, _MANIFEST_SCHEMA, [_entry(f1, content=2)])
    ml = os.path.join(md, "ml.avro")
    _write_avro(
        spark, ml, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1},
         {"manifest_path": meq, "manifest_length": 1,
          "partition_spec_id": 0, "content": 1, "added_snapshot_id": 1}],
    )
    _metadata(table, [{"snapshot-id": 1, "manifest-list": ml}], current=1)
    with pytest.raises(NotImplementedError, match="EQUALITY"):
        read_iceberg_py(spark, table)

    # an ORC data file must refuse (only parquet is wired)
    table2 = str(tmp_path / "o")
    fo = _data_file(table2, "data/f1.parquet", [1])
    md2 = os.path.join(table2, "metadata")
    os.makedirs(md2, exist_ok=True)
    m2 = os.path.join(md2, "m1.avro")
    e = _entry(fo)
    e["data_file"]["file_format"] = "ORC"
    _write_avro(spark, m2, _MANIFEST_SCHEMA, [e])
    ml2 = os.path.join(md2, "ml.avro")
    _write_avro(
        spark, ml2, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m2, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1}],
    )
    _metadata(table2, [{"snapshot-id": 1, "manifest-list": ml2}], current=1)
    with pytest.raises(NotImplementedError, match="ORC"):
        read_iceberg_py(spark, table2)


def test_iceberg_position_deletes(spark, tmp_path):
    """v2 POSITION deletes (spec §Position Delete Files): a delete
    manifest's parquet files of (file_path, pos) remove exactly those
    row indexes from the named data files; other files are untouched;
    an older snapshot without the delete manifest still sees the rows."""
    from chdb_spark.sources.iceberg_py import read_iceberg_py

    table = str(tmp_path / "pd")
    f1 = _data_file(table, "data/f1.parquet", [10, 11, 12, 13])
    f2 = _data_file(table, "data/f2.parquet", [20, 21])
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)
    # position delete file: rows 0 and 2 of f1
    pd_file = os.path.join(table, "data", "pd1.parquet")
    pq.write_table(
        pa.table({
            "file_path": pa.array([f1, f1], pa.string()),
            "pos": pa.array([0, 2], pa.int64()),
        }),
        pd_file,
    )
    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_SCHEMA, [_entry(f1), _entry(f2)])
    mdel = os.path.join(md, "mdel.avro")
    _write_avro(spark, mdel, _MANIFEST_SCHEMA, [_entry(pd_file, content=1)])
    ml1 = os.path.join(md, "ml1.avro")
    _write_avro(
        spark, ml1, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1}],
    )
    ml2 = os.path.join(md, "ml2.avro")
    _write_avro(
        spark, ml2, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 2},
         {"manifest_path": mdel, "manifest_length": 1,
          "partition_spec_id": 0, "content": 1, "added_snapshot_id": 2}],
    )
    _metadata(
        table,
        [{"snapshot-id": 1, "manifest-list": ml1},
         {"snapshot-id": 2, "manifest-list": ml2}],
        current=2,
    )
    got = sorted(r.id for r in read_iceberg_py(spark, table).collect())
    assert got == [11, 13, 20, 21]  # rows 0,2 of f1 gone; f2 intact
    old = sorted(
        r.id for r in read_iceberg_py(spark, table, snapshot_id=1).collect()
    )
    assert old == [10, 11, 12, 13, 20, 21]


_MANIFEST_LIST_SEQ_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int", "default": 0},
            {"name": "sequence_number", "type": "long"},
            {"name": "added_snapshot_id", "type": "long"},
        ],
    }
)

_MANIFEST_EQ_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {"name": "sequence_number", "type": ["null", "int"],
             "default": None},  # int, not long: py4j Integers do not
            # resolve inside ["null","long"] unions; the reader coerces
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file_req",
                    "fields": [
                        {"name": "content", "type": "int", "default": 0},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "equality_ids",
                         "type": ["null", {"type": "array", "items": "int"}],
                         "default": None},
                    ],
                },
            },
        ],
    }
)


def test_iceberg_equality_deletes_sequence_semantics(spark, tmp_path):
    """EQUALITY deletes (spec §Equality Delete Files): a delete file's
    rows remove matching rows — null-safe on the equality_ids columns —
    from data files with data sequence number STRICTLY LESS than the
    delete's. A data file written at a LATER sequence keeps its matching
    rows (re-insert after delete, the CDC upsert shape)."""
    import pyarrow as pa

    from chdb_spark.sources.iceberg_py import read_iceberg_py

    table = str(tmp_path / "eq")
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)

    def data_with_key(rel, keys, vals):
        p = os.path.join(table, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(
            pa.table({
                "k": pa.array(keys, pa.string()),
                "v": pa.array(vals, pa.int64()),
            }),
            p,
        )
        return p

    # seq 1: initial data (a,b,c); seq 3: re-insert of b after the delete
    f1 = data_with_key("data/f1.parquet", ["a", "b", None], [1, 2, 3])
    f2 = data_with_key("data/f2.parquet", ["b"], [99])
    # seq 2: equality delete of k='b' and k=NULL (null-safe match)
    eq = os.path.join(table, "data", "eq1.parquet")
    pq.write_table(
        pa.table({"k": pa.array(["b", None], pa.string())}), eq
    )

    def entry(path, content, seq, eq_ids=None):
        d = {
            "status": 1, "sequence_number": seq,
            "data_file": {
                "content": content, "file_path": path,
                "file_format": "PARQUET", "record_count": 1,
                "file_size_in_bytes": 1,
            },
        }
        if eq_ids is not None:
            d["data_file"]["equality_ids"] = eq_ids
        return d

    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_EQ_SCHEMA,
                [entry(f1, 0, 1), entry(f2, 0, 3)])
    mdel = os.path.join(md, "mdel.avro")
    _write_avro(spark, mdel, _MANIFEST_EQ_SCHEMA,
                [entry(eq, 2, 2, eq_ids=[1])])
    ml = os.path.join(md, "ml.avro")
    _write_avro(
        spark, ml, _MANIFEST_LIST_SEQ_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "sequence_number": 3,
          "added_snapshot_id": 1},
         {"manifest_path": mdel, "manifest_length": 1,
          "partition_spec_id": 0, "content": 1, "sequence_number": 2,
          "added_snapshot_id": 1}],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-0000000000eq",
        "location": table,
        "current-snapshot-id": 1,
        "schemas": [{
            "schema-id": 0, "type": "struct",
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "string"},
                {"id": 2, "name": "v", "required": False, "type": "long"},
            ],
        }],
        "current-schema-id": 0,
        "snapshots": [{"snapshot-id": 1, "manifest-list": ml}],
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("1")

    got = {(r.k, r.v) for r in read_iceberg_py(spark, table).collect()}
    # f1 (seq 1 < 2): 'b' and NULL rows deleted, 'a' survives;
    # f2 (seq 3 > 2): its 'b' re-insert survives
    assert got == {("a", 1), ("b", 99)}


def test_iceberg_append_preserves_delete_sequences(spark, tmp_path):
    """write_iceberg_py appending to a table carrying equality deletes
    must keep the carried manifests' sequence numbers (r10: the
    carry-forward schema lacked the field, degrading readable tables
    into refusals) and give the NEW data files a HIGHER sequence so the
    old deletes don't eat the appended rows."""
    import pyarrow as pa

    from chdb_spark.sources.iceberg_py import (
        read_iceberg_py,
        write_iceberg_py,
    )

    table = str(tmp_path / "eqap")
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)
    f1 = os.path.join(table, "data", "f1.parquet")
    os.makedirs(os.path.dirname(f1), exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array(["a", "b"], pa.string()),
                  "v": pa.array([1, 2], pa.int64())}), f1
    )
    eq = os.path.join(table, "data", "eq1.parquet")
    pq.write_table(pa.table({"k": pa.array(["b"], pa.string())}), eq)

    def entry(path, content, seq, eq_ids=None):
        d = {"status": 1, "sequence_number": seq,
             "data_file": {"content": content, "file_path": path,
                           "file_format": "PARQUET", "record_count": 1,
                           "file_size_in_bytes": 1}}
        if eq_ids is not None:
            d["data_file"]["equality_ids"] = eq_ids
        return d

    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_EQ_SCHEMA, [entry(f1, 0, 1)])
    mdel = os.path.join(md, "mdel.avro")
    _write_avro(spark, mdel, _MANIFEST_EQ_SCHEMA,
                [entry(eq, 2, 2, eq_ids=[1])])
    ml = os.path.join(md, "ml.avro")
    _write_avro(
        spark, ml, _MANIFEST_LIST_SEQ_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "sequence_number": 1,
          "added_snapshot_id": 1},
         {"manifest_path": mdel, "manifest_length": 1,
          "partition_spec_id": 0, "content": 1, "sequence_number": 2,
          "added_snapshot_id": 1}],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-0000000000ea",
        "location": table,
        "current-snapshot-id": 1,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "k", "required": False, "type": "string"},
            {"id": 2, "name": "v", "required": False, "type": "long"},
        ]}],
        "current-schema-id": 0,
        "snapshots": [{"snapshot-id": 1, "manifest-list": ml}],
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("1")
    assert {(r.k, r.v) for r in read_iceberg_py(spark, table).collect()} \
        == {("a", 1)}
    # append a re-insert of 'b': its data sequence (new snapshot = 2+)
    # must beat the delete's (2), and the carried delete must still
    # apply to the ORIGINAL file
    write_iceberg_py(
        spark.createDataFrame([("b", 99)], "k string, v long"),
        table, mode="append",
    )
    got = {(r.k, r.v) for r in read_iceberg_py(spark, table).collect()}
    assert got == {("a", 1), ("b", 99)}


def test_iceberg_routes_through_read_auto(spark, tmp_path):
    table = str(tmp_path / "r")
    f1 = _data_file(table, "data/f1.parquet", [5, 6])
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)
    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_SCHEMA, [_entry("file://" + f1)])
    ml = os.path.join(md, "ml.avro")
    _write_avro(
        spark, ml, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": ml_path, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1}
         for ml_path in [m1]],
    )
    _metadata(table, [{"snapshot-id": 1, "manifest-list": ml}], current=1)
    from chdb_spark.sources.files import read_auto

    got = {r.id for r in read_auto(spark, table, fmt="iceberg").collect()}
    assert got == {5, 6}


def test_dialect_iceberg_table_function_executes(spark, tmp_path):
    """CH-dialect `iceberg('<path>')` (reference table_functions.py:868)
    executes without iceberg-runtime through the jar-light reader."""
    import chdb_spark.session as chs

    table = str(tmp_path / "dialect")
    f1 = _data_file(table, "data/f1.parquet", [4, 5])
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)
    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_SCHEMA, [_entry(f1)])
    ml = os.path.join(md, "ml.avro")
    _write_avro(
        spark, ml, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1}],
    )
    _metadata(table, [{"snapshot-id": 1, "manifest-list": ml}], current=1)
    out = chs.query(spark, f"SELECT sum(id) AS s FROM iceberg('{table}')", "Pandas")
    assert out.to_dict("records") == [{"s": 9}]


# ---------------------------------------------------------------------------
# jar-free writer (write_iceberg_py)
# ---------------------------------------------------------------------------


def test_iceberg_write_read_round_trip(spark, tmp_path):
    """append → append → overwrite: every snapshot stays readable by
    snapshot-id, appends carry prior manifests forward, overwrite starts
    a fresh file set."""
    from chdb_spark.sources.iceberg_py import (
        iceberg_snapshot_ids,
        read_iceberg_py,
        write_iceberg_py,
    )

    path = str(tmp_path / "w")
    s1 = write_iceberg_py(
        spark.range(4).selectExpr("id", "id * 2 AS v"), path, mode="append"
    )
    s2 = write_iceberg_py(
        spark.range(4, 6).selectExpr("id", "id * 2 AS v"), path, mode="append"
    )
    s3 = write_iceberg_py(
        spark.range(100, 102).selectExpr("id", "id * 2 AS v"),
        path, mode="overwrite",
    )
    assert iceberg_snapshot_ids(path) == [s1, s2, s3]
    assert {r.id for r in read_iceberg_py(spark, path).collect()} == {100, 101}
    assert {r.id for r in read_iceberg_py(spark, path, snapshot_id=s1).collect()} == set(range(4))
    assert {r.id for r in read_iceberg_py(spark, path, snapshot_id=s2).collect()} == set(range(6))


def test_iceberg_write_guards(spark, tmp_path):
    from chdb_spark.sources.iceberg_py import write_iceberg_py

    path = str(tmp_path / "g")
    write_iceberg_py(spark.range(3).selectExpr("id", "id * 2 AS v"), path)
    # schema change → loud failure (mirrors write_delta_py's guard)
    with pytest.raises(ValueError, match="schema"):
        write_iceberg_py(
            spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s"),
            path, mode="append",
        )
    # nested struct/array/map write since r11; decimal still refuses loudly
    with pytest.raises(NotImplementedError, match="decimal"):
        write_iceberg_py(
            spark.range(3).selectExpr("id", "CAST(id AS DECIMAL(10,2)) AS a"),
            str(tmp_path / "g2"),
        )
    with pytest.raises(ValueError, match="unsupported mode"):
        write_iceberg_py(spark.range(1), path, mode="merge")


def test_iceberg_rename_resolved_by_field_id(spark, tmp_path):
    """Rename-after-write (spec §Column Projection): the rename is
    metadata-only, old data files keep old parquet names, and the reader
    maps them to the CURRENT name by parquet field id. Appends after the
    rename mix new-name files with old-name files in one table."""
    from chdb_spark.sources.iceberg_py import (
        read_iceberg_py,
        rename_iceberg_column,
        write_iceberg_py,
    )

    path = str(tmp_path / "rn")
    write_iceberg_py(spark.range(3).selectExpr("id", "id * 2 AS v"), path)
    rename_iceberg_column(path, "v", "doubled")
    out = read_iceberg_py(spark, path)
    assert out.columns == ["id", "doubled"]
    assert {r.doubled for r in out.collect()} == {0, 2, 4}
    # append with the new name: both generations resolve to 'doubled'
    write_iceberg_py(
        spark.range(3, 5).selectExpr("id", "id * 2 AS doubled"),
        path, mode="append",
    )
    got = {r.id: r.doubled for r in read_iceberg_py(spark, path).collect()}
    assert got == {0: 0, 1: 2, 2: 4, 3: 6, 4: 8}


def test_iceberg_added_column_null_fill(spark, tmp_path):
    """A field added to the schema AFTER a file was written reads as
    NULL for that file's rows (spec: resolve by id, missing id → null)."""
    import json as _json

    from chdb_spark.sources.iceberg_py import (
        _current_metadata_file,
        read_iceberg_py,
        write_iceberg_py,
    )

    path = str(tmp_path / "add")
    write_iceberg_py(spark.range(3).selectExpr("id", "id * 2 AS v"), path)
    md = os.path.join(path, "metadata")
    cur = _current_metadata_file(md)
    with open(cur) as f:
        meta = _json.load(f)
    fields = meta["schemas"][0]["fields"] + [
        {"id": 99, "name": "tag", "required": False, "type": "string"}
    ]
    meta["schemas"].append(
        {"schema-id": 7, "type": "struct", "fields": fields}
    )
    meta["current-schema-id"] = 7
    with open(os.path.join(md, "v9.metadata.json"), "w") as f:
        _json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("9")
    out = read_iceberg_py(spark, path)
    assert out.columns == ["id", "v", "tag"]
    rows = out.collect()
    assert all(r.tag is None for r in rows) and len(rows) == 3


def test_iceberg_type_promotion_casts_to_current_schema(spark, tmp_path):
    """int→long promotion (spec §Schema Evolution): files written before
    the promotion keep int32 physically; the resolver must CAST to the
    current type so the result schema matches the table schema even when
    only old files exist (ADVICE r10, low)."""
    import json as _json

    from chdb_spark.sources.iceberg_py import (
        _current_metadata_file,
        read_iceberg_py,
        write_iceberg_py,
    )

    path = str(tmp_path / "promo")
    write_iceberg_py(
        spark.range(3).selectExpr("id", "CAST(id AS INT) AS n"), path
    )
    md = os.path.join(path, "metadata")
    cur = _current_metadata_file(md)
    with open(cur) as f:
        meta = _json.load(f)
    fields = [dict(f) for f in meta["schemas"][0]["fields"]]
    for f in fields:
        if f["name"] == "n":
            f["type"] = "long"  # the promotion
    meta["schemas"].append(
        {"schema-id": 5, "type": "struct", "fields": fields}
    )
    meta["current-schema-id"] = 5
    with open(os.path.join(md, "v9.metadata.json"), "w") as f:
        _json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("9")
    out = read_iceberg_py(spark, path)
    assert dict(out.dtypes)["n"] == "bigint"
    assert {r.n for r in out.collect()} == {0, 1, 2}


def test_iceberg_transform_partitioned_read(spark, tmp_path):
    """A bucket[2]+day partitioned table (jar-writer layout: source
    columns IN the data files, transform values in manifest partition
    tuples) reads fully and correctly — transform tuples are pruning
    metadata a reader may ignore (spec §Partition Transforms); identity
    restore must NOT engage. Appending through the jar-free writer
    stays a loud refusal."""
    import datetime as dt
    import json as _json
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chdb_spark.sources.iceberg_py import (
        _MANIFEST_LIST_AVRO,
        _manifest_avro_schema,
        _write_avro_file,
        iceberg_bucket,
        iceberg_day,
        read_iceberg_py,
        write_iceberg_py,
    )

    path = str(tmp_path / "tp")
    md = os.path.join(path, "metadata")
    os.makedirs(md)
    rows = [(i, f"s{i}", dt.date(2026, 1, 1 + i % 2)) for i in range(8)]
    groups: dict[tuple, list] = {}
    for r in rows:
        groups.setdefault(
            (iceberg_bucket(r[0], 2), iceberg_day(r[2])), []
        ).append(r)
    entries = []
    for (b, day), grp in sorted(groups.items()):
        sub = os.path.join(path, "data", f"id_bucket={b}", f"d_day={day}")
        os.makedirs(sub)
        fp = os.path.join(sub, f"{_uuid.uuid4().hex}.parquet")
        pq.write_table(
            pa.table({
                "id": pa.array([r[0] for r in grp], pa.int64()),
                "s": pa.array([r[1] for r in grp], pa.string()),
                "d": pa.array([r[2] for r in grp], pa.date32()),
            }),
            fp,
        )
        entries.append({
            "status": 1, "snapshot_id": None,
            "data_file": {
                "content": 0,
                "partition": {"id_bucket": b, "d_day": day},
                "file_path": fp, "file_format": "PARQUET",
                "record_count": len(grp),
                "file_size_in_bytes": os.stat(fp).st_size,
            },
        })
    manifest = os.path.join(md, "m-1.avro")
    _write_avro_file(
        spark, manifest,
        _manifest_avro_schema([("id_bucket", "int"), ("d_day", "int")]),
        entries,
    )
    ml = os.path.join(md, "snap-1.avro")
    _write_avro_file(
        spark, ml, _MANIFEST_LIST_AVRO,
        [{"manifest_path": manifest,
          "manifest_length": os.stat(manifest).st_size,
          "partition_spec_id": 0, "content": 0,
          "sequence_number": 1, "added_snapshot_id": 1}],
    )
    meta = {
        "format-version": 2, "table-uuid": str(_uuid.uuid4()),
        "location": path, "last-sequence-number": 1, "last-column-id": 2,
        "current-snapshot-id": 1,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "s", "required": False, "type": "string"},
            {"id": 3, "name": "d", "required": False, "type": "date"},
        ]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "id_bucket", "transform": "bucket[2]",
             "source-id": 1, "field-id": 1000},
            {"name": "d_day", "transform": "day",
             "source-id": 3, "field-id": 1001},
        ]}],
        "default-spec-id": 0,
        "snapshots": [{"snapshot-id": 1, "sequence-number": 1,
                       "manifest-list": ml,
                       "summary": {"operation": "append"}}],
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as f:
        _json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("1")

    out = read_iceberg_py(spark, path)
    assert sorted(out.columns) == ["d", "id", "s"]
    got = {(r.id, r.s, r.d) for r in out.collect()}
    assert got == set(rows)
    # write side: loud refusal for non-identity specs
    with pytest.raises(NotImplementedError, match="non-identity"):
        write_iceberg_py(
            spark.range(1).selectExpr(
                "id", "'x' AS s", "DATE '2026-01-01' AS d"
            ),
            path, mode="append",
        )


def test_iceberg_bucket_transform_spec_vectors():
    """Pin the bucket/day transforms with the spec's PUBLISHED vectors
    (iceberg.apache.org/spec Appendix B) — never self-round-trip alone
    (SCALE.md r10 Z85 lesson): hash(long 34)=2017239379,
    hash('iceberg')=1210000089, hash(date 2017-11-16)=-653330422."""
    import datetime

    from chdb_spark.sources.iceberg_py import (
        iceberg_bucket,
        iceberg_day,
        murmur3_x86_32,
    )

    assert murmur3_x86_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert murmur3_x86_32(b"iceberg") == 1210000089
    assert (
        murmur3_x86_32((17486).to_bytes(8, "little", signed=True))
        == -653330422
    )
    # bucket[16] results from the same Appendix B rows
    assert iceberg_bucket(34, 16) == 3
    assert iceberg_bucket("iceberg", 16) == 9
    assert iceberg_bucket(datetime.date(2017, 11, 16), 16) == 10
    # int and long 34 must agree (ints hash as 8-byte longs)
    assert iceberg_bucket(34, 4) == iceberg_bucket(34, 4)
    assert iceberg_day(datetime.date(2017, 11, 16)) == 17486
    assert iceberg_day(datetime.datetime(2017, 11, 16, 22, 31)) == 17486
    # timestamp vector: 2017-11-16T22:31:08 -> hash -2047944441, bucket[16]=7
    assert iceberg_bucket(datetime.datetime(2017, 11, 16, 22, 31, 8), 16) == 7


def test_iceberg_nested_name_trees():
    """Unit: the nested-name shape comparison the resolver uses to
    detect nested renames it cannot express."""
    from chdb_spark.sources.iceberg_py import (
        _nested_name_tree,
        _spark_name_tree,
    )
    from pyspark.sql import types as T

    ice = {
        "type": "struct",
        "fields": [
            {"id": 1, "name": "a", "type": "int"},
            {"id": 2, "name": "b",
             "type": {"type": "list", "element": "string"}},
        ],
    }
    sp = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.ArrayType(T.StringType())),
        ]
    )
    assert _nested_name_tree(ice) == _spark_name_tree(sp)
    sp_renamed = T.StructType(
        [
            T.StructField("a_old", T.IntegerType()),
            T.StructField("b", T.ArrayType(T.StringType())),
        ]
    )
    assert _nested_name_tree(ice) != _spark_name_tree(sp_renamed)


def test_iceberg_rename_without_field_ids_refuses(spark, tmp_path):
    """Old data files with NO parquet field ids cannot be resolved after
    a rename — loud refusal, never a silent misread (this was the repo's
    one silent caveat before round 10)."""
    import pyarrow.parquet as pq

    from chdb_spark.sources.iceberg_py import (
        read_iceberg_py,
        rename_iceberg_column,
        write_iceberg_py,
    )

    path = str(tmp_path / "noids")
    write_iceberg_py(spark.range(3).selectExpr("id", "id * 2 AS v"), path)
    # strip the field ids (simulating a pre-spec writer's files)
    data_dir = os.path.join(path, "data")
    for name in os.listdir(data_dir):
        fp = os.path.join(data_dir, name)
        tbl = pq.read_table(fp)
        stripped = tbl.cast(
            pa.schema([pa.field(f.name, f.type) for f in tbl.schema])
        )
        pq.write_table(stripped, fp)
    rename_iceberg_column(path, "v", "doubled")
    with pytest.raises(NotImplementedError, match="field ids"):
        read_iceberg_py(spark, path).collect()


def test_rename_iceberg_column_guards(spark, tmp_path):
    from chdb_spark.sources.iceberg_py import (
        rename_iceberg_column,
        write_iceberg_py,
    )

    path = str(tmp_path / "rg")
    write_iceberg_py(spark.range(2).selectExpr("id", "id AS v"), path)
    with pytest.raises(ValueError, match="no column"):
        rename_iceberg_column(path, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_iceberg_column(path, "v", "id")


def test_iceberg_identity_partitioned_write_read(spark, tmp_path):
    """Identity partitions (spec §Partitioning): partition values live in
    manifest metadata; data files are laid out Hive-style WITHOUT the
    source columns, and the reader restores them per §Column Projection
    rule 2. Appends inherit the table's spec."""
    from chdb_spark.sources.iceberg_py import (
        read_iceberg_py,
        write_iceberg_py,
    )

    path = str(tmp_path / "part")
    df = spark.range(6).selectExpr("id", "CAST(id % 2 AS LONG) AS p")
    s1 = write_iceberg_py(df, path, partition_by=["p"])
    # layout: data/p=<val>/... and the files themselves lack column p
    assert sorted(os.listdir(os.path.join(path, "data"))) == ["p=0", "p=1"]
    f0 = next(
        os.path.join(r, n)
        for r, _d, ns in os.walk(os.path.join(path, "data", "p=0"))
        for n in ns if n.endswith(".parquet")
    )
    assert "p" not in pq.read_schema(f0).names
    out = read_iceberg_py(spark, path)
    assert sorted(out.columns) == ["id", "p"]
    assert out.schema["p"].dataType.typeName() == "long"  # restored typed
    got = {(r.id, r.p) for r in out.collect()}
    assert got == {(i, i % 2) for i in range(6)}
    # append WITHOUT partition_by: the table's spec is inherited
    s2 = write_iceberg_py(
        spark.range(6, 8).selectExpr("id", "CAST(id % 2 AS LONG) AS p"),
        path, mode="append",
    )
    got = {(r.id, r.p) for r in read_iceberg_py(spark, path).collect()}
    assert got == {(i, i % 2) for i in range(8)}
    # time travel back to the first snapshot
    got1 = {(r.id, r.p) for r in
            read_iceberg_py(spark, path, snapshot_id=s1).collect()}
    assert got1 == {(i, i % 2) for i in range(6)}
    assert s2 > s1


def test_iceberg_partitioned_mixed_writer_group(spark, tmp_path):
    """One partition tuple mixing a jar-style file (source column IN the
    parquet) with a Hive-style file (column omitted): each file resolves
    by its OWN footer (r10 review: a representative footer per group
    silently nulled the Hive-style files' partition column)."""
    from chdb_spark.sources.iceberg_py import (
        read_iceberg_py,
        write_iceberg_py,
    )

    path = str(tmp_path / "mix")
    write_iceberg_py(
        spark.createDataFrame([(1, 7), (2, 7)], "id long, p long"),
        path, partition_by=["p"],
    )
    write_iceberg_py(
        spark.createDataFrame([(3, 7)], "id long, p long"),
        path, mode="append",
    )
    # rewrite ONE of the p=7 data files jar-style: add the p column back
    data_dir = os.path.join(path, "data", "p=7")
    victim = sorted(
        n for n in os.listdir(data_dir) if n.endswith(".parquet")
    )[0]
    fp = os.path.join(data_dir, victim)
    tbl = pq.read_table(fp)
    tbl = tbl.append_column("p", pa.array([7] * len(tbl), pa.int64()))
    # drop the stale spark row.metadata the source file carried — Spark
    # trusts it over the physical schema and would hide the added column
    # (jar-written files carry accurate footers; this mimics one)
    tbl = tbl.replace_schema_metadata({})
    pq.write_table(tbl, fp)
    got = {(r.id, r.p) for r in read_iceberg_py(spark, path).collect()}
    assert got == {(1, 7), (2, 7), (3, 7)}


def test_iceberg_partitioned_string_values_and_guards(spark, tmp_path):
    """String partition values round-trip through the Hive dir encoding;
    NULL partition values and spec changes refuse loudly."""
    from chdb_spark.sources.iceberg_py import (
        read_iceberg_py,
        write_iceberg_py,
    )

    path = str(tmp_path / "ps")
    df = spark.createDataFrame(
        [(1, "us east"), (2, "eu/west"), (3, "us east")], "id long, region string"
    )
    write_iceberg_py(df, path, partition_by=["region"])
    got = {(r.id, r.region) for r in read_iceberg_py(spark, path).collect()}
    assert got == {(1, "us east"), (2, "eu/west"), (3, "us east")}

    with pytest.raises(ValueError, match="partition_by"):
        write_iceberg_py(
            spark.createDataFrame([(9, "x")], "id long, region string"),
            path, mode="append", partition_by=["id"],
        )
    with pytest.raises(ValueError, match="NULL"):
        write_iceberg_py(
            spark.createDataFrame(
                [(1, None)], "id long, region string"
            ),
            str(tmp_path / "pn"), partition_by=["region"],
        )
    with pytest.raises(ValueError, match="not in DataFrame"):
        write_iceberg_py(
            spark.range(2), str(tmp_path / "pm"), partition_by=["nope"]
        )


def test_datastore_to_iceberg_path_routes_jar_free(spark, tmp_path):
    """DataStore.to_iceberg with a filesystem path target goes through
    the pure-Python writer (reference to_iceberg, pandas_compat.py:2177)."""
    from chdb_spark.datastore import DataStore
    from chdb_spark.sources.iceberg_py import read_iceberg_py

    path = str(tmp_path / "ds")
    DataStore(spark.range(5).selectExpr("id", "id + 1 AS v")).to_iceberg(path)
    assert {r.id for r in read_iceberg_py(spark, path).collect()} == set(range(5))


def test_spark_visible_names_respects_row_metadata():
    """Spark's inference trusts its own row.metadata footer key over the
    physical schema — classification must mirror that (a file with a
    stale key reads WITHOUT its physically-present extra columns)."""
    import json as _json

    from chdb_spark.sources.iceberg_py import _spark_visible_names

    meta = _json.dumps(
        {"type": "struct", "fields": [{"name": "id"}]}
    ).encode()
    sch = pa.schema(
        [pa.field("id", pa.int64()), pa.field("p", pa.int64())],
        metadata={b"org.apache.spark.sql.parquet.row.metadata": meta},
    )
    assert _spark_visible_names(sch) == {"id"}
    assert _spark_visible_names(sch.remove_metadata()) == {"id", "p"}
    # corrupt metadata falls back to physical names
    bad = pa.schema(
        [pa.field("id", pa.int64())],
        metadata={b"org.apache.spark.sql.parquet.row.metadata": b"{"},
    )
    assert _spark_visible_names(bad) == {"id"}


def test_iceberg_deletes_cross_group_duplicate_basenames_refuse(spark, tmp_path):
    """Row-level deletes join on basenames, so duplicate basenames in
    DIFFERENT partition directories must refuse at TABLE level — the
    per-group scans each see a unique subset and would miss it (r10
    fourth-pass review: a delete could anti-join rows out of the wrong
    file)."""
    from chdb_spark.sources.iceberg_py import read_iceberg_py

    table = str(tmp_path / "dup")
    md = os.path.join(table, "metadata")
    os.makedirs(md, exist_ok=True)
    f1 = _data_file(table, "data/a=1/part-0.parquet", [1])
    f2 = _data_file(table, "data/a=2/part-0.parquet", [2])
    pd_file = os.path.join(table, "data", "pd1.parquet")
    pq.write_table(
        pa.table({"file_path": pa.array([f1], pa.string()),
                  "pos": pa.array([0], pa.int64())}),
        pd_file,
    )
    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_SCHEMA, [_entry(f1), _entry(f2)])
    mdel = os.path.join(md, "mdel.avro")
    _write_avro(spark, mdel, _MANIFEST_SCHEMA, [_entry(pd_file, content=1)])
    ml = os.path.join(md, "ml.avro")
    _write_avro(
        spark, ml, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1},
         {"manifest_path": mdel, "manifest_length": 1,
          "partition_spec_id": 0, "content": 1, "added_snapshot_id": 1}],
    )
    _metadata(table, [{"snapshot-id": 1, "manifest-list": ml}], current=1)
    with pytest.raises(NotImplementedError, match="duplicate data-file"):
        read_iceberg_py(spark, table).collect()


def test_iceberg_nested_types_roundtrip(spark, tmp_path):
    """struct/array/map columns round-trip through the jar-free
    writer+reader (r11): nested struct fields get spec field ids in the
    schema JSON AND the parquet footers; appends to the nested table
    reuse the committed ids (write-through-feature contract)."""
    import json as _json

    import pyarrow.parquet as pq

    from chdb_spark.sources.iceberg_py import (
        _current_metadata_file,
        read_iceberg_py,
        write_iceberg_py,
    )

    path = str(tmp_path / "nested")
    df = spark.range(3).selectExpr(
        "id",
        "named_struct('a', id * 2, 'b', concat('x', id)) AS s",
        "array(id, id + 10) AS arr",
        "map(concat('k', id), CAST(id AS DOUBLE)) AS m",
    )
    write_iceberg_py(df, path)
    out = read_iceberg_py(spark, path)
    assert dict(out.dtypes) == {
        "id": "bigint", "s": "struct<a:bigint,b:string>",
        "arr": "array<bigint>", "m": "map<string,double>",
    }
    got = {(r.id, r.s.a, r.s.b, tuple(r.arr), tuple(sorted(r.m.items())))
           for r in out.collect()}
    assert got == {
        (i, i * 2, f"x{i}", (i, i + 10), ((f"k{i}", float(i)),))
        for i in range(3)
    }

    # schema JSON carries UNIQUE nested ids and last-column-id tracks max
    with open(_current_metadata_file(os.path.join(path, "metadata"))) as f:
        meta = _json.load(f)
    fields = meta["schemas"][0]["fields"]
    s_field = next(f for f in fields if f["name"] == "s")
    nested_ids = [f["id"] for f in s_field["type"]["fields"]]
    arr_field = next(f for f in fields if f["name"] == "arr")
    m_field = next(f for f in fields if f["name"] == "m")
    all_ids = (
        [f["id"] for f in fields] + nested_ids
        + [arr_field["type"]["element-id"], m_field["type"]["key-id"],
           m_field["type"]["value-id"]]
    )
    assert len(all_ids) == len(set(all_ids))
    assert meta["last-column-id"] == max(all_ids)

    # parquet footers: nested struct fields stamped
    data_dir = os.path.join(path, "data")
    fp = os.path.join(data_dir, sorted(os.listdir(data_dir))[0])
    sch = pq.read_schema(fp)
    s_pq = sch.field("s")
    inner = {
        s_pq.type.field(i).name: (
            s_pq.type.field(i).metadata or {}
        ).get(b"PARQUET:field_id")
        for i in range(s_pq.type.num_fields)
    }
    assert inner == {
        "a": str(nested_ids[0]).encode(), "b": str(nested_ids[1]).encode()
    }

    # append: same Spark schema, committed ids reused, data accumulates
    write_iceberg_py(
        spark.range(3, 5).selectExpr(
            "id",
            "named_struct('a', id * 2, 'b', concat('x', id)) AS s",
            "array(id, id + 10) AS arr",
            "map(concat('k', id), CAST(id AS DOUBLE)) AS m",
        ),
        path, mode="append",
    )
    assert read_iceberg_py(spark, path).count() == 5
    # schema mismatch in a NESTED field still refuses
    with pytest.raises(ValueError, match="schema"):
        write_iceberg_py(
            spark.range(1).selectExpr(
                "id", "named_struct('a', id, 'ZZZ', 'x') AS s",
                "array(id) AS arr", "map('k', double(1.0)) AS m",
            ),
            path, mode="append",
        )


def test_iceberg_nested_rename_refuses_on_divergence(spark, tmp_path):
    """A top-level rename on a table with a nested column still resolves
    (top-level ids), but when a file's NESTED names diverge from the
    current schema the resolver refuses instead of silently keeping old
    inner names (ADVICE r10 low — now constructible via the nested
    writer)."""
    import json as _json

    from chdb_spark.sources.iceberg_py import (
        _current_metadata_file,
        read_iceberg_py,
        rename_iceberg_column,
        write_iceberg_py,
    )

    path = str(tmp_path / "nrn")
    write_iceberg_py(
        spark.range(3).selectExpr(
            "id", "named_struct('a', id * 2) AS s"
        ),
        path,
    )
    # top-level rename: metadata-only, resolved by field id on read
    rename_iceberg_column(path, "id", "ident")
    out = read_iceberg_py(spark, path)
    assert set(out.columns) == {"ident", "s"}
    assert {r.ident for r in out.collect()} == {0, 1, 2}
    assert {r.s.a for r in out.collect()} == {0, 2, 4}

    # now ALSO rename the nested field in the metadata: the files keep
    # the old inner name, which top-level-id resolution cannot express
    md = os.path.join(path, "metadata")
    with open(_current_metadata_file(md)) as f:
        meta = _json.load(f)
    fields = [dict(f) for f in meta["schemas"][-1]["fields"]]
    for f in fields:
        if f["name"] == "s":
            f["type"] = dict(f["type"])
            f["type"]["fields"] = [
                {**nf, "name": "a_renamed"} for nf in f["type"]["fields"]
            ]
    meta["schemas"].append(
        {"schema-id": 9, "type": "struct", "fields": fields}
    )
    meta["current-schema-id"] = 9
    with open(os.path.join(md, "v9.metadata.json"), "w") as f:
        _json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("9")
    with pytest.raises(NotImplementedError, match="nested"):
        read_iceberg_py(spark, path).collect()
