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
    # a DELETE manifest (content=1) in the manifest list must refuse
    m1 = os.path.join(md, "m1.avro")
    _write_avro(spark, m1, _MANIFEST_SCHEMA, [_entry(f1)])
    ml = os.path.join(md, "ml.avro")
    _write_avro(
        spark, ml, _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1},
         {"manifest_path": m1, "manifest_length": 1,
          "partition_spec_id": 0, "content": 1, "added_snapshot_id": 1}],
    )
    _metadata(table, [{"snapshot-id": 1, "manifest-list": ml}], current=1)
    with pytest.raises(NotImplementedError, match="DELETE manifests"):
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
    # non-primitive column types → loud failure
    with pytest.raises(NotImplementedError, match="non-primitive"):
        write_iceberg_py(
            spark.range(3).selectExpr("id", "array(id) AS a"),
            str(tmp_path / "g2"),
        )
    with pytest.raises(ValueError, match="unsupported mode"):
        write_iceberg_py(spark.range(1), path, mode="merge")


def test_datastore_to_iceberg_path_routes_jar_free(spark, tmp_path):
    """DataStore.to_iceberg with a filesystem path target goes through
    the pure-Python writer (reference to_iceberg, pandas_compat.py:2177)."""
    from chdb_spark.datastore import DataStore
    from chdb_spark.sources.iceberg_py import read_iceberg_py

    path = str(tmp_path / "ds")
    DataStore(spark.range(5).selectExpr("id", "id + 1 AS v")).to_iceberg(path)
    assert {r.id for r in read_iceberg_py(spark, path).collect()} == set(range(5))
