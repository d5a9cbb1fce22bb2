"""Pure-Python Delta Lake snapshot reader — no delta-spark jars required.

The Delta Lake transaction protocol is a public spec (delta.io
PROTOCOL.md): a table is a directory of parquet data files plus a
``_delta_log/`` directory of ordered JSON commit files
(``%020d.json``, one action per line) and optional parquet checkpoints
(``%020d.checkpoint.parquet`` + a ``_last_checkpoint`` pointer).
Reconstructing a snapshot is log replay: take the newest checkpoint at
or below the requested version, apply the JSON commits after it, and
the surviving ``add`` actions name the live data files (``remove``
retires a path; the last action for a path wins).

This reader implements exactly that replay with pyarrow + the Python
json module and hands the live file list to ``spark.read.parquet`` —
so the SCAN itself stays a fully distributed, column-pruned,
filter-pushed parquet scan; only the (tiny, metadata-sized) log replay
happens on the driver, which is also how delta-spark's own DeltaLog
client works. Partition values come from the log (``add.partitionValues``
— the authoritative source per the spec, not directory names) and are
attached as typed literal columns per partition group.

Honesty guard: tables using reader features this replay cannot honor
raise instead of silently returning wrong rows (see
_SUPPORTED_READER_FEATURES — deletion vectors and columnMapping ARE
honored jar-free since round 10). columnMapping: mode='name' reads the
physical parquet names from the schemaString field metadata and
restores logical names via positional struct casts; mode='id'
(round 10) resolves top-level columns by parquet FIELD ID per file
group — see _read_id_mapped. The pure-Python WRITER refuses mapped
tables (it emits logical-named files).

Reference surface: the chdb reference reaches Delta through its
``delta_scan`` table function (reference table_functions.py:915); this
module is the jar-free engine for that row — `read_auto(fmt="delta")`
uses the JVM DeltaLog when the classpath has it and falls back here.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: reader features this replay genuinely implements — anything else in a
#: protocol v3 readerFeatures list is a hard error, per the spec's rule
#: that unknown reader features MUST fail the read. columnMapping is
#: implemented for BOTH modes (name: physical-name scan; id: per-group
#: parquet field-id resolution in _read_id_mapped). deletionVectors are
#: honored via a distributed row-index anti-join (delta_dv + _scan_files).
_SUPPORTED_READER_FEATURES = {
    "timestampNtz", "v2Checkpoint", "columnMapping", "deletionVectors",
}


def _checkpoint_gap_hint(log_dir: str) -> str:
    """Name the real cause when replay refuses a gapped/cleaned log:
    checkpoint files exist that this client does not replay — multi-part
    classic checkpoints (N.checkpoint.<part>.<of>.parquet) or UUID-named
    v2 checkpoints (N.checkpoint.<uuid>.parquet). Both need delta-spark
    jars; classic single-file checkpoints read fine."""
    import re as _re

    names = [n for n in os.listdir(log_dir)
             if ".checkpoint." in n and not n.endswith(".checkpoint.parquet")]
    if not names:
        return ""
    multipart = any(
        _re.search(r"\.checkpoint\.\d{10}\.\d{10}\.parquet$", n)
        for n in names
    )
    kind = (
        "a multi-part checkpoint" if multipart
        else "a v2 UUID-named checkpoint"
    )
    return (
        f" — {kind} exists but is not replayed by the pure-Python "
        "client; add the delta-spark jars (classic single-file "
        "checkpoints ARE supported)"
    )


def _log_dir(path: str) -> str:
    d = os.path.join(path, "_delta_log")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"not a Delta table (no _delta_log directory): {path}"
        )
    return d


def _list_versions(log_dir: str) -> tuple[dict[int, str], dict[int, str]]:
    """version → commit-json path, version → classic-checkpoint path."""
    commits: dict[int, str] = {}
    checkpoints: dict[int, str] = {}
    for name in os.listdir(log_dir):
        stem = name.split(".")[0]
        if not (len(stem) == 20 and stem.isdigit()):
            continue
        v = int(stem)
        if name.endswith(".json"):
            commits[v] = os.path.join(log_dir, name)
        elif name.endswith(".checkpoint.parquet"):
            checkpoints[v] = os.path.join(log_dir, name)
    return commits, checkpoints


def _checkpoint_actions(path: str):
    """Yield add/remove/metaData/protocol actions from a classic
    single-file checkpoint parquet (columns are nullable structs — one
    non-null per row)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names
            if c in ("add", "remove", "metaData", "protocol")}
    n = tbl.num_rows
    for i in range(n):
        for kind, vals in cols.items():
            v = vals[i]
            if v is not None:
                yield {kind: v}


def _replay(path: str, version: int | None):
    """Log replay → (live adds by path, metaData dict, protocol dict,
    snapshot version)."""
    log_dir = _log_dir(path)
    commits, checkpoints = _list_versions(log_dir)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log in {path}")
    latest = max(list(commits) + list(checkpoints))
    v_target = latest if version is None else int(version)
    if v_target not in commits and v_target not in checkpoints:
        raise ValueError(
            f"versionAsOf={v_target} not present in _delta_log "
            f"(latest is {latest})"
        )
    cp_version = max(
        (v for v in checkpoints if v <= v_target), default=None
    )
    live: dict[str, dict] = {}
    meta: dict | None = None
    protocol: dict | None = None

    def apply(action: dict) -> None:
        nonlocal meta, protocol
        if "add" in action and action["add"] is not None:
            a = dict(action["add"])
            pv = a.get("partitionValues")
            if isinstance(pv, list):
                # checkpoint parquet stores partitionValues as a MAP type —
                # pyarrow's to_pylist yields (key, value) tuples
                a["partitionValues"] = dict(pv)
            live[a["path"]] = a
        elif "remove" in action and action["remove"] is not None:
            live.pop(action["remove"]["path"], None)
        elif "metaData" in action and action["metaData"] is not None:
            m = dict(action["metaData"])
            # checkpoint MAP columns surface as (k, v) tuple lists too —
            # normalize configuration and format.options to dicts so
            # downstream .get() reads work for checkpoint-replayed state
            if isinstance(m.get("configuration"), list):
                m["configuration"] = dict(m["configuration"])
            if isinstance(m.get("format"), dict) and isinstance(
                m["format"].get("options"), list
            ):
                m["format"] = {
                    **m["format"], "options": dict(m["format"]["options"])
                }
            meta = m
        elif "protocol" in action and action["protocol"] is not None:
            protocol = action["protocol"]

    if cp_version is not None:
        for action in _checkpoint_actions(checkpoints[cp_version]):
            apply(action)
        start = cp_version + 1
    else:
        start = min(commits)
        if start > 0:
            # log cleanup removed commits 0..start-1 and no CLASSIC
            # checkpoint covers them — replaying the surviving suffix
            # would silently return a partial file set, so refuse
            raise ValueError(
                f"_delta_log starts at commit {start} with no usable "
                f"checkpoint at or below it (earlier commits were "
                f"cleaned up); replaying the suffix would silently drop "
                f"pre-cleanup files{_checkpoint_gap_hint(log_dir)}"
            )
    for v in range(start, v_target + 1):
        if v not in commits:
            if v in checkpoints:
                continue  # checkpoint-only version
            raise ValueError(
                f"_delta_log is missing commit {v} (broken log "
                f"chain){_checkpoint_gap_hint(log_dir)}"
            )
        with open(commits[v]) as f:
            for line in f:
                line = line.strip()
                if line:
                    apply(json.loads(line))
    if meta is None:
        raise ValueError(
            "no metaData action found in the replayed log — corrupt table"
        )
    return live, meta, protocol, v_target


def _check_protocol(protocol: dict | None) -> None:
    if protocol is None:
        return
    reader_v = int(protocol.get("minReaderVersion", 1))
    features = set(protocol.get("readerFeatures") or [])
    unsupported = features - _SUPPORTED_READER_FEATURES
    if reader_v >= 3 and unsupported:
        raise NotImplementedError(
            f"Delta reader features not supported by the pure-Python "
            f"replay: {sorted(unsupported)} — this table needs the "
            f"delta-spark jars (supported jar-free: "
            f"{sorted(_SUPPORTED_READER_FEATURES)})"
        )
    # minReaderVersion=2 == column-mapping capable; both modes are
    # implemented (PROTOCOL.md §Column Mapping): 'name' via physical
    # names from schemaString field metadata, 'id' via per-group parquet
    # field-id resolution (_read_id_mapped)


def read_delta_py(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    **_: Any,
) -> DataFrame:
    """Read a local Delta table by pure-Python log replay (see module
    docstring). ``version`` = Delta's ``versionAsOf`` time travel."""
    # absolute from here on: the Spark parquet scan resolves relative
    # paths against the JVM's cwd, not Python's
    path = os.path.abspath(path)
    live, meta, protocol, _v = _replay(path, version)
    _check_protocol(protocol)
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])

    # Column mapping (PROTOCOL.md §Column Mapping): mode='name' stores
    # each column's PHYSICAL parquet name in the schemaString field
    # metadata ('delta.columnMapping.physicalName'); the scan reads the
    # physical schema and the logical names come back via a positional
    # struct cast + alias. mode='id' resolves by parquet field id —
    # jar-gated, refused loudly.
    cm_mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    # mode='id' (round 10): columns resolve by PARQUET FIELD ID
    # (PROTOCOL.md §Column Mapping: "track only the field ids").
    # Each live file's footer is read (driver-side, metadata-sized),
    # files are grouped by their id→name signature, and each group's
    # scan maps field id → that group's parquet name → logical name.
    # Top-level resolution is by id; NESTED fields still resolve by
    # physicalName (delta-spark assigns immutable physical names, so the
    # two never diverge for conforming writers). Files carrying no ids
    # fall back to physicalName when the footer has it, else refuse.
    mapped = cm_mode in ("name", "id")
    phys_of = {
        f.name: (
            (f.metadata or {}).get("delta.columnMapping.physicalName", f.name)
            if mapped
            else f.name
        )
        for f in schema.fields
    }
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    data_schema = T.StructType(
        [
            T.StructField(
                phys_of[f.name],
                _physical_type(f.dataType) if mapped else f.dataType,
                f.nullable,
                f.metadata,  # preserve column comments etc. on the scan
            )
            for f in data_fields
        ]
    )
    by_type = {f.name: f.dataType for f in schema.fields}

    def relogical(df: DataFrame) -> DataFrame:
        if not mapped:
            return df
        # positional struct cast restores LOGICAL nested field names;
        # top-level names come back via alias
        return df.select(
            *[
                F.col(phys_of[f.name]).cast(f.dataType).alias(f.name)
                for f in data_fields
            ]
        )

    if not live:
        return spark.createDataFrame([], schema)

    def abs_path(p: str) -> str:
        from urllib.parse import unquote

        p = unquote(p)
        return p if os.path.isabs(p) else os.path.join(path, p)

    # deletion vectors (PROTOCOL.md §Deletion Vectors): descriptor per
    # live add; rows filtered by a distributed row-index anti-join
    dv_descs = {
        abs_path(p): a["deletionVector"]
        for p, a in live.items()
        if a.get("deletionVector")
    }

    if cm_mode == "id":
        if dv_descs:
            raise NotImplementedError(
                "Delta deletion vectors combined with columnMapping "
                "mode='id' need the delta-spark jars"
            )
        return _read_id_mapped(
            spark, schema, data_fields, part_cols, phys_of, by_type,
            {abs_path(p): a for p, a in live.items()},
        )

    def scan_files(files: list[str]) -> DataFrame:
        return _scan_files(spark, files, data_schema, dv_descs, path)

    if not part_cols:
        files = sorted(abs_path(p) for p in live)
        return relogical(scan_files(files))

    # group live files by their log-declared partition values (the
    # authoritative source — directory names are advisory per the spec),
    # attach typed literals per group, union. Group count == live
    # partition count of the snapshot — metadata-sized by definition.
    # Under column mapping, partitionValues keys are the PHYSICAL names
    # (delta-spark writes them that way); logical keys are accepted too.
    groups: dict[tuple, list[str]] = {}
    for p, a in live.items():
        pv = a.get("partitionValues") or {}
        key = tuple(
            pv.get(phys_of[c], pv.get(c)) for c in part_cols
        )
        groups.setdefault(key, []).append(abs_path(p))
    parts: list[DataFrame] = []
    for key, files in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = relogical(scan_files(sorted(files)))
        for c, raw in zip(part_cols, key):
            lit = (
                F.lit(None).cast(by_type[c])
                if raw is None
                else F.lit(raw).cast(by_type[c])
            )
            df = df.withColumn(c, lit)
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def _scan_files(
    spark: SparkSession,
    files: list[str],
    data_schema: T.StructType,
    dv_descs: dict[str, dict],
    table_path: str,
) -> DataFrame:
    """Distributed parquet scan honoring deletion vectors. Files WITHOUT
    a DV scan plain (no join cost); files WITH one scan with Spark's
    ``_metadata.row_index`` and anti-join the deleted (file, row_index)
    pairs — the same row-index-filter plan delta-spark executes. DV
    payloads are decoded in EXECUTORS (mapInPandas over the
    metadata-sized descriptor list); small deleted sets broadcast."""
    import re as _re

    plain = [f for f in files if f not in dv_descs]
    dvd = [f for f in files if f in dv_descs]
    parts: list[DataFrame] = []
    if plain:
        parts.append(spark.read.schema(data_schema).parquet(*sorted(plain)))
    if dvd:
        # join key is the file BASENAME (_metadata.file_name): the full
        # _metadata.file_path is percent-ENCODED by Spark while log
        # paths are decoded, so path-based keys silently miss on tables
        # under directories with URL-encodable characters (r10 review —
        # deleted rows would resurrect). Basenames are URI-safe uuid
        # names for every real writer; anything else refuses loudly.
        names = [os.path.basename(f) for f in dvd]
        if len(set(names)) != len(names):
            raise NotImplementedError(
                "Delta deletion vectors: duplicate data-file basenames "
                "across directories — needs the delta-spark jars"
            )
        bad = [n for n in names if not _re.fullmatch(r"[A-Za-z0-9._~=-]+", n)]
        if bad:
            raise NotImplementedError(
                f"Delta deletion vectors: data-file names {bad[:3]} "
                "contain URL-encodable characters — needs the "
                "delta-spark jars"
            )
        descs = [
            (
                os.path.basename(f),
                dv_descs[f].get("storageType"),
                dv_descs[f].get("pathOrInlineDv"),
                int(dv_descs[f].get("offset") or 0),
                int(dv_descs[f].get("sizeInBytes") or 0),
            )
            for f in sorted(dvd)
        ]
        desc_df = spark.createDataFrame(
            descs,
            "file string, storage_type string, path_or_inline string, "
            "dv_offset long, size_in_bytes long",
        ).repartition(min(len(descs), 32))

        def _expand(iterator):
            import pandas as pd

            from chdb_spark.sources import delta_dv

            for pdf in iterator:
                for _i, r in pdf.iterrows():
                    desc = {
                        "storageType": r["storage_type"],
                        "pathOrInlineDv": r["path_or_inline"],
                        "offset": int(r["dv_offset"]),
                        "sizeInBytes": int(r["size_in_bytes"]),
                    }
                    idx = delta_dv.parse_dv(
                        delta_dv.dv_data(desc, table_path)
                    )
                    yield pd.DataFrame(
                        {"file": r["file"], "row_index": idx.astype("int64")}
                    )

        deleted = desc_df.mapInPandas(_expand, "file string, row_index long")
        total_card = sum(
            int(dv_descs[f].get("cardinality") or 0) for f in dvd
        )
        if total_card and total_card < 5_000_000:
            deleted = F.broadcast(deleted)
        scan = spark.read.schema(data_schema).parquet(*sorted(dvd)).select(
            "*",
            F.col("_metadata.file_name").alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_ri"),
        )
        filtered = scan.join(
            deleted,
            on=[
                scan["__dv_file"] == deleted["file"],
                scan["__dv_ri"] == deleted["row_index"],
            ],
            how="left_anti",
        ).drop("__dv_file", "__dv_ri")
        parts.append(filtered)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_id_mapped(
    spark: SparkSession,
    schema: T.StructType,
    data_fields: list[T.StructField],
    part_cols: list[str],
    phys_of: dict[str, str],
    by_type: dict[str, T.DataType],
    live_abs: dict[str, dict],
) -> DataFrame:
    """columnMapping mode='id': per-file footer field-id resolution (see
    the mode comment in read_delta_py). Groups stay distributed parquet
    scans; only footers are read driver-side — the same per-file
    resolution work the delta kernel does in its planning phase."""
    import pyarrow.parquet as pq

    id_of: dict[str, int] = {}
    for f in data_fields:
        fid = (f.metadata or {}).get("delta.columnMapping.id")
        if fid is None:
            raise ValueError(
                f"Delta columnMapping.mode='id' but field {f.name!r} "
                "carries no delta.columnMapping.id metadata — corrupt "
                "schemaString"
            )
        id_of[f.name] = int(fid)

    def footer_sig(fp: str) -> tuple:
        # one footer read per file (same extraction as
        # iceberg_py._parquet_field_ids — the id lives in the same
        # parquet metadata key for both formats)
        sch = pq.read_schema(fp)
        out = {}
        for pf in sch:
            fid = (pf.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                out[int(fid)] = pf.name
        if out and len(out) < len(sch.names):
            # PARTIALLY stamped footer: a column with data but no id
            # would be projected as NULL if we trusted the partial map
            # (ADVICE r10, medium — silent-NULL misread). Mirror
            # iceberg_py._parquet_field_ids' all-or-nothing rule and
            # fall through to the validated physicalName path.
            out = {}
        if not out:
            # pre-id-stamping writer: physicalName fallback, validated
            names = set(sch.names)
            missing = [
                f.name for f in data_fields if phys_of[f.name] not in names
            ]
            if missing:
                raise NotImplementedError(
                    f"Delta id-mapped file {fp} has no (or only partial) "
                    f"parquet field ids and physical names {missing} are "
                    "absent — needs the delta-spark jars"
                )
            return tuple(
                sorted((id_of[f.name], phys_of[f.name]) for f in data_fields)
            )
        return tuple(sorted(out.items()))

    groups: dict[tuple, list[str]] = {}
    for fp, a in live_abs.items():
        pv = a.get("partitionValues") or {}
        pv_key = tuple(pv.get(phys_of[c], pv.get(c)) for c in part_cols)
        groups.setdefault((pv_key, footer_sig(fp)), []).append(fp)

    parts: list[DataFrame] = []
    for (pv_key, sig), files in sorted(
        groups.items(), key=lambda kv: str(kv[0])
    ):
        name_of_id = dict(sig)
        scan_fields = []
        sel = []
        for f in data_fields:
            pname = name_of_id.get(id_of[f.name])
            if pname is None:
                # column ADDED after these files were written: reads as
                # NULL, per the protocol's missing-column rule
                sel.append(F.lit(None).cast(f.dataType).alias(f.name))
                continue
            scan_fields.append(
                T.StructField(
                    pname, _physical_type(f.dataType), f.nullable, f.metadata
                )
            )
            sel.append(F.col(pname).cast(f.dataType).alias(f.name))
        df = (
            spark.read.schema(T.StructType(scan_fields))
            .parquet(*sorted(files))
            .select(*sel)
        )
        for c, raw in zip(part_cols, pv_key):
            lit = (
                F.lit(None).cast(by_type[c])
                if raw is None
                else F.lit(raw).cast(by_type[c])
            )
            df = df.withColumn(c, lit)
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def _physical_type(dt: T.DataType) -> T.DataType:
    """Rename nested struct fields to their columnMapping physicalName
    (recursively) so the parquet scan schema matches the files."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    (f.metadata or {}).get(
                        "delta.columnMapping.physicalName", f.name
                    ),
                    _physical_type(f.dataType),
                    f.nullable,
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_physical_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _physical_type(dt.keyType),
            _physical_type(dt.valueType),
            dt.valueContainsNull,
        )
    return dt


def delta_table_version(path: str) -> int:
    """Latest snapshot version of a local Delta table (log listing only)."""
    commits, checkpoints = _list_versions(_log_dir(path))
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log in {path}")
    return max(list(commits) + list(checkpoints))


def _write_checkpoint(
    log_dir: str, version: int, live: dict[str, dict],
    meta: dict | None, protocol: dict,
) -> None:
    """Classic single-file checkpoint parquet + ``_last_checkpoint``
    pointer (PROTOCOL.md §Checkpoints): one row per live ``add`` plus one
    ``metaData`` and one ``protocol`` row, nullable-struct columns.
    Tombstones are omitted — every JSON commit is retained, so pre-
    checkpoint time travel replays from the commits (this writer never
    VACUUMs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if meta is None:
        raise ValueError("checkpoint without metaData — corrupt state")
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            # deletionVector MUST survive checkpointing — dropping it
            # (pyarrow silently ignores dict keys absent from the
            # struct) would resurrect deleted rows for every read
            # anchored at the checkpoint (r10)
            ("deletionVector", pa.struct(
                [
                    ("storageType", pa.string()),
                    ("pathOrInlineDv", pa.string()),
                    ("offset", pa.int64()),
                    ("sizeInBytes", pa.int64()),
                    ("cardinality", pa.int64()),
                ]
            )),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct(
                [("provider", pa.string()),
                 ("options", pa.map_(pa.string(), pa.string()))]
            )),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            # feature lists survive checkpointing too — a v3 protocol
            # replayed without them would skip the unknown-feature
            # refusal AND the supported-feature handling (r10)
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    adds = [live[p] for p in sorted(live)]
    n = len(adds) + 2
    meta_row = {
        "id": meta.get("id"),
        "format": {
            "provider": (meta.get("format") or {}).get("provider", "parquet"),
            "options": (meta.get("format") or {}).get("options") or {},
        },
        "schemaString": meta["schemaString"],
        "partitionColumns": list(meta.get("partitionColumns") or []),
        "configuration": meta.get("configuration") or {},
        "createdTime": meta.get("createdTime") or 0,
    }
    proto_row = {
        "minReaderVersion": int(protocol.get("minReaderVersion", 1)),
        "minWriterVersion": int(protocol.get("minWriterVersion", 2)),
        "readerFeatures": protocol.get("readerFeatures"),
        "writerFeatures": protocol.get("writerFeatures"),
    }
    tbl = pa.table(
        {
            "add": pa.array(adds + [None, None], type=add_t),
            "metaData": pa.array(
                [None] * len(adds) + [meta_row, None], type=meta_t
            ),
            "protocol": pa.array(
                [None] * (len(adds) + 1) + [proto_row], type=proto_t
            ),
        }
    )
    cp_path = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    tmp = cp_path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, cp_path)
    lc_tmp = os.path.join(log_dir, "._last_checkpoint.tmp")
    with open(lc_tmp, "w") as f:
        json.dump({"version": version, "size": n}, f)
    os.replace(lc_tmp, os.path.join(log_dir, "_last_checkpoint"))


def _normalize_schema(dt: T.DataType) -> T.DataType:
    """Recursively force nullable=True and drop field metadata so schema
    comparison is purely names + types."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _normalize_schema(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_normalize_schema(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _normalize_schema(dt.keyType), _normalize_schema(dt.valueType), True
        )
    return dt


def write_delta_py(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    overwrite_schema: bool = False,
    checkpoint_interval: int = 10,
) -> int:
    """Minimal pure-Python Delta writer: Spark writes the parquet data
    files (fully distributed — the driver only stages/renames and writes
    the commit JSON), then one atomic log commit records them.

    - ``overwrite``: one commit with ``remove`` for every previously-live
      file + ``add`` for the new ones (the spec's REPLACE-style commit —
      old snapshots stay time-travelable).
    - ``append``: one commit with ``add`` actions only.

    Every ``checkpoint_interval`` commits (default 10, 0 disables) a
    classic single-file checkpoint parquet + ``_last_checkpoint`` pointer
    is written after the commit publishes, so replay cost on a
    long-lived table stays bounded instead of growing with commit count.

    Partitioned writes go through Spark's ``partitionBy`` (data files do
    NOT contain the partition columns, per the spec); partitionValues
    are parsed from the staged hive-style paths Spark produced.

    Single-writer contract: the commit is an atomic rename on a local
    filesystem; concurrent writers need a real LogStore (delta-spark
    jars) — documented, not silently unsafe (the rename fails if the
    version file already exists… os.rename overwrites on POSIX, so a
    link+unlink pair is used to get EEXIST semantics).

    Schema guard (fail-loud contract): when the table already exists,
    ``df``'s schema must structurally equal the replayed
    ``metaData.schemaString`` — otherwise the stale schemaString would
    be applied to the new files on read and added columns silently
    vanish (dropped columns read as NULL). Appends always raise on
    mismatch; overwrites raise unless ``overwrite_schema=True``, which
    commits an updated metaData action in the same commit
    (delta-spark's ``overwriteSchema`` semantics — the table id is
    preserved, only the schemaString changes).

    Returns the committed version.
    """
    import shutil
    import tempfile
    import uuid

    if mode not in ("overwrite", "append"):
        raise ValueError(f"write_delta_py: unsupported mode {mode!r}")
    partition_by = list(partition_by or [])
    path = os.path.abspath(path)  # Spark writes resolve against JVM cwd
    os.makedirs(path, exist_ok=True)
    log_dir = os.path.join(path, "_delta_log")
    exists = os.path.isdir(log_dir) and any(
        n.endswith(".json") or n.endswith(".checkpoint.parquet")
        for n in os.listdir(log_dir)
    )
    prior_live: dict[str, dict] = {}
    version = 0
    prior_meta: dict | None = None
    prior_proto: dict | None = None
    schema_changed = False
    if exists:
        prior_live, prior_meta, prior_proto, v_latest = _replay(path, None)
        version = v_latest + 1
        prior_parts = list(prior_meta.get("partitionColumns") or [])
        if prior_parts != partition_by:
            raise ValueError(
                f"partition columns {partition_by} != existing table's "
                f"{prior_parts}"
            )
        if (prior_meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        ) != "none":
            # this writer emits LOGICAL-named parquet files; a mapped
            # table's reader resolves PHYSICAL names, so the new files
            # would silently read as all-NULL — refuse instead
            raise NotImplementedError(
                "write_delta_py: table uses columnMapping — writing needs "
                "the delta-spark jars (the pure-Python reader still reads "
                "mode='name' tables)"
            )
        # structural comparison on names + types (nullability and field
        # metadata normalized away — writing non-nullable data into a
        # nullable column is legal and cannot misread; the silent-misread
        # hazard is added/dropped/retyped columns)
        prior_schema = T.StructType.fromJson(
            json.loads(prior_meta["schemaString"])
        )
        schema_changed = _normalize_schema(df.schema) != _normalize_schema(
            prior_schema
        )
        if schema_changed and not (mode == "overwrite" and overwrite_schema):
            raise ValueError(
                f"write_delta_py: DataFrame schema differs from the "
                f"table's committed schema at {path} — a stale "
                f"schemaString would silently drop/null the changed "
                f"columns on read. Pass overwrite_schema=True with "
                f"mode='overwrite' to commit the new schema "
                f"(delta-spark overwriteSchema semantics).\n"
                f"  table: {prior_schema.simpleString()}\n"
                f"  frame: {df.schema.simpleString()}"
            )
    os.makedirs(log_dir, exist_ok=True)

    # stage the data files next to the table (same filesystem → rename
    # is a move, never a copy), then move them in under unique names
    stage = tempfile.mkdtemp(prefix="_delta_stage_", dir=path)
    try:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(stage)
        adds = []
        for root, _dirs, files in os.walk(stage):
            for name in files:
                if not name.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(root, stage)
                pv: dict[str, str | None] = {}
                if rel_dir != ".":
                    for seg in rel_dir.split(os.sep):
                        k, _, raw = seg.partition("=")
                        from urllib.parse import unquote

                        pv[k] = (
                            None
                            if raw == "__HIVE_DEFAULT_PARTITION__"
                            else unquote(raw)
                        )
                new_rel = (
                    (rel_dir + "/" if rel_dir != "." else "")
                    + f"part-{uuid.uuid4().hex}.parquet"
                )
                dest = os.path.join(path, new_rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                st = os.stat(os.path.join(root, name))
                os.rename(os.path.join(root, name), dest)
                adds.append(
                    {
                        "add": {
                            "path": new_rel.replace(os.sep, "/"),
                            "partitionValues": pv,
                            "size": st.st_size,
                            "modificationTime": int(st.st_mtime * 1000),
                            "dataChange": True,
                        }
                    }
                )
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    actions: list[dict] = []
    if not exists:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": partition_by,
                    "configuration": {},
                    "createdTime": 0,
                }
            }
        )
    elif schema_changed:
        # overwriteSchema commit: same table id, new schemaString — a
        # metaData action in the commit makes readers of this and later
        # versions use the NEW schema while time travel keeps the old one
        new_meta = dict(prior_meta or {})
        new_meta["schemaString"] = df.schema.json()
        new_meta["partitionColumns"] = partition_by
        actions.append({"metaData": new_meta})
    if mode == "overwrite":
        actions += [
            {
                "remove": {
                    "path": p,
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            }
            for p in sorted(prior_live)
        ]
    actions += adds

    commit_tmp = os.path.join(log_dir, f".{uuid.uuid4().hex}.json.tmp")
    with open(commit_tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    commit_path = os.path.join(log_dir, f"{version:020d}.json")
    try:
        # EEXIST-atomic publish: link refuses to clobber a concurrent
        # commit where rename would silently overwrite it
        os.link(commit_tmp, commit_path)
    except FileExistsError:
        raise RuntimeError(
            f"concurrent Delta commit detected at version {version}; "
            "this pure-Python writer is single-writer"
        ) from None
    finally:
        os.unlink(commit_tmp)

    # classic checkpoint every `checkpoint_interval` commits, so replay
    # cost on a long-lived table stays bounded (the reader starts from
    # the newest checkpoint ≤ target). The checkpoint is metadata-sized
    # (live add list) and written AFTER the commit publishes — a crash
    # between the two leaves a valid table, just without the checkpoint.
    if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
        live_after: dict[str, dict] = (
            {} if mode == "overwrite" else dict(prior_live)
        )
        for a in adds:
            live_after[a["add"]["path"]] = a["add"]
        meta_after = next(
            (a["metaData"] for a in actions if "metaData" in a), prior_meta
        )
        proto_after = (
            next((a["protocol"] for a in actions if "protocol" in a), None)
            or prior_proto
            or {"minReaderVersion": 1, "minWriterVersion": 2}
        )
        _write_checkpoint(log_dir, version, live_after, meta_after, proto_after)
    return version


def delete_delta_py(
    spark: SparkSession,
    path: str,
    predicate: str,
    max_deleted_rows: int = 10_000_000,
    checkpoint_interval: int = 10,
) -> tuple[int, int]:
    """``DELETE FROM <table> WHERE predicate`` realized with DELETION
    VECTORS (PROTOCOL.md §Deletion Vectors) — matching rows are marked
    deleted via per-file roaring bitmaps, no data file is rewritten
    (delta-spark's DV-enabled DELETE; reference mutation surface
    core.py ALTER ... DELETE). Returns ``(committed version, newly
    deleted row count)``; a predicate matching nothing commits nothing.

    Mechanics: a distributed scan with ``_metadata.row_index`` evaluates
    the predicate (partition columns restored from partitionValues per
    group, so predicates over them work), the matched (file, row index)
    pairs union with each file's EXISTING DV (the spec requires the new
    DV to contain all previously deleted rows), one spec-shaped DV file
    holds every bitmap, and the commit removes+re-adds each touched file
    with the new descriptor, upgrading the protocol to
    readerFeatures=[deletionVectors] when needed.

    Scale contract: bitmap serialization is driver-side, bounded by
    ``max_deleted_rows`` (default 10M) — beyond it, refuse loudly and
    point at the jar path (matching this writer's single-node metadata
    contract; the scan itself is fully distributed)."""
    import uuid

    from chdb_spark.sources import delta_dv

    path = os.path.abspath(path)
    live, meta, protocol, v_latest = _replay(path, None)
    _check_protocol(protocol)
    version = v_latest + 1
    if meta is None:
        raise ValueError(f"no Delta metaData action found under {path}")
    if (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    ) != "none":
        raise NotImplementedError(
            "delete_delta_py: table uses columnMapping — DELETE needs "
            "the delta-spark jars"
        )
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    by_type = {f.name: f.dataType for f in schema.fields}

    def abs_path(p: str) -> str:
        from urllib.parse import unquote, urlparse

        if "://" in p:
            parsed = urlparse(p)
            p = parsed.path
        p = unquote(p)
        return p if os.path.isabs(p) else os.path.join(path, p)

    rel_of_base: dict[str, str] = {}
    for rel in live:
        base = os.path.basename(abs_path(rel))
        if base in rel_of_base:
            raise NotImplementedError(
                "delete_delta_py: duplicate data-file basenames across "
                "directories — needs the delta-spark jars"
            )
        rel_of_base[base] = rel

    # distributed predicate evaluation, grouped by partition tuple so
    # predicates over partition columns resolve
    groups: dict[tuple, list[str]] = {}
    for rel, a in live.items():
        pv = a.get("partitionValues") or {}
        groups.setdefault(
            tuple((c, pv.get(c)) for c in part_cols), []
        ).append(abs_path(rel))
    matched = None
    for pv_items, files in sorted(groups.items(), key=lambda kv: str(kv[0])):
        scan = (
            spark.read.schema(data_schema)
            .parquet(*sorted(files))
            .select(
                "*",
                F.col("_metadata.file_name").alias("__f"),
                F.col("_metadata.row_index").alias("__ri"),
            )
        )
        for c, raw in pv_items:
            lit = (
                F.lit(None).cast(by_type[c])
                if raw is None
                else F.lit(raw).cast(by_type[c])
            )
            scan = scan.withColumn(c, lit)
        m = scan.filter(predicate).select("__f", "__ri")
        matched = m if matched is None else matched.unionByName(m)
    if matched is None:
        return v_latest, 0
    n_matched = matched.count()
    if n_matched == 0:
        return v_latest, 0
    if n_matched > max_deleted_rows:
        raise NotImplementedError(
            f"delete_delta_py: predicate matches {n_matched} rows > "
            f"max_deleted_rows={max_deleted_rows} — DV serialization is "
            "driver-side in this writer; use the delta-spark jars (or "
            "raise the bound) for larger deletes"
        )
    pdf = matched.toPandas()

    new_idx: dict[str, set] = {}
    for base, grp in pdf.groupby("__f"):
        if base not in rel_of_base:
            raise ValueError(
                f"delete_delta_py: matched file {base!r} is not a live "
                "table file — corrupt scan"
            )
        new_idx[rel_of_base[base]] = set(int(i) for i in grp["__ri"])

    # union with existing DVs (the replacement DV must carry ALL
    # previously deleted rows) and drop files whose DV doesn't grow
    touched: list[tuple[str, set, int]] = []  # (rel, union, n_new)
    for rel, idx in sorted(new_idx.items()):
        old_desc = (live[rel] or {}).get("deletionVector")
        old: set = set()
        if old_desc:
            old = set(
                int(i)
                for i in delta_dv.parse_dv(delta_dv.dv_data(old_desc, path))
            )
        union = idx | old
        n_new = len(union) - len(old)
        if n_new:
            touched.append((rel, union, n_new))
    if not touched:
        return v_latest, 0

    # one DV file for all bitmaps (delta-spark packs the same way)
    dv_uuid = uuid.uuid4()
    dv_file = os.path.join(path, f"deletion_vector_{dv_uuid}.bin")
    datas = [delta_dv.serialize_dv(union) for _rel, union, _n in touched]
    offsets = delta_dv.write_dv_file(dv_file, datas)
    enc = delta_dv.z85_encode(dv_uuid.bytes)

    actions: list[dict] = []
    features = set((protocol or {}).get("readerFeatures") or [])
    if "deletionVectors" not in features or int(
        (protocol or {}).get("minReaderVersion", 1)
    ) < 3:
        # upgrading to feature-list protocol versions must carry every
        # feature the PRIOR legacy version implied (PROTOCOL.md §Feature
        # table) — otherwise a jar writer stops enforcing e.g.
        # invariants the table was created under (r11 review)
        legacy_writer = {
            2: ["appendOnly", "invariants"],
            3: ["checkConstraints"],
            4: ["generatedColumns", "changeDataFeed"],
            5: ["columnMapping"],
            6: ["identityColumns"],
        }
        wfeat = set((protocol or {}).get("writerFeatures") or [])
        for v, feats in legacy_writer.items():
            if int((protocol or {}).get("minWriterVersion", 2)) >= v:
                wfeat |= set(feats)
        if int((protocol or {}).get("minReaderVersion", 1)) >= 2:
            features |= {"columnMapping"}
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": sorted(features | {"deletionVectors"}),
                    "writerFeatures": sorted(wfeat | {"deletionVectors"}),
                }
            }
        )
    n_deleted = 0
    for (rel, union, n_new), data, off in zip(touched, datas, offsets):
        n_deleted += n_new
        old_add = live[rel]
        actions.append(
            {
                "remove": {
                    "path": rel,
                    "deletionTimestamp": 0,
                    "dataChange": True,
                    **(
                        {"deletionVector": old_add["deletionVector"]}
                        if old_add.get("deletionVector")
                        else {}
                    ),
                }
            }
        )
        # stats are dropped, not copied: per-file stats claim (possibly
        # tight) min/max/numRecords for the PHYSICAL rows, and a reader
        # honoring tightBounds could answer MIN/MAX from a value that
        # only lives in deleted rows (r11 review); stats are optional,
        # absence is always safe
        new_add = {
            k: v for k, v in old_add.items()
            if k not in ("deletionVector", "stats", "statsParsed",
                         "tightBounds")
        }
        new_add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": enc,
            "offset": int(off),
            "sizeInBytes": len(data),
            "cardinality": len(union),
        }
        new_add["dataChange"] = True
        actions.append({"add": new_add})

    commit_tmp = os.path.join(
        path, "_delta_log", f".{uuid.uuid4().hex}.json.tmp"
    )
    with open(commit_tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    commit_path = os.path.join(path, "_delta_log", f"{version:020d}.json")
    try:
        os.link(commit_tmp, commit_path)
    except FileExistsError:
        raise RuntimeError(
            f"concurrent Delta commit detected at version {version}; "
            "this pure-Python writer is single-writer"
        ) from None
    finally:
        os.unlink(commit_tmp)

    if checkpoint_interval and version % checkpoint_interval == 0:
        live_after = dict(live)
        for a in actions:
            if "add" in a:
                live_after[a["add"]["path"]] = a["add"]
        proto_after = (
            next((a["protocol"] for a in actions if "protocol" in a), None)
            or protocol
            or {"minReaderVersion": 1, "minWriterVersion": 2}
        )
        _write_checkpoint(
            os.path.join(path, "_delta_log"), version, live_after, meta,
            proto_after,
        )
    return version, n_deleted
