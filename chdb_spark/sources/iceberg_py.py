"""Apache Iceberg snapshot reader without iceberg-spark-runtime.

The Iceberg table spec is public (iceberg.apache.org/spec): a table
directory holds ``metadata/`` with versioned ``*.metadata.json`` files
(``version-hint.text`` names the current one for filesystem tables);
the current snapshot points at a MANIFEST LIST (an Avro container
file) whose entries name MANIFEST files (also Avro); each manifest
entry carries a ``data_file`` record (file_path, file_format, content,
record_count, …) plus a status (1=ADDED / 0=EXISTING / 2=DELETED).
A snapshot's live file set = every non-DELETED data-file entry across
its manifests — no log replay needed (snapshots are self-contained).

Avro decoding uses the Avro jars Spark itself ships (org.apache.avro —
present in every PySpark distribution, no extra runtime needed) through
the driver's py4j gateway: manifests are metadata-sized by design, so
driver-side iteration is exactly what the real Iceberg client does.
The data scan stays a fully distributed Spark parquet read — Iceberg
data files carry every table column (partitioning is metadata), so no
partition reconstruction is required.

Column resolution (round 10): Iceberg resolves columns by FIELD ID,
not name (spec §Column Projection) — a rename updates only the table
schema, and data files keep their old parquet names. When the table
has more than one schema in its history, the reader inspects each data
file's parquet field-id metadata (one footer read per file,
metadata-sized — the same per-file resolution the real client does in
its tasks), groups files by their id→name signature, aliases each
group to the CURRENT schema names, and unions the (still fully
distributed) scans. Fields added after a file was written surface as
NULL, exactly per spec. Single-schema tables skip the footer pass
entirely — names cannot have diverged. Files carrying no field ids
(pre-spec writers) fall back to name-based reads, documented below.

v2 row-level deletes (round 10): POSITION deletes are honored — delete
manifests' parquet files of (file_path, pos) are read by Spark itself
and anti-joined against ``_metadata.row_index``; EQUALITY deletes are
honored with full sequence-number semantics — each delete removes
null-safe-matching rows from data files whose data sequence number is
strictly less than its own (see _scan_with_deletes; the same plan the
iceberg-spark reader builds).

Honesty guards (fail loudly rather than misread):
- deletes combined with schema evolution, equality deletes on legacy
  metadata without sequence numbers, and non-uuid data-file names
  under deletes → NotImplementedError;
- non-parquet data files (ORC/Avro data) → NotImplementedError;
- renamed tables whose data files carry NO parquet field ids cannot be
  resolved (nothing to map by) — the reader raises rather than
  misreading old names.

Reference surface: the chdb reference reaches Iceberg through its table
function (reference table_functions.py:868); `read_auto(fmt="iceberg")`
prefers the real SparkCatalog when the runtime jars exist and falls
back here for local filesystem tables.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _metadata_dir(path: str) -> str:
    d = os.path.join(path, "metadata")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"not an Iceberg table (no metadata directory): {path}"
        )
    return d


def _current_metadata_file(md: str) -> str:
    hint = os.path.join(md, "version-hint.text")
    if os.path.isfile(hint):
        with open(hint) as f:
            v = f.read().strip()
        for cand in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            p = os.path.join(md, cand)
            if os.path.isfile(p):
                return p
    versions = []
    for name in os.listdir(md):
        m = re.match(r"^v?(\d+)(?:-[0-9a-f-]+)?\.metadata\.json$", name)
        if m:
            versions.append((int(m.group(1)), name))
    if not versions:
        raise FileNotFoundError(f"no *.metadata.json under {md}")
    return os.path.join(md, max(versions)[1])


def _local_path(uri: str, table_path: str) -> str:
    if uri.startswith("file:"):
        rest = uri[5:]
        while rest.startswith("//"):  # file:///x and file://x → /x
            rest = rest[1:]
        return rest
    if "://" in uri:
        raise NotImplementedError(
            f"non-local Iceberg file location {uri!r}: remote object "
            "stores need the iceberg-spark runtime"
        )
    return uri if os.path.isabs(uri) else os.path.join(table_path, uri)


def _avro_records(spark: SparkSession, path: str):
    """Iterate an Avro container file via Spark's bundled avro jars;
    yields py4j GenericRecord objects."""
    jvm = spark.sparkContext._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), reader
    )
    try:
        while dfr.hasNext():
            yield dfr.next()
    finally:
        dfr.close()


def _jstr(v) -> str | None:
    """Avro strings surface as org.apache.avro.util.Utf8 JavaObjects."""
    return None if v is None else str(v)


def read_iceberg_py(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    **_: Any,
) -> DataFrame:
    """Read a local filesystem Iceberg table at its current (or a named)
    snapshot — see module docstring for the exact guarantees."""
    # absolute from here on: the JVM (avro reader) and Spark scans resolve
    # relative paths against the JVM's cwd, not Python's
    path = os.path.abspath(path)
    md = _metadata_dir(path)
    with open(_current_metadata_file(md)) as f:
        meta = json.load(f)
    snapshots = meta.get("snapshots") or []
    sid = snapshot_id if snapshot_id is not None else meta.get(
        "current-snapshot-id"
    )
    if sid is None or sid == -1 or not snapshots:
        raise ValueError(f"Iceberg table has no current snapshot: {path}")
    snap = next((s for s in snapshots if s.get("snapshot-id") == sid), None)
    if snap is None:
        raise ValueError(
            f"snapshot-id {sid} not found (have "
            f"{[s.get('snapshot-id') for s in snapshots]})"
        )

    def _opt_long(rec, name):
        try:
            v = rec.get(name)
        except Exception:
            return None  # field absent from this writer's avro schema
        return None if v is None else int(str(v))

    manifests: list[tuple[str, int | None]] = []  # (path, list sequence)
    delete_manifests: list[tuple[str, int | None]] = []
    if snap.get("manifest-list"):
        for rec in _avro_records(
            spark, _local_path(snap["manifest-list"], path)
        ):
            mseq = _opt_long(rec, "sequence_number")
            content = rec.get("content")
            if content is not None and int(str(content)) == 1:
                # v2 DELETE manifest: position AND equality deletes are
                # honored (spec §Delete Files; equality needs the
                # sequence numbers collected here)
                delete_manifests.append(
                    (_jstr(rec.get("manifest_path")), mseq)
                )
                continue
            manifests.append((_jstr(rec.get("manifest_path")), mseq))
    else:
        # v1 inline form — no deletes possible
        manifests = [(m, None) for m in (snap.get("manifests") or [])]
    if not manifests:
        raise ValueError(f"snapshot {sid} lists no manifests")

    spec_cols = _identity_spec_cols(meta)
    files: list[str] = []
    file_parts: dict[str, dict[str, str]] = {}
    file_seq: dict[str, int | None] = {}  # data sequence number per file
    for mpath, mseq in manifests:
        for entry in _avro_records(spark, _local_path(mpath, path)):
            status = entry.get("status")
            if status is not None and int(str(status)) == 2:
                continue  # DELETED
            data_file = entry.get("data_file")
            if data_file is None:
                continue
            content = data_file.get("content")
            if content is not None and int(str(content)) != 0:
                raise NotImplementedError(
                    "Iceberg delete file in a data manifest — row-level "
                    "deletes need the iceberg-spark runtime"
                )
            fmt = (_jstr(data_file.get("file_format")) or "PARQUET").upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"Iceberg {fmt} data files: only PARQUET is supported "
                    "by the jar-light reader"
                )
            fp = _local_path(_jstr(data_file.get("file_path")), path)
            files.append(fp)
            # data sequence number: explicit on the entry, else inherited
            # from the manifest-list entry (spec §Sequence Number
            # Inheritance for ADDED rows)
            eseq = _opt_long(entry, "sequence_number")
            file_seq[fp] = eseq if eseq is not None else mseq
            if spec_cols:
                file_parts[fp] = _entry_partition_values(data_file, spec_cols)
    # v2 position-delete files for this snapshot (spec §Delete Files):
    # content=1 entries are positional (file_path, pos) parquet files —
    # applied below via a distributed row-index anti-join, the same plan
    # the iceberg-spark reader builds. content=2 (equality deletes) need
    # sequence-number ordering and refuse loudly.
    pos_deletes: list[str] = []
    pos_delete_rows = 0
    eq_deletes: list[tuple[str, int, tuple[int, ...]]] = []
    for mpath, mseq in delete_manifests:
        for entry in _avro_records(spark, _local_path(mpath, path)):
            status = entry.get("status")
            if status is not None and int(str(status)) == 2:
                continue
            data_file = entry.get("data_file")
            if data_file is None:
                continue
            content = data_file.get("content")
            c = int(str(content)) if content is not None else 1
            if c == 0:
                raise ValueError(
                    "Iceberg: DATA file entry inside a DELETE manifest "
                    "— corrupt metadata"
                )
            fmt = (_jstr(data_file.get("file_format")) or "PARQUET").upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"Iceberg {fmt} delete files: only PARQUET deletes "
                    "are supported jar-free"
                )
            dfp = _local_path(_jstr(data_file.get("file_path")), path)
            if c == 2:
                # equality delete: applies to rows of data files whose
                # data sequence number is STRICTLY LESS than its own
                eseq = _opt_long(entry, "sequence_number")
                dseq = eseq if eseq is not None else mseq
                if dseq is None:
                    raise NotImplementedError(
                        "Iceberg EQUALITY delete without a sequence "
                        "number (legacy metadata) — needs the "
                        "iceberg-spark runtime"
                    )
                try:
                    ids = data_file.get("equality_ids")
                except Exception:
                    ids = None
                if ids is None:
                    raise ValueError(
                        f"Iceberg equality delete {dfp} carries no "
                        "equality_ids — corrupt metadata"
                    )
                eq_deletes.append(
                    (dfp, dseq, tuple(int(str(i)) for i in ids))
                )
                continue
            pos_deletes.append(dfp)
            pos_delete_rows += int(str(data_file.get("record_count") or 0))
    if eq_deletes and any(file_seq[f] is None for f in set(files)):
        raise NotImplementedError(
            "Iceberg EQUALITY deletes on a table whose data manifests "
            "carry no sequence numbers — needs the iceberg-spark runtime"
        )

    if not files:
        return spark.createDataFrame(
            [], _spark_schema_from_iceberg(meta)
        )
    files = sorted(set(files))
    if pos_deletes or eq_deletes:
        # basename guards run over the WHOLE table here: per-group calls
        # see only subsets, so cross-group duplicate basenames would
        # slip past a per-call check and the basename anti-join would
        # delete rows from the wrong file (r10 third-pass review)
        _check_delete_join_names(files)

    def scan_files(fps: list[str]):
        return _scan_with_deletes(
            spark, meta, fps, sorted(set(pos_deletes)), pos_delete_rows,
            eq_deletes, file_seq,
        )

    if spec_cols and any(file_parts.get(f) for f in files):
        return _read_partitioned(spark, meta, files, file_parts, scan_files)
    if len(meta.get("schemas") or []) <= 1:
        # single-schema table: no rename/evolution ever happened, so
        # parquet names match the (only) schema — skip the footer pass
        return scan_files(files)
    if pos_deletes or eq_deletes:
        raise NotImplementedError(
            "Iceberg: row-level deletes on a schema-evolved table — "
            "combined rename+delete resolution needs the iceberg-spark "
            "runtime"
        )
    return _read_resolved_by_field_id(spark, meta, files)



def _check_delete_join_names(files: list[str]) -> None:
    """Row-level deletes join on file BASENAMES (the percent-encoding
    mismatch between _metadata.file_path and metadata paths rules out
    full paths): refuse duplicates and URL-encodable names loudly."""
    names = [os.path.basename(f) for f in files]
    if len(set(names)) != len(names):
        raise NotImplementedError(
            "Iceberg row-level deletes: duplicate data-file basenames "
            "across directories — needs the iceberg-spark runtime"
        )
    bad = [n for n in names if not re.fullmatch(r"[A-Za-z0-9._~=-]+", n)]
    if bad:
        raise NotImplementedError(
            f"Iceberg row-level deletes: data-file names {bad[:3]} "
            "contain URL-encodable characters — needs the "
            "iceberg-spark runtime"
        )


def _plain_scan(spark: SparkSession, files: list[str]) -> DataFrame:
    """Parquet scan with field-id expectations STRIPPED from the read
    schema: Spark persists 'parquet.field.id' StructField metadata into
    its inferred schema, and a scan whose read schema carries ids FAILS
    on groupmate files that lack them ("Spark read schema expects field
    Ids") — exactly what a mix of this writer's stamped files and a
    foreign writer's unstamped files produces. Name resolution is
    correct on every path that reaches here (single-schema tables, or
    groups already resolved by footer)."""
    from pyspark.sql import types as T

    def strip(dt):
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, strip(f.dataType), f.nullable)
                 for f in dt.fields]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(strip(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(
                strip(dt.keyType), strip(dt.valueType), dt.valueContainsNull
            )
        return dt

    def has_ids(dt) -> bool:
        if isinstance(dt, T.StructType):
            return any(
                "parquet.field.id" in (f.metadata or {})
                or has_ids(f.dataType)
                for f in dt.fields
            )
        if isinstance(dt, T.ArrayType):
            return has_ids(dt.elementType)
        if isinstance(dt, T.MapType):
            return has_ids(dt.keyType) or has_ids(dt.valueType)
        return False

    scan = spark.read.parquet(*files)
    if not has_ids(scan.schema):
        return scan  # nothing to strip — no second listing needed
    return spark.read.schema(strip(scan.schema)).parquet(*files)


def _scan_with_deletes(
    spark: SparkSession,
    meta: dict,
    files: list[str],
    pos_deletes: list[str],
    pos_delete_rows: int,
    eq_deletes: list[tuple[str, int, tuple[int, ...]]],
    file_seq: dict[str, int | None],
):
    """Distributed scan minus v2-deleted rows (spec §Scan Planning).

    POSITION deletes: delete files are plain parquet (file_path, pos)
    read by Spark itself, anti-joined on (file basename,
    _metadata.row_index). EQUALITY deletes: each delete file's rows
    remove matching rows (null-safe equality on the equality_ids
    columns) from data files whose data sequence number is STRICTLY
    LESS than the delete file's — realized as one anti-join per
    equality-column-set with the sequence comparison as a join
    condition; per-row sequence numbers attach via a broadcast
    (file basename → seq) map. Basenames are the join key because
    _metadata.file_path is percent-encoded while metadata paths are
    not; real writers use unique uuid names — anything else refuses
    loudly (same contract as delta_py's DV scan)."""
    from pyspark.sql import functions as F

    if not pos_deletes and not eq_deletes:
        return _plain_scan(spark, files)
    _check_delete_join_names(files)  # table-level check already ran;
    # this re-check covers direct callers with a subset
    scan = _plain_scan(spark, files).select(
        "*",
        F.col("_metadata.file_name").alias("__if_name"),
        F.col("_metadata.row_index").alias("__if_ri"),
    )
    if pos_deletes:
        deleted = (
            spark.read.parquet(*pos_deletes)
            .select(
                F.element_at(F.split(F.col("file_path"), "/"), -1).alias(
                    "__pd_name"
                ),
                F.col("pos").alias("__pd_pos"),
            )
        )
        if pos_delete_rows and pos_delete_rows < 5_000_000:
            deleted = F.broadcast(deleted)
        scan = scan.join(
            deleted,
            on=[
                scan["__if_name"] == deleted["__pd_name"],
                scan["__if_ri"] == deleted["__pd_pos"],
            ],
            how="left_anti",
        )
    if eq_deletes:
        id_to_name = {
            f["id"]: f["name"]
            for f in _current_iceberg_schema(meta).get("fields", [])
            if "id" in f
        }
        # per-row data sequence number via a broadcast basename→seq map
        seq_rows = [(os.path.basename(f), int(file_seq[f])) for f in files]
        seq_df = F.broadcast(
            spark.createDataFrame(seq_rows, "__sq_name string, __seq long")
        )
        scan = scan.join(
            seq_df, on=[scan["__if_name"] == seq_df["__sq_name"]], how="left"
        ).drop("__sq_name")
        # group delete files by their equality-column set
        by_cols: dict[tuple[str, ...], list[tuple[str, int]]] = {}
        for dfp, dseq, ids in eq_deletes:
            cols = []
            for i in ids:
                name = id_to_name.get(i)
                if name is None:
                    raise ValueError(
                        f"Iceberg equality delete {dfp}: equality field "
                        f"id {i} not in the current schema"
                    )
                cols.append(name)
            by_cols.setdefault(tuple(cols), []).append((dfp, dseq))
        for cols, dels in sorted(by_cols.items()):
            missing = [c for c in cols if c not in scan.columns]
            if missing:
                raise NotImplementedError(
                    f"Iceberg equality delete on column(s) {missing} "
                    "that are not in the data files (identity-partition "
                    "columns of Hive-style files) — needs the "
                    "iceberg-spark runtime"
                )
            del_df = None
            for dfp, dseq in sorted(dels):
                one = spark.read.parquet(dfp).select(
                    *[F.col(c).alias(f"__eq_{c}") for c in cols],
                    F.lit(dseq).cast("long").alias("__eq_seq"),
                )
                del_df = one if del_df is None else del_df.unionByName(one)
            conds = [
                scan[c].eqNullSafe(del_df[f"__eq_{c}"]) for c in cols
            ]
            conds.append(scan["__seq"] < del_df["__eq_seq"])
            scan = scan.join(F.broadcast(del_df), on=conds, how="left_anti")
        scan = scan.drop("__seq")
    return scan.drop("__if_name", "__if_ri")


def _entry_partition_values(data_file, spec_cols: list[str]) -> dict[str, str]:
    """Identity-partition values of one manifest entry, as strings
    (cast back through the table schema at scan time)."""
    try:
        part = data_file.get("partition")
    except Exception:
        return {}
    if part is None:
        return {}
    out: dict[str, str] = {}
    for c in spec_cols:
        try:
            v = part.get(c)
        except Exception:
            v = None
        if v is not None:
            out[c] = str(v)
    return out


def _read_partitioned(
    spark: SparkSession,
    meta: dict,
    files: list[str],
    file_parts: dict[str, dict[str, str]],
    scan_files,
) -> DataFrame:
    """Scan an identity-partitioned table: files whose parquet data
    already carries the source columns (jar-written tables) read plain;
    files written Hive-style (partition columns omitted — this module's
    own writer) get them restored from the manifest partition tuple,
    which is exactly what spec §Column Projection rule 2 requires of
    readers. Files are GROUPED by partition tuple so each group stays
    one distributed scan."""
    from pyspark.sql import functions as F

    if len(meta.get("schemas") or []) > 1:
        raise NotImplementedError(
            "Iceberg: partitioned table with schema evolution history — "
            "combined rename+partition resolution needs the "
            "iceberg-spark runtime"
        )
    spark_types = {
        f.name: f.dataType for f in _spark_schema_from_iceberg(meta).fields
    }
    import pyarrow.parquet as pq

    groups: dict[tuple, list[str]] = {}
    for fp in files:
        sig = tuple(sorted(file_parts.get(fp, {}).items()))
        groups.setdefault(sig, []).append(fp)
    order = list(spark_types)
    complete: list[str] = []  # files already carrying the source columns
    parts: list[DataFrame] = []
    for sig, fps in sorted(groups.items()):
        # EVERY file's footer is checked (r10 review: a representative
        # footer misreads a partition tuple that mixes jar-written files
        # carrying the source columns with this writer's Hive-style
        # files that omit them). One schema-only footer read per file,
        # driver-side — the same O(files) metadata pass the manifest
        # walk already makes; tables big enough for this to hurt belong
        # on the jar reader (module docstring).
        sig_cols = {col for col, _ in sig}
        # restore files sub-grouped by WHICH sig columns they carry —
        # one union-wide inferred schema would skip the lit() restore
        # for files missing a column that a groupmate carries (r10
        # second-pass review: silent NULLs on multi-column specs)
        restore: dict[tuple, list[str]] = {}
        for fp in sorted(fps):
            names = _spark_visible_names(pq.read_schema(fp))
            if sig_cols <= names:
                complete.append(fp)
            else:
                restore.setdefault(
                    tuple(sorted(names & sig_cols)), []
                ).append(fp)
        for carried, sub in sorted(restore.items()):
            scan = scan_files(sub)
            for col, raw in sig:
                if col not in carried:
                    scan = scan.withColumn(
                        col, F.lit(raw).cast(spark_types.get(col, "string"))
                    )
            parts.append(
                scan.select(*[c for c in order if c in scan.columns])
            )
    if complete:
        scan = scan_files(sorted(complete))
        parts.insert(
            0, scan.select(*[c for c in order if c in scan.columns])
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _spark_visible_names(schema) -> set[str]:
    """Column names Spark's schema INFERENCE will report for a file.

    Spark trusts the ``org.apache.spark.sql.parquet.row.metadata``
    footer key (its own schema JSON) over the physical parquet schema
    when present — so a file rewritten with extra columns but a stale
    row.metadata reads WITHOUT those columns. Classification must
    mirror that, or the complete/restore split diverges from the scan
    (r10: found while building the mixed-writer fixture)."""
    md = schema.metadata or {}
    raw = md.get(b"org.apache.spark.sql.parquet.row.metadata")
    if raw:
        try:
            return {
                f["name"] for f in json.loads(raw.decode()).get("fields", [])
            }
        except (ValueError, KeyError, AttributeError, TypeError):
            pass  # malformed metadata → physical names
    return set(schema.names)


def _parquet_field_ids(fp: str) -> dict[int, str] | None:
    """field-id → parquet column name from one footer, or None when the
    file carries no (or partial) ids — pre-spec writers."""
    import pyarrow.parquet as pq

    out: dict[int, str] = {}
    for f in pq.read_schema(fp):
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if fid is None:
            return None
        out[int(fid)] = f.name
    return out


def _read_resolved_by_field_id(
    spark: SparkSession, meta: dict, files: list[str]
) -> DataFrame:
    """Multi-schema table: resolve every data file's columns against the
    CURRENT schema by field id (spec §Column Projection). Files are
    grouped by their id→name signature — each group stays one
    distributed parquet scan; only footers are read driver-side."""
    from pyspark.sql import functions as F

    cur = _current_iceberg_schema(meta)
    cur_fields = [f for f in cur.get("fields", []) if "id" in f]
    if not cur_fields:
        return spark.read.parquet(*files)  # v1 schema without ids
    spark_types = {
        f.name: f.dataType
        for f in _spark_schema_from_iceberg(meta).fields
    }

    groups: dict[tuple, list[str]] = {}
    for fp in files:
        ids = _parquet_field_ids(fp)
        if ids is None:
            # No ids to map by. Safe only if names already match the
            # current schema — otherwise refuse (misreading silently is
            # the one thing this reader must never do).
            import pyarrow.parquet as _pq

            names = set(_pq.read_schema(fp).names)
            if not {f["name"] for f in cur_fields} <= names:
                raise NotImplementedError(
                    f"Iceberg data file {fp} carries no parquet field ids "
                    "and its column names do not match the current schema "
                    "— rename resolution needs the iceberg-spark runtime"
                )
            ids = {f["id"]: f["name"] for f in cur_fields}
        groups.setdefault(tuple(sorted(ids.items())), []).append(fp)

    parts: list[DataFrame] = []
    for sig, fps in sorted(groups.items()):
        id_to_old = dict(sig)
        scan = _plain_scan(spark, sorted(fps))
        cols = []
        for f in cur_fields:
            old = id_to_old.get(f["id"])
            if old is not None and old in scan.columns:
                col = F.col(old)
                t = f.get("type")
                if isinstance(t, str):
                    # cast to the CURRENT schema's type: a file written
                    # before an int→long (or float→double) promotion
                    # keeps the old physical type, and a single-group
                    # result would leak it into the output schema
                    # (ADVICE r10, low)
                    st = _prim_cast_type(t)
                    if st is not None:
                        col = col.cast(st)
                else:
                    # nested struct/list/map: field-id resolution here is
                    # top-level only, so a nested-field rename would keep
                    # the file's old inner names — verify they match the
                    # current schema or refuse (ADVICE r10, low)
                    exp = _nested_name_tree(t)
                    act = _spark_name_tree(scan.schema[old].dataType)
                    if exp != act:
                        raise NotImplementedError(
                            f"Iceberg column {f['name']!r}: nested field "
                            f"names in data file group {sorted(fps)[0]}… "
                            f"({act}) differ from the current schema "
                            f"({exp}) — nested rename resolution needs "
                            "the iceberg-spark runtime"
                        )
                cols.append(col.alias(f["name"]))
            else:
                # field added to the schema after this file was written
                cols.append(
                    F.lit(None)
                    .cast(spark_types.get(f["name"], "string"))
                    .alias(f["name"])
                )
        parts.append(scan.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit Murmur3 (x86 variant), the hash Iceberg's ``bucket[N]``
    transform is defined over (spec §Partition Transforms: "hash using
    the 32-bit Murmur3, x86 variant, seed 0"). Returns the SIGNED 32-bit
    value, matching the spec's published test vectors (Appendix B)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - n % 4
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def iceberg_bucket(value, n: int) -> int:
    """``bucket[N]`` partition value of ``value`` (spec §Partition
    Transforms / Appendix B): murmur3_x86_32 of the value's canonical
    byte form, then ``(hash & Integer.MAX_VALUE) % N``. int/long/date
    hash as the 8-byte little-endian long; strings as UTF-8 bytes.
    Spec test vectors pinned in tests/test_iceberg_py.py: hash(long 34)
    = 2017239379, hash('iceberg') = 1210000089, hash(date 2017-11-16
    as 17486) = -653330422."""
    import datetime

    if isinstance(value, bool) or value is None:
        raise NotImplementedError(
            f"iceberg_bucket: unsupported value {value!r}"
        )
    if isinstance(value, datetime.datetime):
        # spec: timestamps hash as MICROSECONDS from epoch (long)
        epoch = datetime.datetime(
            1970, 1, 1, tzinfo=value.tzinfo
        )
        value = int((value - epoch).total_seconds() * 1_000_000)
    elif isinstance(value, datetime.date):
        value = (value - datetime.date(1970, 1, 1)).days
    if isinstance(value, int):
        data = value.to_bytes(8, "little", signed=True)
    elif isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(value, bytes):
        data = value
    else:
        raise NotImplementedError(
            f"iceberg_bucket: unsupported type {type(value).__name__}"
        )
    return (murmur3_x86_32(data) & 0x7FFFFFFF) % n


def iceberg_day(value) -> int:
    """``day`` transform partition value: days from the Unix epoch
    (spec §Partition Transforms — the stored manifest value is an int
    with a ``date`` logical meaning)."""
    import datetime

    if isinstance(value, datetime.datetime):
        value = value.date()
    if isinstance(value, datetime.date):
        return (value - datetime.date(1970, 1, 1)).days
    if isinstance(value, int):
        return value
    raise NotImplementedError(
        f"iceberg_day: unsupported type {type(value).__name__}"
    )


def _prim_cast_type(t: str):
    """Spark type to CAST a field-id-resolved column to, for Iceberg
    primitive types whose cast is lossless (the spec's allowed
    promotions: int→long, float→double; plus identity casts). Types
    where a cast could corrupt bytes (uuid, binary, fixed, decimal)
    return None — the scanned physical type passes through unchanged."""
    from pyspark.sql import types as T

    return {
        "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "date": T.DateType(),
        "timestamp": T.TimestampType(), "timestamptz": T.TimestampType(),
        "string": T.StringType(),
    }.get(t)


def _nested_name_tree(t):
    """Nested-field NAME structure of an Iceberg type JSON — the shape
    compared against the scanned parquet type to detect nested renames
    this top-level-id resolver cannot express."""
    if isinstance(t, str) or t is None:
        return None
    kind = t.get("type")
    if kind == "struct":
        return {
            f["name"]: _nested_name_tree(f.get("type"))
            for f in t.get("fields", [])
        }
    if kind == "list":
        return ("list", _nested_name_tree(t.get("element")))
    if kind == "map":
        return (
            "map",
            _nested_name_tree(t.get("key")),
            _nested_name_tree(t.get("value")),
        )
    return None


def _spark_name_tree(dt):
    """Nested-field NAME structure of a Spark DataType (counterpart of
    :func:`_nested_name_tree` for the scanned side)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return {f.name: _spark_name_tree(f.dataType) for f in dt.fields}
    if isinstance(dt, T.ArrayType):
        return ("list", _spark_name_tree(dt.elementType))
    if isinstance(dt, T.MapType):
        return (
            "map",
            _spark_name_tree(dt.keyType),
            _spark_name_tree(dt.valueType),
        )
    return None


def _spark_type_from_iceberg_type(t):
    """Iceberg type JSON → Spark DataType, nested types included (r11).
    Unknown primitive strings (decimal, fixed, time) fall back to
    StringType — used only for NULL-fill casts and empty snapshots."""
    from pyspark.sql import types as T

    prim = {
        "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "date": T.DateType(),
        "timestamp": T.TimestampType(), "timestamptz": T.TimestampType(),
        "string": T.StringType(), "uuid": T.StringType(),
        "binary": T.BinaryType(),
    }
    if isinstance(t, str) or t is None:
        return prim.get(t) or T.StringType()
    kind = t.get("type")
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _spark_type_from_iceberg_type(f.get("type")),
                    True,
                )
                for f in t.get("fields", [])
            ]
        )
    if kind == "list":
        return T.ArrayType(
            _spark_type_from_iceberg_type(t.get("element")), True
        )
    if kind == "map":
        return T.MapType(
            _spark_type_from_iceberg_type(t.get("key")),
            _spark_type_from_iceberg_type(t.get("value")),
            True,
        )
    return T.StringType()


def _spark_schema_from_iceberg(meta: dict):
    """Iceberg-JSON → Spark schema mapping (empty snapshots, NULL-fill
    casts); nested struct/list/map types map structurally (r11)."""
    from pyspark.sql import types as T

    schema = None
    if meta.get("schemas"):
        cur = meta.get("current-schema-id", 0)
        schema = next(
            (s for s in meta["schemas"] if s.get("schema-id") == cur),
            meta["schemas"][0],
        )
    schema = schema or meta.get("schema") or {"fields": []}
    return T.StructType(
        [
            T.StructField(
                f["name"],
                _spark_type_from_iceberg_type(f.get("type")),
                True,
            )
            for f in schema.get("fields", [])
        ]
    )


def _stamp_expr(col, ice_t, dt):
    """Column expression whose nested STRUCT fields carry
    ``parquet.field.id`` alias metadata (CreateNamedStruct propagates
    NamedExpression metadata into the written struct type — survives
    optimization, unlike a metadata-only ``df.to()`` projection, which
    Catalyst elides as a no-op). Structs inside arrays/maps are left
    as-is: their ids live in the schema JSON only."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(ice_t, dict) and ice_t.get("type") == "struct" \
            and isinstance(dt, T.StructType):
        inner = [
            _stamp_expr(
                col.getField(sf.name), f_ice.get("type"), sf.dataType
            ).alias(
                sf.name, metadata={"parquet.field.id": int(f_ice["id"])}
            )
            for f_ice, sf in zip(ice_t.get("fields", []), dt.fields)
        ]
        return F.when(col.isNotNull(), F.struct(*inner))
    return col


def _stamped_columns(iceberg_fields: list[dict], spark_schema):
    """Select-list of columns with field-id metadata attached from the
    matching Iceberg schema fields, recursively through structs
    (positional match — the append guard pinned name+type+order)."""
    from pyspark.sql import functions as F

    return [
        _stamp_expr(F.col(sf.name), f.get("type"), sf.dataType).alias(
            sf.name, metadata={"parquet.field.id": int(f["id"])}
        )
        for f, sf in zip(iceberg_fields, spark_schema.fields)
    ]


# ---------------------------------------------------------------------------
# jar-free writer (reference surface: to_iceberg, pandas_compat.py:2177)
# ---------------------------------------------------------------------------

#: Avro schemas for the manifest list / manifest files this writer emits —
#: the spec's core required fields (iceberg.apache.org/spec §Manifests,
#: §Manifest Lists); optional stats/partition fields are omitted, which
#: the spec allows (they are nullable/optional for readers).
_MANIFEST_LIST_AVRO = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int", "default": 0},
            # sequence numbers MUST survive carry-forward appends:
            # equality-delete resolution orders by them, and dropping
            # them turns readable tables into loud refusals (r10)
            {"name": "sequence_number", "type": "long", "default": 0},
            {"name": "added_snapshot_id", "type": "long"},
        ],
    }
)

def _manifest_avro_schema(partition_fields: list[tuple[str, str]]) -> str:
    """Manifest-entry Avro schema; ``partition_fields`` is
    [(source column name, avro primitive type)] for identity partitions
    (spec §Manifests: the ``partition`` struct is keyed by the spec)."""
    data_file_fields = [
        {"name": "content", "type": "int", "default": 0},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
    ]
    if partition_fields:
        # plain (non-union) types: this writer refuses NULL partition
        # values, and py4j Integers don't resolve inside ["null","long"]
        # unions (GenericData.resolveUnion matches by exact schema name)
        data_file_fields.insert(
            1,
            {
                "name": "partition",
                "type": {
                    "type": "record",
                    "name": "r102",
                    "fields": [
                        {"name": n, "type": t} for n, t in partition_fields
                    ],
                },
            },
        )
    return json.dumps(
        {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int"},
                {"name": "snapshot_id", "type": ["null", "long"],
                 "default": None},
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": data_file_fields,
                    },
                },
            ],
        }
    )


_MANIFEST_AVRO = _manifest_avro_schema([])

#: Spark primitive → Iceberg type-string (inverse of the reader's map)
_ICEBERG_TYPE_OF_SPARK = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "date": "date",
    "timestamp": "timestamptz", "string": "string", "binary": "binary",
    "short": "int", "byte": "int",
}


def _write_avro_file(spark: SparkSession, path: str, schema_json: str,
                     rows: list[dict]) -> None:
    """Write an Avro container file through Spark's bundled
    org.apache.avro classes (same classes the reader decodes with)."""
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

    try:
        for d in rows:
            dfw.append(mk(sch, d))
    finally:
        dfw.close()


def _iceberg_type_of(dt, alloc) -> Any:
    """Spark DataType → Iceberg type JSON, allocating ids for NESTED
    structure fields from ``alloc`` (a callable returning the next id).
    Pre-order like iceberg-java's assignFreshIds: a struct's own fields
    get ids before their children recurse."""
    tn = dt.typeName()
    it = _ICEBERG_TYPE_OF_SPARK.get(tn)
    if it is not None:
        return it
    if tn == "struct":
        ids = [alloc() for _ in dt.fields]
        return {
            "type": "struct",
            "fields": [
                {"id": fid, "name": f.name, "required": False,
                 "type": _iceberg_type_of(f.dataType, alloc)}
                for fid, f in zip(ids, dt.fields)
            ],
        }
    if tn == "array":
        eid = alloc()
        return {
            "type": "list", "element-id": eid,
            "element": _iceberg_type_of(dt.elementType, alloc),
            "element-required": False,
        }
    if tn == "map":
        kid, vid = alloc(), alloc()
        return {
            "type": "map", "key-id": kid,
            "key": _iceberg_type_of(dt.keyType, alloc),
            "value-id": vid,
            "value": _iceberg_type_of(dt.valueType, alloc),
            "value-required": False,
        }
    raise NotImplementedError(
        f"write_iceberg_py: type {tn} — decimal/interval types need the "
        "iceberg-spark runtime"
    )


def _iceberg_schema_of(df: DataFrame) -> list[dict]:
    """Iceberg schema fields for a DataFrame. Top-level columns keep the
    positional ids 1..N (unchanged from the primitive-only writer, so
    existing tables' stamped files stay valid); nested structure ids
    continue from N+1 in pre-order."""
    n = len(df.schema.fields)
    counter = [n]

    def alloc() -> int:
        counter[0] += 1
        return counter[0]

    return [
        {"id": i + 1, "name": f.name, "required": False,
         "type": _iceberg_type_of(f.dataType, alloc)}
        for i, f in enumerate(df.schema.fields)
    ]


def _strip_type_ids(t):
    """Structural shape of an Iceberg type with every id annotation
    removed — the append-guard comparison key (two writes of the same
    Spark schema must compare equal even though nested id allocation
    depends on the table's history)."""
    if isinstance(t, str) or t is None:
        return t
    kind = t.get("type")
    if kind == "struct":
        return {
            "type": "struct",
            "fields": [
                {"name": f["name"], "type": _strip_type_ids(f.get("type"))}
                for f in t.get("fields", [])
            ],
        }
    if kind == "list":
        return {
            "type": "list", "element": _strip_type_ids(t.get("element"))
        }
    if kind == "map":
        return {
            "type": "map", "key": _strip_type_ids(t.get("key")),
            "value": _strip_type_ids(t.get("value")),
        }
    return t


def _max_field_id(fields: list[dict]) -> int:
    """Largest id anywhere in an Iceberg schema (for last-column-id)."""
    best = 0

    def walk_type(t):
        nonlocal best
        if not isinstance(t, dict):
            return
        kind = t.get("type")
        if kind == "struct":
            for f in t.get("fields", []):
                best = max(best, int(f.get("id") or 0))
                walk_type(f.get("type"))
        elif kind == "list":
            best = max(best, int(t.get("element-id") or 0))
            walk_type(t.get("element"))
        elif kind == "map":
            best = max(best, int(t.get("key-id") or 0),
                       int(t.get("value-id") or 0))
            walk_type(t.get("key"))
            walk_type(t.get("value"))

    for f in fields:
        best = max(best, int(f.get("id") or 0))
        walk_type(f.get("type"))
    return best


#: Spark type → Avro primitive for identity-partition manifest values
#: (all integer widths map to long: Avro's Number-tolerant writeLong
#: accepts py4j Integers, and the reader casts back via the table schema)
_AVRO_OF_SPARK = {
    "integer": "long", "long": "long", "short": "long", "byte": "long",
    "string": "string",
}


def _identity_spec_cols(meta: dict) -> list[str]:
    """Identity-transform source column names of the default partition
    spec (current schema names, resolved by source-id)."""
    specs = meta.get("partition-specs") or []
    default_id = meta.get("default-spec-id", 0)
    spec = next(
        (s for s in specs if s.get("spec-id") == default_id),
        specs[0] if specs else {"fields": []},
    )
    id_to_name = {
        f["id"]: f["name"]
        for f in _current_iceberg_schema(meta).get("fields", [])
        if "id" in f
    }
    out = []
    for f in spec.get("fields", []):
        if f.get("transform") == "identity":
            name = id_to_name.get(f.get("source-id")) or f.get("name")
            out.append(name)
    return out


def write_iceberg_py(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> int:
    """Minimal pure-Python Iceberg v2 writer for local filesystem tables
    (HadoopTables layout): Spark writes the parquet data files (fully
    distributed), the driver writes the metadata-sized Avro manifest +
    manifest list and commits a new ``v{N}.metadata.json`` with an
    EEXIST-atomic link (concurrent-writer safe on one filesystem), then
    bumps ``version-hint.text``.

    Scope (fail-loud outside it, per the module's honesty contract):
    unpartitioned or IDENTITY-partitioned tables (``partition_by``,
    round 10), primitive AND nested struct/array/map column types (r11;
    decimal/interval refuse), ``append`` / ``overwrite`` only. Nested
    struct fields get spec field ids in both the schema JSON and the
    parquet footers; list/map element ids live in the schema JSON only
    (Spark cannot stamp element-level footer ids — harmless for this
    reader and for name-mapping-capable readers).
    Appends carry the prior snapshot's manifests forward in the new
    manifest list; overwrite starts a fresh file set — prior snapshots
    remain time-travelable by snapshot id. Schema changes against an
    existing table raise (names+types comparison), mirroring
    write_delta_py's guard.

    Identity partitioning (spec §Partitioning): partition VALUES are
    metadata — each data file belongs to one partition tuple, recorded
    in its manifest entry, and the ``partition-specs`` JSON declares
    the identity transforms. The distributed write uses Spark's
    ``partitionBy`` (one pass, no per-partition driver loop); the
    reader restores the source columns from manifest metadata, which
    the spec requires of readers (§Column Projection rule 2). Appending
    to an existing table inherits its spec; changing the spec raises.
    NULL partition values raise. Non-identity transforms (bucket,
    truncate, days, ...) need the iceberg-spark runtime.

    Returns the committed snapshot id.
    """
    import shutil
    import tempfile
    import uuid

    if mode not in ("append", "overwrite"):
        raise ValueError(f"write_iceberg_py: unsupported mode {mode!r}")
    spark = df.sparkSession
    # absolute from here on: the JVM (avro writer) and the Spark parquet
    # write resolve relative paths against the JVM's cwd, not Python's
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    md = os.path.join(path, "metadata")
    exists = os.path.isdir(md) and any(
        n.endswith(".metadata.json") for n in os.listdir(md)
    )
    prior_meta: dict = {}
    prior_version = 0
    if exists:
        cur = _current_metadata_file(md)
        with open(cur) as f:
            prior_meta = json.load(f)
        m = re.match(r"^v?(\d+)", os.path.basename(cur))
        prior_version = int(m.group(1)) if m else 0
        specs = prior_meta.get("partition-specs") or []
        spec_fields = [
            f for s in specs if s.get("spec-id") ==
            prior_meta.get("default-spec-id", 0) for f in s.get("fields", [])
        ]
        if any(f.get("transform") != "identity" for f in spec_fields):
            raise NotImplementedError(
                "write_iceberg_py: non-identity partition transforms need "
                "the iceberg-spark runtime"
            )
        table_partition_by = _identity_spec_cols(prior_meta)
        if partition_by is None:
            partition_by = table_partition_by  # inherit the table's spec
        elif list(partition_by) != table_partition_by:
            raise ValueError(
                f"write_iceberg_py: partition_by {list(partition_by)} "
                f"differs from the table's spec {table_partition_by} — "
                "spec evolution needs the iceberg-spark runtime"
            )
        prior_cur_fields = (_current_iceberg_schema(prior_meta)).get(
            "fields", []
        )
        # compare with every id annotation STRIPPED: nested id
        # allocation depends on table history, so two writes of the
        # same Spark schema must still compare equal (r11 nested types)
        prior_fields = [
            {"name": f["name"], "type": _strip_type_ids(f["type"])}
            for f in prior_cur_fields
        ]
        new_fields = [
            {"name": f["name"], "type": _strip_type_ids(f["type"])}
            for f in _iceberg_schema_of(df)
        ]
        if prior_fields != new_fields:
            raise ValueError(
                f"write_iceberg_py: DataFrame schema differs from the "
                f"table's committed schema at {path} — schema evolution "
                f"needs the iceberg-spark runtime.\n"
                f"  table: {prior_fields}\n  frame: {new_fields}"
            )
    os.makedirs(md, exist_ok=True)

    partition_by = list(partition_by or [])
    # field ids: fresh pre-order allocation for a new table; the CURRENT
    # schema's ids reused for an existing one (the schema guard above
    # pinned name+type+order) — used for parquet stamping AND the spec.
    # Nested struct fields carry their own ids (r11).
    if exists and all("id" in f for f in prior_cur_fields):
        eff_fields = prior_cur_fields
    else:
        eff_fields = _iceberg_schema_of(df)
    field_id_of = {f["name"]: f["id"] for f in eff_fields}
    part_avro: list[tuple[str, str]] = []
    for c in partition_by:
        f = next((f for f in df.schema.fields if f.name == c), None)
        if f is None:
            raise ValueError(f"write_iceberg_py: partition column {c!r} "
                             "not in DataFrame")
        at = _AVRO_OF_SPARK.get(f.dataType.typeName())
        if at is None:
            raise NotImplementedError(
                f"write_iceberg_py: partition column {c!r} has type "
                f"{f.dataType.typeName()} — identity partitions support "
                "int/long/string"
            )
        part_avro.append((c, at))

    # --- data files: distributed write, then move under data/ ----------
    stage = tempfile.mkdtemp(prefix="_iceberg_stage_", dir=path)
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    entries: list[dict] = []
    try:
        # Stamp parquet field ids (spec: data files MUST carry field ids
        # so readers can resolve columns after renames) — Spark writes
        # them when the output attribute metadata has 'parquet.field.id'
        # (spark.sql.parquet.fieldId.write.enabled, default true).
        # Alias metadata is used (NOT df.to(): a metadata-only .to()
        # projection is elided by Catalyst and the ids never reach the
        # files); nested struct fields stamp through CreateNamedStruct
        # (r11). List elements / map keys have no NamedExpression to
        # carry metadata — their ids live in the schema JSON only
        # (harmless for this reader and name-mapping-capable readers).
        df_ids = df.select(*_stamped_columns(eff_fields, df.schema))
        if partition_by:
            # one distributed pass; Spark lays out <col>=<val>/ dirs and
            # (per Hive convention) omits the partition columns from the
            # files — the manifest partition tuple carries the values,
            # and readers restore the columns per spec §Column Projection
            writer = df_ids.write.mode("overwrite").partitionBy(*partition_by)
            writer.parquet(stage)
        else:
            df_ids.write.mode("overwrite").parquet(stage)
        import urllib.parse

        import pyarrow.parquet as pq

        spark_type_of = {f.name: f.dataType.typeName()
                         for f in df.schema.fields}
        for root, _dirs, names in sorted(os.walk(stage)):
            rel = os.path.relpath(root, stage)
            part_vals: dict[str, Any] = {}
            if rel != ".":
                for seg in rel.replace(os.sep, "/").split("/"):
                    col, _, raw = seg.partition("=")
                    if col not in partition_by:
                        continue
                    if raw == "__HIVE_DEFAULT_PARTITION__":
                        raise ValueError(
                            f"write_iceberg_py: NULL value in partition "
                            f"column {col!r}"
                        )
                    val = urllib.parse.unquote(raw)
                    if spark_type_of[col] != "string":
                        val = int(val)
                    part_vals[col] = val
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(root, name)
                sub = "/".join(f"{c}={part_vals[c]}" for c in partition_by
                               if c in part_vals)
                dest_dir = os.path.join(data_dir, sub) if sub else data_dir
                os.makedirs(dest_dir, exist_ok=True)
                dest = os.path.join(dest_dir, f"{uuid.uuid4().hex}.parquet")
                n_rows = pq.read_metadata(src).num_rows
                st = os.stat(src)
                os.rename(src, dest)
                data_file: dict[str, Any] = {
                    "content": 0,
                    "file_path": dest,
                    "file_format": "PARQUET",
                    "record_count": n_rows,
                    "file_size_in_bytes": st.st_size,
                }
                if partition_by:
                    if set(part_vals) != set(partition_by):
                        raise ValueError(
                            f"write_iceberg_py: data file {src} missing "
                            f"partition dirs for {partition_by}"
                        )
                    data_file["partition"] = dict(part_vals)
                entries.append(
                    {"status": 1, "snapshot_id": None, "data_file": data_file}
                )
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    # --- snapshot id / manifest list -----------------------------------
    snapshots = list(prior_meta.get("snapshots") or [])
    snap_id = max((s["snapshot-id"] for s in snapshots), default=0) + 1
    # sequence numbers order DELETES vs data and have NO required
    # relation to snapshot ids (r10 third-pass review: deriving the new
    # sequence from snapshot ids could stamp appended rows BELOW an
    # existing equality delete's sequence, silently losing them)
    manifest_path = os.path.join(md, f"m-{uuid.uuid4().hex}.avro")
    _write_avro_file(
        spark, manifest_path, _manifest_avro_schema(part_avro), entries
    )

    # carried-forward manifests come FIRST so the new sequence can be
    # derived above every sequence the table already holds
    carried: list[dict] = []
    if mode == "append" and exists and prior_meta.get("current-snapshot-id", -1) != -1:
        prior_snap = next(
            s for s in snapshots
            if s["snapshot-id"] == prior_meta["current-snapshot-id"]
        )
        for rec in _avro_records(
            spark, _local_path(prior_snap["manifest-list"], path)
        ):
            try:
                mseq = rec.get("sequence_number")
            except Exception:
                mseq = None
            added = int(str(rec.get("added_snapshot_id") or snap_id))
            carried.append(
                {
                    "manifest_path": _jstr(rec.get("manifest_path")),
                    "manifest_length": int(str(rec.get("manifest_length") or 0)),
                    "partition_spec_id": 0,
                    "content": int(str(rec.get("content") or 0)),
                    # preserve the original sequence; legacy lists
                    # without one approximate with the adding snapshot
                    # (our snapshots use sequence == snapshot id)
                    "sequence_number": (
                        int(str(mseq)) if mseq is not None else added
                    ),
                    "added_snapshot_id": added,
                }
            )
    seq_new = max(
        int(prior_meta.get("last-sequence-number") or 0),
        max((int(s.get("sequence-number") or 0) for s in snapshots),
            default=0),
        max((r["sequence_number"] for r in carried), default=0),
    ) + 1
    list_rows = [
        {
            "manifest_path": manifest_path,
            "manifest_length": os.stat(manifest_path).st_size,
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq_new,
            "added_snapshot_id": snap_id,
        }
    ] + carried
    ml_path = os.path.join(md, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
    _write_avro_file(spark, ml_path, _MANIFEST_LIST_AVRO, list_rows)

    # --- metadata json + atomic publish ---------------------------------
    snapshots.append(
        {
            "snapshot-id": snap_id,
            "sequence-number": seq_new,
            "manifest-list": ml_path,
            "summary": {"operation": mode},
        }
    )
    version = prior_version + 1
    # Preserve the table's schema HISTORY on existing tables — resetting
    # it would erase renames and break the reader's field-id resolution
    # (the guard above already pinned the frame to the current schema).
    if exists and prior_meta.get("schemas"):
        schemas = prior_meta["schemas"]
        current_schema_id = prior_meta.get("current-schema-id", 0)
        last_column_id = prior_meta.get(
            "last-column-id", len(df.schema.fields)
        )
    else:
        schemas = [
            {"schema-id": 0, "type": "struct", "fields": eff_fields}
        ]
        current_schema_id = 0
        last_column_id = _max_field_id(eff_fields)
    meta = {
        "format-version": 2,
        "table-uuid": prior_meta.get("table-uuid") or str(uuid.uuid4()),
        "location": path,
        "last-sequence-number": seq_new,
        "last-column-id": last_column_id,
        "current-snapshot-id": snap_id,
        "schemas": schemas,
        "current-schema-id": current_schema_id,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": c,
                        "transform": "identity",
                        "source-id": field_id_of[c],
                        "field-id": 1000 + i,
                    }
                    for i, c in enumerate(partition_by)
                ],
            }
        ],
        "default-spec-id": 0,
        "snapshots": snapshots,
    }
    tmp = os.path.join(md, f".{uuid.uuid4().hex}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    meta_path = os.path.join(md, f"v{version}.metadata.json")
    try:
        os.link(tmp, meta_path)  # EEXIST-atomic: refuse concurrent commit
    except FileExistsError:
        raise RuntimeError(
            f"concurrent Iceberg commit detected at version {version}; "
            "this pure-Python writer is single-writer"
        ) from None
    finally:
        os.unlink(tmp)
    hint_tmp = os.path.join(md, f".hint-{uuid.uuid4().hex}.tmp")
    with open(hint_tmp, "w") as f:
        f.write(str(version))
    os.replace(hint_tmp, os.path.join(md, "version-hint.text"))
    return snap_id


def rename_iceberg_column(path: str, old: str, new: str) -> None:
    """Metadata-only column rename (Iceberg ALTER TABLE ... RENAME
    COLUMN): appends a new schema (same field ids, new name) and points
    ``current-schema-id`` at it — data files are untouched, per spec.
    The reader resolves old files back to the new name by field id."""
    md = _metadata_dir(os.path.abspath(path))
    cur_file = _current_metadata_file(md)
    with open(cur_file) as f:
        meta = json.load(f)
    cur = _current_iceberg_schema(meta)
    fields = [dict(f) for f in cur.get("fields", [])]
    hit = [f for f in fields if f.get("name") == old]
    if not hit:
        raise ValueError(f"rename_iceberg_column: no column {old!r}")
    if any(f.get("name") == new for f in fields):
        raise ValueError(f"rename_iceberg_column: {new!r} already exists")
    if any("id" not in f for f in fields):
        raise NotImplementedError(
            "rename_iceberg_column: schema fields carry no ids (v1 "
            "legacy) — rename needs the iceberg-spark runtime"
        )
    hit[0]["name"] = new
    schemas = list(meta.get("schemas") or [])
    new_id = max((s.get("schema-id", 0) for s in schemas), default=0) + 1
    schemas.append({"schema-id": new_id, "type": "struct", "fields": fields})
    meta["schemas"] = schemas
    meta["current-schema-id"] = new_id
    m = re.match(r"^v?(\d+)", os.path.basename(cur_file))
    version = (int(m.group(1)) if m else 0) + 1
    import uuid as _uuid

    tmp = os.path.join(md, f".{_uuid.uuid4().hex}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    meta_path = os.path.join(md, f"v{version}.metadata.json")
    try:
        os.link(tmp, meta_path)  # same EEXIST-atomic commit as the writer
    except FileExistsError:
        raise RuntimeError(
            f"concurrent Iceberg commit detected at version {version}"
        ) from None
    finally:
        os.unlink(tmp)
    hint_tmp = os.path.join(md, f".hint-{_uuid.uuid4().hex}.tmp")
    with open(hint_tmp, "w") as f:
        f.write(str(version))
    os.replace(hint_tmp, os.path.join(md, "version-hint.text"))


def _current_iceberg_schema(meta: dict) -> dict:
    if meta.get("schemas"):
        cur = meta.get("current-schema-id", 0)
        return next(
            (s for s in meta["schemas"] if s.get("schema-id") == cur),
            meta["schemas"][0],
        )
    return meta.get("schema") or {"fields": []}


def iceberg_snapshot_ids(path: str) -> list[int]:
    """Snapshot ids recorded in the current metadata file (newest last)."""
    with open(_current_metadata_file(_metadata_dir(path))) as f:
        meta = json.load(f)
    return [s["snapshot-id"] for s in meta.get("snapshots") or []]
