"""Pure-Python Apache Hudi Copy-on-Write snapshot reader — no
hudi-spark-bundle required.

Hudi's table layout is a public spec (hudi.apache.org/docs — storage
layout + timeline): a CoW table is partition directories of parquet
"base files" named ``<fileId>_<writeToken>_<instantTime>.parquet`` plus
a ``.hoodie/`` timeline directory whose COMPLETED instants are files
like ``<instant>.commit`` / ``<instant>.replacecommit`` (requested /
inflight states carry extra suffixes). Snapshot resolution for CoW is
file-slice selection: within each file group — (partition, fileId) —
the live file is the one with the LARGEST instantTime among completed
instants; uncommitted (inflight) writes are invisible.

``replacecommit`` instants (clustering / insert_overwrite) retire whole
file groups: their JSON metadata's ``partitionToReplaceFileIds`` map
names the replaced groups, which this reader excludes exactly as the
spec describes.

Honesty guards: Merge-on-Read tables (``.log.`` delta files present, or
``hoodie.table.type=MERGE_ON_READ`` in hoodie.properties) raise — a
base-file-only read of a MoR table silently drops updates. Unknown
timeline actions are ignored only when they cannot affect base-file
visibility (clean/rollback markers are metadata-only for CoW reads...
rollback REMOVES files physically, so post-rollback file listings are
already correct).

Hudi base files CONTAIN every column (including partition columns and
the ``_hoodie_*`` meta fields), so the read is a plain distributed
parquet scan over the selected files — the driver only resolves the
(metadata-sized) timeline + file listing, the same split the real Hudi
client makes.

Reference surface: the chdb reference reaches Hudi through its table
function (reference table_functions.py:956); this module is the
jar-free engine for that row — `read_auto(fmt="hudi")` uses the real
bundle when the classpath has it and falls back here.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: completed timeline instants: "<ts>.commit", "<ts>.replacecommit",
#: and the 1.x completion-time form "<ts>_<completion>.commit"
_COMPLETED_RE = re.compile(r"^(\d+)(?:_\d+)?\.(commit|replacecommit)$")
#: base file: <fileId>_<writeToken>_<instantTime>[.<extra>].parquet
_BASE_FILE_RE = re.compile(r"^(.+?)_([0-9-]+)_(\d+)[^/]*\.parquet$")


def _hoodie_dir(path: str) -> str:
    d = os.path.join(path, ".hoodie")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"not a Hudi table (no .hoodie directory): {path}"
        )
    return d


def _table_type(hoodie: str) -> str:
    props = os.path.join(hoodie, "hoodie.properties")
    if os.path.isfile(props):
        with open(props) as f:
            for line in f:
                line = line.strip()
                if line.startswith("hoodie.table.type"):
                    return line.split("=", 1)[1].strip()
    return "COPY_ON_WRITE"


def _timeline(hoodie: str) -> tuple[set[str], list[str]]:
    """(completed instant timestamps, completed replacecommit meta paths).
    1.x keeps completed instants under .hoodie/timeline/ — both layouts
    are scanned."""
    completed: set[str] = set()
    replace_metas: list[str] = []
    dirs = [hoodie, os.path.join(hoodie, "timeline")]
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            m = _COMPLETED_RE.match(name)
            if m:
                completed.add(m.group(1))
                if m.group(2) == "replacecommit":
                    replace_metas.append(os.path.join(d, name))
    return completed, replace_metas


def _replaced_file_ids(replace_metas: list[str]) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for p in replace_metas:
        try:
            with open(p) as f:
                meta = json.load(f)
        except (ValueError, OSError):
            continue  # empty completion marker — nothing replaced
        for part, ids in (meta.get("partitionToReplaceFileIds") or {}).items():
            out.setdefault(part, set()).update(ids)
    return out


def read_hudi_py(
    spark: SparkSession,
    path: str,
    drop_meta: bool = False,
    **_: Any,
) -> DataFrame:
    """Snapshot-read a local Hudi Copy-on-Write table by file-slice
    resolution (see module docstring). ``drop_meta=True`` strips the
    five ``_hoodie_*`` meta columns."""
    path = os.path.abspath(path)  # Spark scans resolve against JVM cwd
    hoodie = _hoodie_dir(path)
    ttype = _table_type(hoodie)
    if ttype.upper() != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"hudi table type {ttype}: only COPY_ON_WRITE is supported "
            "by the pure-Python reader (MoR log merging needs the "
            "hudi-spark bundle)"
        )
    completed, replace_metas = _timeline(hoodie)
    replaced = _replaced_file_ids(replace_metas)

    # file-slice selection: newest COMPLETED base file per (partition
    # dir, fileId); any .log. delta file means MoR data — refuse
    best: dict[tuple[str, str], tuple[str, str]] = {}
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        rel = os.path.relpath(root, path)
        rel = "" if rel == "." else rel.replace(os.sep, "/")
        for name in files:
            if ".log." in name:
                raise NotImplementedError(
                    "hudi log (delta) files present — Merge-on-Read "
                    "tables need the hudi-spark bundle"
                )
            m = _BASE_FILE_RE.match(name)
            if not m:
                continue
            file_id, _token, instant = m.groups()
            if instant not in completed:
                continue  # uncommitted write — invisible
            if file_id in replaced.get(rel, set()):
                continue  # file group retired by a replacecommit
            key = (rel, file_id)
            if key not in best or instant > best[key][0]:
                best[key] = (instant, os.path.join(root, name))
    if not best:
        raise FileNotFoundError(
            f"no committed Hudi base files under {path}"
        )
    files = sorted(p for _instant, p in best.values())
    df = spark.read.parquet(*files)
    if drop_meta:
        meta_cols = [c for c in df.columns if c.startswith("_hoodie_")]
        if meta_cols:
            df = df.drop(*meta_cols)
    return df
