"""Shared fixtures: one tuned local SparkSession per test run, a DuckDB
oracle connection per scale factor, and the differential-compare helper
that mirrors the driver's correctness gate (row-count + schema-width +
order-insensitive value hash)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from chdb_spark.session import get_spark

    s = get_spark(app_name="chdb_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_CORRECT, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell so Spark and DuckDB results hash identically."""
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            # Keep the float-ness VISIBLE ("5.0", not "5"): the driver's
            # canonicalizer distinguishes int 5 from float 5.0 (that is how
            # the r5/r6 HUGEINT-oracle reds slipped past a local-green
            # harness — VERDICT r6 What's-wrong #1), so the local signature
            # must be at least as strict.
            return f"{v:.1f}"
        return f"{v:.6g}"
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return _norm_cell(f)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def rows_signature(colnames, rows):
    """Order-insensitive multiset signature with columns sorted by name —
    the same comparison shape the driver applies."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted(colnames), lines


_DRIVER_HOSTILE_TYPES = ("HUGEINT", "UHUGEINT")


def assert_oracle_output_driver_safe(oracle, qdef):
    """Reject oracle output dtypes the driver canonicalizes asymmetrically.

    DuckDB integer sum()/count_if() return HUGEINT, which pandas folds to
    float64 — the driver then hashes "714264285.0" against Spark's bigint
    "714264285" and the row goes red even though every value is equal
    (VERDICT r6 What's-wrong #1: ch3/se1/g2/m5). Enforce `CAST(... AS
    BIGINT)` at the harness level instead of by audit. Raw LIST/STRUCT/MAP
    outputs are rejected for the same reason (the g3 canonicalizer crash,
    fixed by commit 340ee83's stringify-or-explode rule)."""
    desc = oracle.execute(f"DESCRIBE {qdef.oracle}").fetchall()
    for col, dtype, *_ in desc:
        up = str(dtype).upper()
        if any(t in up for t in _DRIVER_HOSTILE_TYPES):
            raise AssertionError(
                f"{qdef.name}: oracle column {col!r} is {dtype} — DuckDB folds "
                f"it to float64 under the driver's pandas canonicalizer; wrap "
                f"the aggregate in CAST(... AS BIGINT)"
            )
        if up.endswith("[]") or up.startswith(("STRUCT", "MAP", "UNION")):
            raise AssertionError(
                f"{qdef.name}: oracle column {col!r} is nested ({dtype}) — "
                f"driver-hash-unfriendly; stringify or explode it (g3 rule)"
            )


def assert_query_matches_oracle(spark, oracle, qdef, sf_dir=SF_CORRECT):
    assert_oracle_output_driver_safe(oracle, qdef)
    sdf = qdef.spark(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    ores = oracle.execute(qdef.oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), (
        f"{qdef.name}: column names differ spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{qdef.name}: row count differs spark={len(srows)} oracle={len(orows)}"
    )
    _, ssig = rows_signature(scols, srows)
    _, osig = rows_signature(ocols, orows)
    if ssig != osig:
        diffs = [(a, b) for a, b in zip(ssig, osig) if a != b][:5]
        raise AssertionError(f"{qdef.name}: value mismatch, first diffs: {diffs}")
