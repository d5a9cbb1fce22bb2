"""chdb.utils analogue — the docs/utils.rst examples run verbatim
(flatten_dict / convert_to_columnar / infer_data_type(s) / types / trace),
plus the query-result metrics surface (docs/utils.rst:252-262)."""

from __future__ import annotations

from datetime import date, datetime

from chdb_spark.utils import (
    convert_to_columnar,
    flatten_dict,
    infer_data_type,
    infer_data_types,
    trace,
    types,
)


def test_flatten_dict_docs_example():
    nested = {
        "user": {
            "profile": {"name": "Alice", "age": 30},
            "preferences": {"theme": "dark", "language": "en"},
        },
        "account": {"status": "active"},
    }
    assert flatten_dict(nested) == {
        "user.profile.name": "Alice",
        "user.profile.age": 30,
        "user.preferences.theme": "dark",
        "user.preferences.language": "en",
        "account.status": "active",
    }


def test_flatten_dict_list_of_dicts_per_index():
    assert flatten_dict({"a": [{"x": 1}, {"x": 2}], "b": [1, 2]}) == {
        "a.0.x": 1,
        "a.1.x": 2,
        "b": [1, 2],
    }


def test_convert_to_columnar_docs_example():
    rows = [
        {"name": "Alice", "age": 30, "city": "NYC"},
        {"name": "Bob", "age": 25, "city": "LA"},
        {"name": "Charlie", "age": 35, "city": "Chicago"},
    ]
    assert convert_to_columnar(rows) == {
        "name": ["Alice", "Bob", "Charlie"],
        "age": [30, 25, 35],
        "city": ["NYC", "LA", "Chicago"],
    }
    assert convert_to_columnar([]) == {}
    # ragged rows pad with None
    assert convert_to_columnar([{"a": 1}, {"b": 2}]) == {"a": [1, None], "b": [None, 2]}


def test_infer_data_type_docs_examples():
    assert infer_data_type([1, 2, 3, 4, 5]) == "UInt64"
    assert infer_data_type(["hello", "world", "test"]) == "String"
    assert infer_data_type([1.5, 2.7, 3.14]) == "Float64"
    assert infer_data_type([True, False]) == "Bool"
    assert infer_data_type([-1, 2]) == "Int64"
    assert infer_data_type([1, 2.5]) == "Float64"
    assert infer_data_type([None]) == "String"
    assert infer_data_type([date(2024, 1, 1)]) == "Date"
    assert infer_data_type([datetime(2024, 1, 1, 2)]) == "DateTime"
    assert infer_data_types(
        {"id": [1, 2, 3], "name": ["Alice"], "score": [85.5], "active": [True]}
    ) == {"id": "UInt64", "name": "String", "score": "Float64", "active": "Bool"}


def test_types_mapping_docs_examples():
    assert types.python_to_clickhouse(int) == "Int64"
    assert types.python_to_clickhouse(str) == "String"
    assert types.python_to_clickhouse(float) == "Float64"
    assert types.clickhouse_to_python("String") is str
    assert types.clickhouse_to_python("UInt32") is int
    assert types.clickhouse_to_python("Float64") is float
    assert types.clickhouse_to_python("Nullable(String)") is str
    assert types.clickhouse_to_python("Array(String)") is list
    assert types.clickhouse_to_python("Tuple(String, UInt64)") is tuple
    assert types.clickhouse_to_python("DateTime") is datetime
    assert types.clickhouse_to_python("Date") is date
    assert types.clickhouse_to_python("UUID") is str
    import decimal

    assert types.clickhouse_to_python("Decimal(10,2)") is decimal.Decimal
    import pytest as _pytest

    with _pytest.raises(ValueError):
        types.clickhouse_to_python("NotAType")


def test_trace_and_result_metrics(spark):
    import chdb_spark as chdb

    trace.enable_trace()
    try:
        res = chdb.query("SELECT number FROM numbers(5)")
        assert str(res) == "0\n1\n2\n3\n4\n"
        assert res.rows_read() == 5
        assert res.bytes_read() == len(str(res).encode())
        assert res.elapsed() >= 0
        assert not res.has_error() and res.error_message() == ""
        assert res.bytes() == str(res).encode()
        events = trace.get_trace()
        assert len(events) == 1 and "numbers(5)" in events[0]["sql"]
        assert events[0]["rows"] == 5
    finally:
        trace.disable_trace()
    # disabled: no recording
    chdb.query("SELECT 1")
    assert len(trace.get_trace()) == 1


def test_coverage_doc_query_names_exist():
    """Docs-integrity pin: every query name COVERAGE.md cites must be a
    registered query — stale rows (renamed/removed queries) fail here
    instead of silently misleading the reader."""
    import os
    import re

    from chdb_spark.queries import all_queries

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "COVERAGE.md")).read()
    cited = set(re.findall(r"`([a-z]{1,4}\d+_[a-z0-9_]+)`", text))
    known = set(all_queries())
    stale = sorted(c for c in cited if c not in known)
    assert stale == [], f"COVERAGE.md cites unknown queries: {stale}"
    # and the doc should cite a meaningful share of what exists (family
    # ranges like q2-q22 are cited as ranges, not per-name)
    assert len(cited & known) > 60


def test_driver_check_history_tolerates_non_dict_payload():
    """A CORRECTNESS_r*.json whose top level is a list/scalar is skipped,
    not crashed on — the documented 'tolerant' contract (ADVICE r7:
    rows.items() ran outside the try block)."""
    import json
    import os

    from chdb_spark.queries import _driver_check_history

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bogus = os.path.join(root, "CORRECTNESS_r0.json")
    assert not os.path.exists(bogus)
    try:
        with open(bogus, "w") as f:
            json.dump(["not", "a", "dict"], f)
        hist = _driver_check_history()  # must not raise
        assert isinstance(hist, dict) and "not" not in hist
    finally:
        os.remove(bogus)


def test_scratch_complete_requires_success_marker(tmp_path):
    """Reuse guard: a directory WITHOUT Spark's _SUCCESS commit marker is
    a partial (crashed) write and must be rewritten, not reused."""
    from chdb_spark.operators import scratch_complete

    d = tmp_path / "partial"
    d.mkdir()
    (d / "part-00000.parquet").write_bytes(b"truncated")
    assert not scratch_complete(str(d))
    (d / "_SUCCESS").write_bytes(b"")
    assert scratch_complete(str(d))


def test_read_table_key_tolerates_sessions_without_spark_context():
    """Under Spark Connect, touching sparkContext raises a non-OSError
    PySpark exception; the cache key resolver must fall through to
    'uncached' instead of crashing read_table (ADVICE r7)."""
    from chdb_spark.session import _read_table_key

    class _ConnectLike:
        @property
        def sparkContext(self):
            raise RuntimeError("sparkContext is not available in Spark Connect")

    assert _read_table_key(_ConnectLike(), "/etc/hostname") is None


def test_path_fingerprint_sees_nested_rewrites(tmp_path):
    """A rewrite INSIDE a partition subdirectory must change the
    fingerprint even though the top-level directory's own stat is
    unchanged (ADVICE r7: stale cached file listings)."""
    import os

    from chdb_spark.session import _path_fingerprint

    root = tmp_path / "tbl"
    part = root / "p=1"
    part.mkdir(parents=True)
    f = part / "part-0.parquet"
    f.write_bytes(b"v1")
    fp1 = _path_fingerprint(str(root))
    # rewrite the nested file with different size; freeze ancestor dirs'
    # stats so only the recursive walk can notice
    st_root, st_part = os.stat(root), os.stat(part)
    f.write_bytes(b"v2-longer")
    os.utime(root, ns=(st_root.st_atime_ns, st_root.st_mtime_ns))
    os.utime(part, ns=(st_part.st_atime_ns, st_part.st_mtime_ns))
    fp2 = _path_fingerprint(str(root))
    assert fp1 != fp2
    # regular file: (1, size, mtime_ns)
    single = _path_fingerprint(str(f))
    assert single[0] == 1 and single[1] == len(b"v2-longer")
