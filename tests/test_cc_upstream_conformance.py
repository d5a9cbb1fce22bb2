"""Vendored clickhouse-connect conformance subset vs ChdbSparkClient.

The reference proves its "drop-in clickhouse-connect backend" claim by
running clickhouse-connect's OWN integration suite against the chDB
backend with a data-driven skip list (reference
scripts/cc_upstream_suite/README.md:1-30, skip_list.txt,
expected_divergences.txt). clickhouse-connect is not installed in this
container, so this file carries a hand-written conformance subset: each
test reproduces the observable behavior of a named upstream integration
case (`upstream:` marker in the docstring) purely from the library's
public API contract — no upstream code is vendored verbatim.

Gating mirrors the reference harness exactly:
* tests/cc_upstream_skip_list.txt — node-name substrings skipped at
  collection (genuine embedded-engine capability gaps, documented);
* tests/cc_upstream_divergences.txt — strict-xfail cases: they run and
  MUST diverge; an xpass is a failure (a divergence silently healed).
"""

from __future__ import annotations

import os

import pytest

from chdb_spark.cc_backend import get_client

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load_list(fname: str) -> list[str]:
    out = []
    with open(os.path.join(_HERE, fname)) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


SKIP_LIST = _load_list("cc_upstream_skip_list.txt")
DIVERGENCES = _load_list("cc_upstream_divergences.txt")


@pytest.fixture(autouse=True)
def _apply_gates(request):
    name = request.node.name
    for frag in SKIP_LIST:
        if frag in name:
            pytest.skip(f"cc_upstream_skip_list.txt: {frag}")
    for frag in DIVERGENCES:
        if frag in name:
            request.node.add_marker(
                pytest.mark.xfail(
                    strict=True, reason=f"cc_upstream_divergences.txt: {frag}"
                )
            )
    yield


@pytest.fixture(scope="module")
def client(spark):
    c = get_client("chdb://memory", spark=spark)
    yield c
    c.close()


# ── test_client.py shapes ──────────────────────────────────────────────


def test_basic_query_result_surface(client):
    """upstream: test_client.py::test_query — result_rows / column_names /
    row_count / first_row / first_item."""
    r = client.query("SELECT number AS n, toString(number) AS s FROM numbers(5)")
    assert r.row_count == 5
    assert r.column_names == ("n", "s")
    assert r.first_row == (0, "0")
    assert r.first_item == 0
    assert [row[0] for row in r.result_rows] == [0, 1, 2, 3, 4]


def test_named_results_dicts(client):
    """upstream: test_client.py::test_named_results — dict-per-row iter."""
    rows = list(client.query("SELECT 1 AS a, 'x' AS b").named_results())
    assert rows == [{"a": 1, "b": "x"}]


def test_result_columns_orientation(client):
    """upstream: test_client.py::test_result_columns — column-major."""
    r = client.query("SELECT number FROM numbers(4)")
    assert r.result_columns == [[0, 1, 2, 3]]


def test_command_scalar_and_ddl(client):
    """upstream: test_client.py::test_command — scalar for SELECT-like,
    empty/OK for DDL."""
    assert client.command("SELECT count() FROM numbers(10)") == 10
    client.command("DROP TABLE IF EXISTS cc_conf_ddl")
    client.command(
        "CREATE TABLE cc_conf_ddl (k Int64, v String) ENGINE = MergeTree ORDER BY k"
    )
    try:
        assert client.command("EXISTS TABLE cc_conf_ddl") in (1, "1", True)
    finally:
        client.command("DROP TABLE IF EXISTS cc_conf_ddl")


def test_ping_and_context_manager(spark):
    """upstream: test_client.py::test_ping + client context manager."""
    with get_client("chdb://memory", spark=spark) as c:
        assert c.ping() is True


def test_query_with_parameters_server_binding(client):
    """upstream: test_parameters.py — {name:Type} server-side binding."""
    r = client.query(
        "SELECT {lo:UInt32} + number AS n FROM numbers(3)",
        parameters={"lo": 10},
    )
    assert [row[0] for row in r.result_rows] == [10, 11, 12]


def test_string_parameter_escaping(client):
    """upstream: test_parameters.py::test_str_param — quoting is the
    binder's job; embedded quotes must survive."""
    r = client.query(
        "SELECT {s:String} AS v", parameters={"s": "it's"}
    )
    assert r.first_item == "it's"


# ── insert / round-trip shapes ────────────────────────────────────────


def test_insert_and_read_back(client):
    """upstream: test_insert.py::test_simple_insert — matrix insert with
    column_names, read back ordered."""
    client.command("DROP TABLE IF EXISTS cc_conf_ins")
    client.command(
        "CREATE TABLE cc_conf_ins (k Int64, v String) ENGINE = MergeTree ORDER BY k"
    )
    try:
        client.insert(
            "cc_conf_ins", [[1, "a"], [2, "b"], [3, "c"]], column_names=["k", "v"]
        )
        r = client.query("SELECT k, v FROM cc_conf_ins ORDER BY k")
        assert r.result_rows == [(1, "a"), (2, "b"), (3, "c")]
    finally:
        client.command("DROP TABLE IF EXISTS cc_conf_ins")


def test_insert_df_column_reorder(client):
    """upstream: test_pandas.py::test_insert_df — frame columns align by
    NAME, not position."""
    import pandas as pd

    client.command("DROP TABLE IF EXISTS cc_conf_insdf")
    client.command(
        "CREATE TABLE cc_conf_insdf (k Int64, v String) ENGINE = MergeTree ORDER BY k"
    )
    try:
        client.insert_df(
            "cc_conf_insdf", pd.DataFrame({"v": ["x", "y"], "k": [7, 8]})
        )
        r = client.query("SELECT k, v FROM cc_conf_insdf ORDER BY k")
        assert r.result_rows == [(7, "x"), (8, "y")]
    finally:
        client.command("DROP TABLE IF EXISTS cc_conf_insdf")


# ── dataframe / arrow / numpy shapes ──────────────────────────────────


def test_query_df_types(client):
    """upstream: test_pandas.py::test_pandas_basic — int/str/float dtypes."""
    df = client.query_df(
        "SELECT number AS n, number / 2 AS h, toString(number) AS s FROM numbers(3)"
    )
    assert list(df.columns) == ["n", "h", "s"]
    assert df["n"].tolist() == [0, 1, 2]
    assert df["h"].tolist() == [0.0, 0.5, 1.0]
    assert df["s"].tolist() == ["0", "1", "2"]


def test_query_arrow_table(client):
    """upstream: test_arrow.py::test_arrow_basic — a pyarrow.Table with
    matching schema and values."""
    import pyarrow as pa

    t = client.query_arrow("SELECT number AS n FROM numbers(4)")
    assert isinstance(t, pa.Table)
    assert t.column_names == ["n"]
    assert t.column("n").to_pylist() == [0, 1, 2, 3]


def test_numpy_values(client):
    """upstream: test_numpy.py::test_numpy_basic — values via query_np."""
    arr = client.query_np("SELECT number AS n FROM numbers(3)")
    assert [int(r[0]) for r in arr] == [0, 1, 2]


def test_numpy_matrix_dtype(client):
    """upstream: test_numpy.py::test_numpy_matrix — per-dtype matrix
    (documented divergence: our query_np goes through pandas .values)."""
    import numpy as np

    arr = client.query_np("SELECT number AS n, toString(number) AS s FROM numbers(2)")
    assert arr.dtype == np.int64  # upstream returns typed columns; ours is object


def test_uint64_full_range(client):
    """upstream: test_client.py::test_uint64 — full-range UInt64
    (documented divergence: UInt64 → signed widening)."""
    r = client.query("SELECT toUInt64(18446744073709551615) AS v")
    assert r.first_item == 18446744073709551615


# ── streaming shapes (NEW r5 surface) ─────────────────────────────────


def test_rows_stream_iterates_and_closes(client):
    """upstream: test_streaming.py::test_row_stream — context-managed row
    iterator; early close stops the source."""
    with client.query_rows_stream("SELECT number FROM numbers(100)") as s:
        got = [r[0] for r in s]
    assert got == list(range(100))
    with client.query_rows_stream("SELECT number FROM numbers(100000)") as s:
        first = next(iter(s))
        assert first[0] == 0
        # context exit = early close; no exhaustion required


def test_row_block_stream_blocks(client):
    """upstream: test_streaming.py::test_row_block_stream — blocks of
    rows, concatenation equals the full result."""
    with client.query_row_block_stream("SELECT number FROM numbers(50)") as s:
        blocks = list(s)
    assert all(isinstance(b, list) for b in blocks)
    flat = [r[0] for b in blocks for r in b]
    assert flat == list(range(50))


def test_column_block_stream_orientation(client):
    """upstream: test_streaming.py::test_column_block_stream — column-major
    blocks."""
    with client.query_column_block_stream(
        "SELECT number AS n, toString(number) AS s FROM numbers(6)"
    ) as s:
        blocks = list(s)
    ns = [v for b in blocks for v in b[0]]
    ss = [v for b in blocks for v in b[1]]
    assert ns == list(range(6))
    assert ss == [str(i) for i in range(6)]


def test_arrow_stream_batches(client):
    """upstream: test_streaming.py::test_arrow_stream — RecordBatch chunks."""
    import pyarrow as pa

    with client.query_arrow_stream("SELECT number AS n FROM numbers(30)") as s:
        batches = list(s)
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    assert sum(b.num_rows for b in batches) == 30


# ── settings / misc shapes ────────────────────────────────────────────


def test_settings_clause_accepted(client):
    """upstream: test_client.py::test_query_settings — SETTINGS in SQL is
    accepted (embedded: accepted and ignored where not applicable)."""
    r = client.query("SELECT number FROM numbers(3) SETTINGS max_threads=2")
    assert r.row_count == 3


def test_raw_query_format_bytes(client):
    """upstream: test_client.py::test_raw_query — raw format output."""
    out = client.raw_query("SELECT 1 AS x", fmt="CSV")
    text = out.decode() if isinstance(out, (bytes, bytearray)) else str(out)
    assert "1" in text


# Skip-listed placeholders: these NAMES document genuine capability gaps;
# the autouse gate skips them before the body runs (reference pattern:
# skip list lives in data, tests stay enumerable).


def test_http_session_id(client):
    raise AssertionError("transport-only: must be skipped by the gate")


def test_external_data(client):
    raise AssertionError("transport-only: must be skipped by the gate")


def test_raw_insert_rowbinary(client):
    raise AssertionError("native-protocol-only: must be skipped by the gate")
