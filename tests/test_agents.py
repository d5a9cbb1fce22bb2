"""Agent-tool contract tests (reference chdb/agents CONTRACT.md) — the
canonical methods, read-only enforcement, truncation, param binding,
tool-spec dialects, and error classification."""

from __future__ import annotations

import pandas as pd
import pytest

from chdb_spark.agents import (
    CONTRACT_VERSION,
    ChDBReadOnlyError,
    ChDBSyntaxError,
    ChDBTool,
    ChDBUnknownObjectError,
    InvalidIdentifier,
    capabilities,
    quote_ident,
    quote_string,
    tool_specs,
)
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def tool(spark):
    return ChDBTool(spark, sf_dir=SF_CORRECT)


def test_capabilities_and_contract():
    caps = capabilities()
    assert caps["contract_version"] == CONTRACT_VERSION
    assert "run_select_query" in caps["tools"]
    assert set(caps["dialects"]) == {"anthropic", "openai", "mcp"}


def test_query_rows_and_elapsed(tool):
    res = tool.query("SELECT count(*) AS n FROM lineitem")
    assert res.rows[0][0] > 0
    assert res.column_names == ["n"]
    assert res.elapsed_s is not None and not res.truncated
    assert res.to_dict()["column_names"] == ["n"]


def test_query_truncation(tool):
    res = tool.query("SELECT l_orderkey FROM lineitem", max_rows=10)
    assert len(res.rows) == 10 and res.truncated


def test_query_param_binding(tool):
    res = tool.query(
        "SELECT count(*) AS n FROM orders WHERE o_orderstatus = {st:String}",
        params={"st": "F"},
    )
    assert res.rows[0][0] > 0
    with pytest.raises(ChDBSyntaxError):
        tool.query("SELECT {missing:String} AS x", params={"other": 1})


def test_read_only_enforcement(tool):
    with pytest.raises(ChDBReadOnlyError):
        tool.query("DROP TABLE lineitem")
    with pytest.raises(ChDBReadOnlyError):
        tool.query("INSERT INTO lineitem VALUES (1)")
    with pytest.raises(ChDBReadOnlyError):
        tool.attach_file("x", "/tmp/nope.parquet")


def test_error_classification(tool):
    with pytest.raises(ChDBSyntaxError):
        tool.query("SELEKT 1")
    with pytest.raises(ChDBUnknownObjectError):
        tool.query("SELECT * FROM definitely_not_a_table")


def test_introspection(tool):
    assert "default" in tool.list_databases()
    assert "lineitem" in tool.list_tables()
    cols = tool.describe("lineitem")
    names = [c["name"] for c in cols]
    assert "l_orderkey" in names and "l_quantity" in names
    sample = tool.get_sample_data("region", limit=3)
    assert len(sample.rows) <= 3 and not any(r is None for r in sample.rows)


def test_list_functions_merges_registry(tool):
    fns = tool.list_functions(like="quantile", limit=50)
    assert any("quantile" in f.lower() for f in fns)
    # reference-name surface is present, not just Spark builtins
    assert "quantileExactWeighted" in tool.list_functions(like="quantileExact")


def test_dataframe_query(tool):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    res = tool.dataframe_query("SELECT sum(a) AS s FROM mem_t", {"mem_t": pdf})
    assert res.rows[0][0] == 6


def test_attach_file_writable(spark, tmp_path):
    pd.DataFrame({"v": [1, 2]}).to_parquet(tmp_path / "t.parquet")
    wt = ChDBTool(spark, read_only=False)
    wt.attach_file("attached_t", str(tmp_path / "t.parquet"))
    assert wt.query("SELECT count(*) AS n FROM attached_t").rows[0][0] == 2


def test_tool_specs_dialects():
    a = tool_specs("anthropic")
    assert all("input_schema" in t for t in a)
    o = tool_specs("openai")
    assert all(t["type"] == "function" for t in o)
    m = tool_specs("mcp")
    assert all("inputSchema" in t for t in m)
    with pytest.raises(ValueError):
        tool_specs("grpc")


def test_safety_helpers():
    assert quote_ident("my_table") == "`my_table`"
    assert quote_string("o'hara") == "'o\\'hara'"
    for bad in ("", "a`b", "x; DROP TABLE y", None):
        with pytest.raises(InvalidIdentifier):
            quote_ident(bad)  # type: ignore[arg-type]


def test_smolagents_adapter_import_gate():
    """Without the smolagents package the module raises the reference's
    descriptive ImportError (chdb/agents/smolagents.py contract)."""
    try:
        import smolagents  # noqa: F401

        has = True
    except ImportError:
        has = False
    if has:
        from chdb_spark.smolagents_tools import chdb_smol_tools

        tools = chdb_smol_tools()
        assert any(t.name == "run_select_query" for t in tools)
    else:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="smolagents"):
            import chdb_spark.smolagents_tools  # noqa: F401
