"""Cross-language agent-tool conformance — runs the REFERENCE's own fixture
(reference chdb/agents/conformance/cases.jsonl, 33 cases) against this
binding's ChDBTool, per the runner contract in conformance/README.md.

Engine-specific exclusions are explicit and reasoned (never silent), as the
contract requires for divergences.
"""

from __future__ import annotations

import json
import os

import pytest

from chdb_spark.agents import ChDBTool, ChDBError, error_type

CASES = "/root/reference/chdb/agents/conformance/cases.jsonl"
FIXTURES = "/root/reference/chdb/agents/conformance/fixtures"

#: case id → reason it cannot run on this engine (documented divergence)
SKIP = {
    # getSetting() reads ClickHouse server settings that have no Spark
    # analogue (http_max_tries etc.) — network posture here comes from
    # Hadoop/HTTP client conf, not engine settings.
    "p5_network_baseline_settings": "ClickHouse server-setting introspection",
    # the timeout canary scans numbers(1e11); Spark's range is a lazy
    # iterator that a LIMIT satisfies instantly, so the query *finishes*
    # within 1s instead of hanging — the watchdog path itself is covered
    # by test_watchdog_cancels_runaway_query below with a genuinely slow
    # plan.
    "safety_timeout": "numbers(1e11) is not slow on a lazy range source",
}


def _load_cases():
    if not os.path.exists(CASES):
        return []
    out = []
    for line in open(CASES):
        d = json.loads(line)
        if "id" in d:
            d["_sql_sub"] = True
            out.append(d)
    return out


_CASES = _load_cases()


def _sub(v):
    if isinstance(v, str):
        return v.replace("{{fixtures}}", FIXTURES)
    if isinstance(v, dict):
        return {k: _sub(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_sub(x) for x in v]
    return v


@pytest.fixture(scope="module")
def shared_tool(spark):
    return ChDBTool(spark)


def _build_tool(spark, cfg: dict) -> ChDBTool:
    kw = {}
    if "max_execution_time" in cfg:
        kw["max_execution_time"] = cfg["max_execution_time"]
    if "file_allowlist" in cfg:
        kw["file_allowlist"] = cfg["file_allowlist"]
    if "attachments" in cfg:
        kw["attachments"] = cfg["attachments"]
    if "read_only" in cfg:
        kw["read_only"] = cfg["read_only"]
    if "max_bytes" in cfg:
        kw["max_bytes"] = cfg["max_bytes"]
    if "max_rows" in cfg:
        kw["max_rows"] = cfg["max_rows"]
    if "network_timeout" in cfg:
        kw["network_timeout"] = cfg["network_timeout"]
    return ChDBTool(spark, **kw)


def _rows_as_dicts(res) -> list[dict]:
    return [dict(zip(res.column_names, r)) for r in res.rows]


@pytest.mark.parametrize("case", _CASES, ids=[c["id"] for c in _CASES])
def test_conformance_case(spark, shared_tool, case):
    if case["id"] in SKIP:
        pytest.skip(SKIP[case["id"]])
    args = _sub(case.get("args", {}))
    expect = case["expect"]
    tool = (
        _build_tool(spark, _sub(case["tool"])) if case.get("tool") else shared_tool
    )
    method = case["method"]

    def run():
        if method == "query":
            return tool.query(args["sql"], params=args.get("params"),
                              max_rows=args.get("max_rows"))
        if method == "call":
            return tool.call(args["name"], args.get("arguments"))
        if method == "dataframe_query":
            return tool.dataframe_query(args["sql"], args["dataframes"])
        return getattr(tool, method)(**args)

    if "error_type" in expect and method != "call":
        with pytest.raises(ChDBError) as ei:
            run()
        assert error_type(ei.value) == expect["error_type"], str(ei.value)
        return

    out = run()

    if method == "call":
        assert out["ok"] is expect.get("envelope_ok", True), out
        if not out["ok"] and "error_type" in expect:
            assert out["error"]["type"] == expect["error_type"], out
        if expect.get("result_has_hint"):
            assert out["result"].get("hint"), out
        if expect.get("error_has_hint"):
            assert out["error"].get("hint"), out
        return
    if "rows" in expect:
        assert _rows_as_dicts(out) == expect["rows"], _rows_as_dicts(out)
    if "truncated" in expect:
        assert out.truncated is expect["truncated"], out.to_dict()
    if "row_count" in expect:
        n = len(out.rows) if hasattr(out, "rows") else len(out)
        assert n == expect["row_count"], n
    if "contains_all" in expect:
        assert set(expect["contains_all"]) <= set(out), out
    if "min_len" in expect:
        assert len(out) >= expect["min_len"], len(out)
    if "describe_column" in expect:
        assert any(c["name"] == expect["describe_column"] for c in out), out


def test_watchdog_cancels_runaway_query(spark):
    """The P5 watchdog canary, with a plan that is genuinely slow on this
    engine (a heavy self-join), instead of the fixture's numbers(1e11)."""
    from chdb_spark.agents import ChDBTimeoutError

    tool = ChDBTool(spark, max_execution_time=2)
    big = spark.range(2_000_000).selectExpr("id", "id % 1000 AS k")
    big.createOrReplaceTempView("wd_big")
    import time as _t

    t0 = _t.perf_counter()
    with pytest.raises(ChDBTimeoutError):
        tool.query(
            "SELECT count(*) AS n FROM wd_big a JOIN wd_big b ON a.k = b.k"
        )
    assert _t.perf_counter() - t0 < 30  # cancelled, not run to completion
