"""smolagents tool adapter over :class:`chdb_spark.agents.ChDBTool`
(reference chdb/agents/smolagents.py:1-240 — same usage shape)::

    from chdb_spark.smolagents_tools import chdb_smol_tools
    agent = CodeAgent(tools=chdb_smol_tools(spark=spark), model=...)

Requires the ``smolagents`` package (not a dependency of this engine);
importing without it raises the same descriptive ImportError the reference
raises. Every tool forwards through ``ChDBTool.call()`` and returns its
JSON envelope, so the model always reads typed engine errors and can
self-correct.
"""

from __future__ import annotations

import json

try:
    from smolagents import Tool
except ImportError as exc:  # pragma: no cover — exercised only without smolagents
    raise ImportError(
        "The 'smolagents' package is required for chdb_spark.smolagents_tools. "
        "Install it with: pip install smolagents"
    ) from exc

from chdb_spark.agents import _DESCRIPTORS, ChDBTool


def _inputs_for(name: str) -> dict:
    inputs = {}
    for pname, spec in _DESCRIPTORS[name].get("args", {}).items():
        entry = {
            "type": spec.get("type", "string"),
            "description": spec.get("description", pname),
        }
        if not spec.get("required", True):
            entry["nullable"] = True
        inputs[pname] = entry
    return inputs


def _make_tool(chdb_tool: ChDBTool, name: str):
    class _ChDBSmolTool(Tool):
        def forward(self, **kwargs):  # noqa: D102 — smolagents contract
            return json.dumps(chdb_tool.call(name, kwargs), default=str)

    _ChDBSmolTool.name = name
    _ChDBSmolTool.description = _DESCRIPTORS[name]["description"]
    _ChDBSmolTool.inputs = _inputs_for(name)
    _ChDBSmolTool.output_type = "string"
    return _ChDBSmolTool()


def chdb_smol_tools(spark=None, **tool_kwargs) -> list:
    """One smolagents Tool per canonical ChDBTool method (read surface)."""
    tool = ChDBTool(spark, **tool_kwargs)
    names = [n for n in _DESCRIPTORS if n != "attach_file" or not tool.read_only]
    return [_make_tool(tool, n) for n in names]
