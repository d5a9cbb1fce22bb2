"""Function registry — single source of truth for the engine's function surface.

Mirrors the reference's registry design (datastore/function_registry.py:38-80:
types SCALAR/AGGREGATE/WINDOW/TABLE, 15 categories) but each entry here is a
thin Python callable producing a pyspark ``Column`` — evaluated JVM-side
inside whole-stage codegen, never a Python UDF unless explicitly marked.

Usage:
    from chdb_spark.functions import registry
    col = registry.get("editDistance")(F.col("a"), F.col("b"))
    registry.coverage()  # {'STRING': 58, ...}
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class FunctionDef:
    name: str
    category: str
    func: Callable
    kind: str = "SCALAR"  # SCALAR | AGGREGATE | WINDOW | TABLE
    is_udf: bool = False  # True → crosses into Python (slow path), avoid in hot loops
    doc: str = ""


_REGISTRY: dict[str, FunctionDef] = {}


def register(name: str, category: str, kind: str = "SCALAR", is_udf: bool = False, doc: str = ""):
    """Decorator registering a function under its reference (ClickHouse) name."""

    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = FunctionDef(name, category, fn, kind, is_udf, doc or (fn.__doc__ or ""))
        return fn

    return deco


def register_many(category: str, mapping: dict[str, Callable], kind: str = "SCALAR") -> None:
    """Bulk-register direct aliases (reference name → Column-producing callable)."""
    for name, fn in mapping.items():
        _REGISTRY[name] = FunctionDef(name, category, fn, kind)


def get(name: str) -> Callable:
    return _REGISTRY[name].func


def has(name: str) -> bool:
    return name in _REGISTRY


def all_functions() -> dict[str, FunctionDef]:
    return dict(_REGISTRY)


def coverage() -> dict[str, int]:
    out: dict[str, int] = {}
    for d in _REGISTRY.values():
        out[d.category] = out.get(d.category, 0) + 1
    return out
