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


# ---------------------------------------------------------------------------
# reference-parity surface (datastore/function_registry.py:212 register
# decorator, function_executor.py:24-1092 engine-preference config)
# ---------------------------------------------------------------------------


def register_function(
    name: str,
    clickhouse_name: str | None = None,
    func_type: str = "SCALAR",
    category: str = "OTHER",
    aliases: list[str] | None = None,
    doc: str = "",
    **_ignored,
):
    """Reference-signature registration decorator
    (datastore/function_registry.py:212): registers the builder under
    ``name``, ``clickhouse_name`` and every alias. ``func_type`` accepts
    the reference's enum names (SCALAR/AGGREGATE/WINDOW/TABLE) as strings;
    extra reference-only kwargs (signature/pandas_impl/min_args/...) are
    accepted and ignored — in this engine every builder returns a pyspark
    Column evaluated JVM-side, so there is no second implementation to
    select."""

    def deco(fn: Callable) -> Callable:
        kind = str(func_type).rsplit(".", 1)[-1].upper()
        for n in {name, clickhouse_name, *(aliases or [])} - {None}:
            _REGISTRY[n] = FunctionDef(n, category, fn, kind, False,
                                       doc or (fn.__doc__ or ""))
        return fn

    return deco


class FunctionExecutorConfig:
    """Engine-preference store (reference function_executor.py:24).

    In the reference this chooses chDB-SQL vs pandas execution for
    overlapping functions. In this engine every registered function is a
    JVM Column expression (whole-stage codegen) and the pandas path only
    exists in the DataStore driver-side compat tail — so the config is an
    honest preference LEDGER with the reference's full API; `get_engine`
    reports what was configured, and 'chdb' maps to 'spark' (documented
    divergence, COVERAGE.md)."""

    def __init__(self):
        self.reset()

    def use_chdb(self, *names: str) -> "FunctionExecutorConfig":
        for n in names:
            self._overrides[n] = "spark"
        return self

    use_spark = use_chdb

    def use_pandas(self, *names: str) -> "FunctionExecutorConfig":
        for n in names:
            self._overrides[n] = "pandas"
        return self

    def prefer_chdb(self) -> "FunctionExecutorConfig":
        self._default = "spark"
        return self

    prefer_spark = prefer_chdb

    def prefer_pandas(self) -> "FunctionExecutorConfig":
        self._default = "pandas"
        return self

    def get_engine(self, name: str) -> str:
        return self._overrides.get(name, self._default)

    def reset(self) -> "FunctionExecutorConfig":
        self._overrides: dict[str, str] = {}
        self._default = "spark"
        return self

    def __repr__(self) -> str:
        return (f"FunctionExecutorConfig(default={self._default}, "
                f"custom_mappings={len(self._overrides)})")


#: global instance, like the reference's module-level `function_config`
function_config = FunctionExecutorConfig()


def use_chdb(*names: str) -> FunctionExecutorConfig:
    return function_config.use_chdb(*names)


def use_pandas(*names: str) -> FunctionExecutorConfig:
    return function_config.use_pandas(*names)


def prefer_chdb() -> FunctionExecutorConfig:
    return function_config.prefer_chdb()


def prefer_pandas() -> FunctionExecutorConfig:
    return function_config.prefer_pandas()


def reset_function_config() -> FunctionExecutorConfig:
    return function_config.reset()
