"""Engine-selection config shim — reference ``datastore.config``
(api-reference.md:276-284: use_chdb / use_pandas / prefer_chdb /
prefer_pandas / enable_debug / enable_profiling).

The reference is dual-engine (SQL engine + pandas fallback) and these
toggles pick sides. This engine has ONE execution path — Catalyst — so the
selection toggles are accepted no-ops that record the requested mode (for
introspection and drop-in script compatibility); ``enable_debug`` is real:
it turns on plan printing for DataStore triggers.
"""

from __future__ import annotations

#: last requested mode — purely informational in a single-engine build
engine_mode: str = "auto"
debug: bool = False
profiling: bool = False


def use_chdb() -> None:
    """Force the SQL engine (no-op: Catalyst is the only engine here)."""
    global engine_mode
    engine_mode = "sql"


def use_pandas() -> None:
    """Force pandas execution (no-op: pandas is interop, not an engine here)."""
    global engine_mode
    engine_mode = "pandas"


def prefer_chdb() -> None:
    global engine_mode
    engine_mode = "prefer_sql"


def prefer_pandas() -> None:
    global engine_mode
    engine_mode = "prefer_pandas"


def enable_debug() -> None:
    """Verbose mode: DataStore triggers print the analyzed plan (the
    engine's analogue of the reference's show-generated-SQL debug)."""
    global debug
    debug = True


def disable_debug() -> None:
    global debug
    debug = False


def enable_profiling() -> None:
    global profiling
    profiling = True


def disable_profiling() -> None:
    global profiling
    profiling = False


def is_profiling_enabled() -> bool:
    return profiling


def get_profiler() -> "Profiler":
    """The module profiler (reference docs/PROFILING.md:28-33:
    ``get_profiler().report()``). Backed by chdb_spark.utils.trace —
    every ``session.query`` records (sql, elapsed, rows) while enabled."""
    return _PROFILER


class Profiler:
    """Aggregates the trace events into the reference's report shape."""

    def records(self) -> list[dict]:
        from chdb_spark.utils import trace

        return trace.get_trace()

    def report(self) -> str:
        rows = self.records()
        total = sum(r["elapsed"] for r in rows)
        lines = [f"{len(rows)} queries, {total:.4f}s total"]
        for r in rows:
            lines.append(f"  {r['elapsed']:.4f}s  rows={r['rows']}  {r['sql'][:70]}")
        out = "\n".join(lines)
        print(out)
        return out

    def reset(self) -> None:
        from chdb_spark.utils import trace

        was = trace.enabled
        trace.enable_trace()  # clears the buffer
        trace.enabled = was


_PROFILER = Profiler()


# -- compatibility mode (reference config.py CompatMode family) -------------

#: 'performance' (engine-native semantics) vs 'pandas' (match pandas quirks)
_compat_mode: str = "performance"


class CompatMode:
    PERFORMANCE = "performance"
    PANDAS = "pandas"


def set_compat_mode(mode: str) -> None:
    global _compat_mode
    if mode not in (CompatMode.PERFORMANCE, CompatMode.PANDAS):
        raise ValueError(f"unknown compat mode: {mode!r}")
    _compat_mode = mode


def get_compat_mode() -> str:
    return _compat_mode


def is_performance_mode() -> bool:
    return _compat_mode == CompatMode.PERFORMANCE


def use_performance_mode() -> None:
    set_compat_mode(CompatMode.PERFORMANCE)


def use_pandas_compat() -> None:
    set_compat_mode(CompatMode.PANDAS)


# -- logging shims (reference config.py set_log_level/get_logger) -----------


def get_logger():
    import logging

    return logging.getLogger("chdb_spark")


def set_log_level(level) -> None:
    get_logger().setLevel(level)


def set_log_format(fmt: str) -> None:
    import logging

    for h in get_logger().handlers or [logging.StreamHandler()]:
        h.setFormatter(logging.Formatter(fmt))


class _ConfigNamespace:
    """``datastore.config`` object access (reference exposes a module-like
    config singleton alongside the functions)."""

    def __getattr__(self, name):
        import chdb_spark.config as m

        if hasattr(m, name) and name != "config":
            return getattr(m, name)
        raise AttributeError(name)


config = _ConfigNamespace()
