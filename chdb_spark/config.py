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
