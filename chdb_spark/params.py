"""Parameterized queries — ClickHouse ``{name:Type}`` placeholder binding.

Reference: ``chdb.query(sql, params={...})`` forwards named params to the
engine, which substitutes ``{key:Type}`` placeholders server-side
(reference chdb/__init__.py:145-217, ``params`` argument). Spark SQL has no
server-side named-parameter channel with CH's syntax, so binding happens
here: each placeholder is replaced by a *typed SQL literal* rendered from
the Python value — with strict escaping, so values can never break out of
their literal (the injection-safety property the reference gets from
server-side binding).

Purely driver-side string work on the query text — nothing at data scale.
"""

from __future__ import annotations

import re
from datetime import date, datetime
from decimal import Decimal
from typing import Any, Mapping

_PLACEHOLDER = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\s*:\s*([A-Za-z0-9_() ,'\"]+?)\}")

_INT_TYPES = {
    "int8", "int16", "int32", "int64", "int128", "int256",
    "uint8", "uint16", "uint32", "uint64", "uint128", "uint256",
}
_FLOAT_TYPES = {"float32", "float64"}

_IDENT_OK = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _escape_string(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _render(value: Any, ch_type: str) -> str:
    """Render one Python value as a SQL literal of the declared CH type."""
    t = ch_type.strip()
    tl = t.lower()

    if tl.startswith("nullable(") and tl.endswith(")"):
        if value is None:
            return "NULL"
        return _render(value, t[9:-1])
    if value is None:
        return "NULL"

    if tl.startswith("array(") and tl.endswith(")"):
        inner = t[6:-1]
        if not isinstance(value, (list, tuple)):
            raise TypeError(f"Array param expects list/tuple, got {type(value).__name__}")
        return "array(" + ", ".join(_render(v, inner) for v in value) + ")"

    if tl == "identifier":
        # table/column names: no literal quoting exists — validate strictly
        parts = str(value).split(".")
        if not all(_IDENT_OK.match(p) for p in parts):
            raise ValueError(f"invalid identifier parameter: {value!r}")
        return ".".join(f"`{p}`" for p in parts)

    if tl in _INT_TYPES:
        return str(int(value))
    if tl.startswith("decimal"):
        # Validate through decimal.Decimal so a non-numeric string can never
        # splice raw text into the query (same guarantee as the int/float
        # paths); Decimal keeps full precision where float would round.
        d = Decimal(str(value))  # raises InvalidOperation on junk
        if not d.is_finite():
            raise ValueError(f"non-finite Decimal parameter: {value!r}")
        return str(d)
    if tl in _FLOAT_TYPES:
        return repr(float(value))
    if tl in ("bool", "boolean"):
        truthy = value in (True, 1, "1", "true", "True")
        return "true" if truthy else "false"
    if tl in ("date", "date32"):
        if isinstance(value, (date, datetime)):
            value = value.strftime("%Y-%m-%d")
        return f"DATE {_escape_string(str(value))}"
    if tl.startswith("datetime"):
        if isinstance(value, datetime):
            value = value.strftime("%Y-%m-%d %H:%M:%S.%f") if value.microsecond else value.strftime("%Y-%m-%d %H:%M:%S")
        return f"TIMESTAMP {_escape_string(str(value))}"
    if tl in ("string", "fixedstring") or tl.startswith("fixedstring"):
        return _escape_string(str(value))
    if tl in ("uuid",):
        return _escape_string(str(value))
    # unknown type name: safest is string-literal rendering for strings,
    # plain numeric rendering for numbers
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return str(value)
    return _escape_string(str(value))


def bind_params(sql: str, params: Mapping[str, Any] | None) -> str:
    """Substitute every ``{key:Type}`` placeholder in ``sql``.

    >>> bind_params("SELECT {n:UInt32} + 1 AS x", {"n": 41})
    'SELECT 41 + 1 AS x'

    Raises ``KeyError`` for placeholders with no matching param. Unused
    params are ignored (reference behavior: the engine only resolves the
    placeholders present in the text).
    """
    if not params:
        if _PLACEHOLDER.search(sql or ""):
            missing = sorted({m.group(1) for m in _PLACEHOLDER.finditer(sql)})
            raise KeyError(f"query has unbound parameters: {missing}")
        return sql

    def repl(m: re.Match) -> str:
        name, ch_type = m.group(1), m.group(2)
        if name not in params:
            raise KeyError(f"missing query parameter: {name!r}")
        return _render(params[name], ch_type)

    return _PLACEHOLDER.sub(repl, sql)
