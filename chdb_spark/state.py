"""``chdb.state`` analogue — the stateful-connection module the reference
re-exports ``connect`` from (reference chdb/__init__.py:237
``from .state import connect``; the upstream module also exposes the
sqlitelike Connection/Cursor types)."""

from __future__ import annotations

from chdb_spark.dbapi import Connection, Cursor
from chdb_spark.dbapi import connect_str as connect

__all__ = ["connect", "Connection", "Cursor"]
