"""DataStore exception hierarchy — name-compatible with the reference's
``datastore.exceptions`` (exceptions.py:21-120) so drop-in ``except
datastore.QueryError`` handlers keep working. Spark raises its own typed
errors (AnalysisException etc.); these classes exist for the reference's
import surface and for errors this layer raises itself."""

from __future__ import annotations


class DataStoreError(Exception):
    """Base class for DataStore errors."""


class ConnectionError(DataStoreError):  # noqa: A001 (reference name)
    pass


class SchemaError(DataStoreError):
    pass


class QueryError(DataStoreError):
    pass


class ExecutionError(DataStoreError):
    pass


class ValidationError(DataStoreError):
    pass


class UnsupportedOperationError(DataStoreError):
    pass


class ImmutableError(DataStoreError, ValueError):
    pass


class ColumnNotFoundError(DataStoreError):
    pass
