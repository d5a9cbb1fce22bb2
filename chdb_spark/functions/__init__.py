"""chdb_spark.functions — the engine's function surface.

The reference registers 872 functions in 15 categories in a single registry
(datastore/function_registry.py:38-80, function_definitions.py). Here each
entry is a thin callable producing a pyspark ``Column`` (JVM-side,
whole-stage-codegen'd); Python UDFs are the marked exception.

Usage:
    from chdb_spark import functions as CF
    CF.fn("editDistance")(F.col("a"), F.col("b"))
    CF.coverage()          # {'STRING': 58, ...}

Importing this package loads every category module so the registry is fully
populated.
"""

from __future__ import annotations

from chdb_spark.functions.registry import (
    FunctionDef,
    all_functions,
    coverage,
    get as fn,
    has,
    register,
    register_many,
)

# Populate the registry (import order is unimportant; each module only adds).
from chdb_spark.functions import scalar as _scalar  # noqa: F401  STRING/DATETIME/MATH/CONDITIONAL/TYPE
from chdb_spark.functions import collection as _collection  # noqa: F401  ARRAY/MAP/TUPLE/JSON
from chdb_spark.functions import digest as _digest  # noqa: F401  HASH/URL/IP/UUID/ENCODING
from chdb_spark.functions import vector as _vector  # noqa: F401  GEO/vector math
from chdb_spark.functions import aggregate as _aggregate  # noqa: F401  AGGREGATE/WINDOW
from chdb_spark.functions import scalar_ext as _scalar_ext  # noqa: F401  batch-2 widening
from chdb_spark.functions import scalar_ext2 as _scalar_ext2  # noqa: F401  batch-3 scalar surface
from chdb_spark.functions import collection_ext as _collection_ext  # noqa: F401  batch-3 collections
from chdb_spark.functions import aggregate_ext as _aggregate_ext  # noqa: F401  batch-3 aggregates

__all__ = [
    "FunctionDef",
    "all_functions",
    "coverage",
    "fn",
    "has",
    "register",
    "register_many",
]
