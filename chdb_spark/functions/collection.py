"""ARRAY / MAP / TUPLE / JSON functions.

Reference inventory: datastore/function_definitions.py — ARRAY 98
(:3120-3739,6407-6847,13006-13132), map fns (:8310-8450), tuple fns
(:8469-8539), JSON 43 (:3896-4324,13151).

All are Column compositions over ArrayType/MapType/StructType — Spark's
higher-order functions (transform/filter/aggregate/zip_with) cover the
reference's arrayMap/arrayFilter/arrayReduce/arrayZip lambda family natively.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chdb_spark.functions.registry import register, register_many

# --- ARRAY (reference :3120-3739) ---

register_many(
    "ARRAY",
    {
        "array": F.array,
        "arrayJoin": F.explode,  # CH arrayJoin == row-expanding explode (:3136)
        "has": F.array_contains,
        "indexOf": lambda arr, v: F.array_position(arr, v).cast("long"),
        "arrayDistinct": F.array_distinct,
        "arraySort": F.array_sort,
        "arrayReverseSort": lambda arr: F.reverse(F.array_sort(arr)),
        "arrayReverse": F.reverse,
        "arraySlice": F.slice,
        "arrayConcat": F.concat,
        "arrayFlatten": F.flatten,
        "arrayCompact": F.array_compact,
        "arrayUniq": lambda arr: F.size(F.array_distinct(arr)).cast("long"),
        "length": F.size,
        "arrayPushBack": lambda arr, v: F.concat(arr, F.array(F.lit(v))),
        "arrayPushFront": lambda arr, v: F.concat(F.array(F.lit(v)), arr),
        "arrayPopBack": lambda arr: F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        "arrayPopFront": lambda arr: F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        "arrayResize": lambda arr, n, pad=None: F.when(
            F.size(arr) >= n, F.slice(arr, 1, n)
        ).otherwise(F.concat(arr, F.array_repeat(F.lit(pad), n - F.size(arr)))),
        "arrayStringConcat": lambda arr, sep="": F.array_join(arr, sep),
        "arrayMap": lambda fn, arr: F.transform(arr, fn),
        "arrayFilter": lambda fn, arr: F.filter(arr, fn),
        "arrayExists": lambda fn, arr: F.exists(arr, fn),
        "arrayAll": lambda fn, arr: F.forall(arr, fn),
        "arrayCount": lambda fn, arr: F.size(F.filter(arr, fn)).cast("long"),
        "arrayZip": F.arrays_zip,
        "arrayEnumerate": lambda arr: F.transform(arr, lambda x, i: i + 1),
        "arrayShuffle": F.shuffle,
        "emptyArrayToSingle": lambda arr, v: F.when(F.size(arr) == 0, F.array(F.lit(v))).otherwise(arr),
        "range": F.sequence,
        "countEqual": lambda arr, v: F.size(F.filter(arr, lambda x: x == v)).cast("long"),
        "hasAll": lambda a, b: F.size(F.array_except(b, a)) == 0,
        "hasAny": lambda a, b: F.arrays_overlap(a, b),
        "arrayIntersect": F.array_intersect,
        "arrayExcept": F.array_except,
        "arrayUnionDistinct": lambda a, b: F.array_distinct(F.array_union(a, b)),
        "arrayRepeat": F.array_repeat,
    },
)


@register("arraySum", "ARRAY")
def array_sum(arr) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


@register("arrayAvg", "ARRAY")
def array_avg(arr) -> Column:
    return array_sum(arr) / F.size(arr)


@register("arrayMin", "ARRAY")
def array_min(arr) -> Column:
    return F.array_min(arr)


@register("arrayMax", "ARRAY")
def array_max(arr) -> Column:
    return F.array_max(arr)


@register("arrayProduct", "ARRAY")
def array_product(arr) -> Column:
    return F.aggregate(arr, F.lit(1.0), lambda acc, x: acc * x.cast("double"))


@register("arrayCumSum", "ARRAY")
def array_cum_sum(arr) -> Column:
    """Running sums within the array (reference :6660) via aggregate+struct."""
    return F.aggregate(
        arr,
        F.struct(F.lit(0.0).alias("run"), F.array().cast("array<double>").alias("out")),
        lambda acc, x: F.struct(
            (acc["run"] + x.cast("double")).alias("run"),
            F.concat(acc["out"], F.array(acc["run"] + x.cast("double"))).alias("out"),
        ),
        lambda acc: acc["out"],
    )


@register("arrayDifference", "ARRAY")
def array_difference(arr) -> Column:
    """[a,b,c] -> [0, b-a, c-b] (reference :6672)."""
    return F.transform(
        arr, lambda x, i: F.when(i == 0, F.lit(0.0)).otherwise(x.cast("double") - F.element_at(arr, i))
    )


@register("arrayFold", "ARRAY")
def array_fold(fn, arr, init) -> Column:
    return F.aggregate(arr, init, fn)


# --- MAP (reference :8310-8450) ---

register_many(
    "ARRAY",
    {
        "map": F.create_map,
        "mapKeys": F.map_keys,
        "mapValues": F.map_values,
        "mapFilter": F.map_filter,
        "mapApply": lambda fn, m: F.transform_values(m, fn),
        "mapContains": lambda m, k: F.array_contains(F.map_keys(m), k),
        "mapConcat": F.map_concat,
        "mapFromArrays": F.map_from_arrays,
        "mapEntries": F.map_entries,
    },
)

# --- TUPLE (reference :8469-8539) ---

register_many(
    "ARRAY",
    {
        "tuple": F.struct,
        "tupleElement": lambda st, name: st[name],
    },
)

# --- JSON (reference :3896-4324) ---

register_many(
    "JSON",
    {
        "JSONExtractString": lambda c, path: F.get_json_object(c, _jp(path)),
        "JSONExtractInt": lambda c, path: F.get_json_object(c, _jp(path)).cast("long"),
        "JSONExtractFloat": lambda c, path: F.get_json_object(c, _jp(path)).cast("double"),
        "JSONExtractBool": lambda c, path: F.get_json_object(c, _jp(path)).cast("boolean"),
        "JSONExtractRaw": lambda c, path: F.get_json_object(c, _jp(path)),
        "JSON_VALUE": lambda c, path: F.get_json_object(c, path),
        "JSONHas": lambda c, path: F.get_json_object(c, _jp(path)).isNotNull(),
        "JSONLength": lambda c: F.json_array_length(c),
        "JSONExtractKeys": lambda c: F.json_object_keys(c),
        "isValidJSON": lambda c: F.coalesce(
            F.json_array_length(c).isNotNull() | F.json_object_keys(c).isNotNull(), F.lit(False)
        ),
        "toJSONString": F.to_json,
        "fromJSONString": F.from_json,
        "schemaOfJSON": F.schema_of_json,
        "json_tuple": F.json_tuple,
    },
)


def _jp(path: str) -> str:
    """ClickHouse JSONExtract*(json, 'key') path → JSONPath '$.key'."""
    return path if path.startswith("$") else f"$.{path}"
