"""GEO / VECTOR math — distances, norms, dot products over array columns.

Reference inventory: datastore/function_definitions.py:4693-4900,9444-9542 —
greatCircleDistance/geoDistance/pointInPolygon + L1/L2/Linf/Lp distances &
norms, cosineDistance, dotProduct, L2Normalize. The reference demos
LSH/ANN vector search in SQL (examples/chDB_vector_search.ipynb); these
expressions are the foundation of chdb_spark.operators.similarity.

All pure Column math via zip_with/aggregate — JVM-side, no UDF, so the same
expression scales to 100 TB of embeddings without Python-worker transfer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chdb_spark.functions.registry import register


def _acc_sum(arr) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)


@register("dotProduct", "GEO")
def dot_product(a, b) -> Column:
    return _acc_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


@register("L1Norm", "GEO")
def l1_norm(a) -> Column:
    return _acc_sum(F.transform(a, lambda x: F.abs(x.cast("double"))))


@register("L2Norm", "GEO")
def l2_norm(a) -> Column:
    return F.sqrt(_acc_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


@register("LinfNorm", "GEO")
def linf_norm(a) -> Column:
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))


@register("LpNorm", "GEO")
def lp_norm(a, p: float) -> Column:
    return F.pow(_acc_sum(F.transform(a, lambda x: F.pow(F.abs(x.cast("double")), p))), 1.0 / p)


@register("L1Distance", "GEO")
def l1_distance(a, b) -> Column:
    return _acc_sum(F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))))


@register("L2Distance", "GEO")
def l2_distance(a, b) -> Column:
    return F.sqrt(
        _acc_sum(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
            )
        )
    )


@register("L2SquaredDistance", "GEO")
def l2_squared_distance(a, b) -> Column:
    return _acc_sum(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
        )
    )


@register("LinfDistance", "GEO")
def linf_distance(a, b) -> Column:
    return F.array_max(F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))))


@register("cosineSimilarity", "GEO")
def cosine_similarity(a, b) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


@register("cosineDistance", "GEO")
def cosine_distance(a, b) -> Column:
    """1 - cos_sim (reference function_definitions.py:9491)."""
    return F.lit(1.0) - cosine_similarity(a, b)


@register("L2Normalize", "GEO")
def l2_normalize(a) -> Column:
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


# --- geo scalars (reference :4693-4900) ---


@register("greatCircleDistance", "GEO")
def great_circle_distance(lon1, lat1, lon2, lat2) -> Column:
    """Haversine in meters, WGS84 mean radius — pure Column trig."""
    r = 6371008.8
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lon2 - lon1) / 2
    h = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return F.lit(2 * r) * F.asin(F.sqrt(h))


@register("geoDistance", "GEO")
def geo_distance(lon1, lat1, lon2, lat2) -> Column:
    return great_circle_distance(lon1, lat1, lon2, lat2)


@register("pointInPolygon", "GEO")
def point_in_polygon(px, py, polygon_xs, polygon_ys) -> Column:
    """Ray-casting over array columns of polygon vertices (reference :4840).

    Counts crossings via aggregate over vertex indices — Column-only.
    """
    n = F.size(polygon_xs)
    idx = F.sequence(F.lit(0), n - 1)

    def crossing(acc, i):
        j = (i + n - 1) % n
        xi, yi = F.element_at(polygon_xs, i + 1), F.element_at(polygon_ys, i + 1)
        xj, yj = F.element_at(polygon_xs, j + 1), F.element_at(polygon_ys, j + 1)
        cond = ((yi > py) != (yj > py)) & (px < (xj - xi) * (py - yi) / (yj - yi) + xi)
        return acc + F.when(cond, 1).otherwise(0)

    return (F.aggregate(idx, F.lit(0), crossing) % 2) == 1
