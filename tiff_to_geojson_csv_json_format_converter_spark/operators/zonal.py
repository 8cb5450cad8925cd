"""Zonal statistics: per-(polygon, image, band) aggregates of clipped pixels.

The reference's Django endpoint (test2.py:1359-1505,
get_raster_stats_clean.py:148-173) computes numpy min/max/mean/std/count
over the polygon-masked pixels, with two contract quirks preserved here:

- std is POPULATION std (numpy default ddof=0) -> ``stddev_pop``
- empty intersections yield the string sentinel ``"Null"``
  (test2.py:1463-1473); the engine returns an empty stats row set and
  the response formatter emits the sentinel.

Plan: clip (bbox predicate + PIP UDF) -> groupBy agg. One shuffle,
map-side partial aggregation; the polygon is broadcast by closure.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import joins


def zonal_stats(points: DataFrame, rings: list, polygon_id: str = "poly") -> DataFrame:
    """points (POINTS_SCHEMA) x one polygon -> per-(image, band) stats."""
    clipped = joins.clip_points(points, rings)
    return (
        clipped.groupBy("image_id", "band")
        .agg(
            F.min("elevation").alias("min"),
            F.max("elevation").alias("max"),
            F.avg("elevation").alias("mean"),
            F.stddev_pop("elevation").alias("std_pop"),
            F.count("*").alias("count"),
        )
        .withColumn("polygon_id", F.lit(polygon_id))
        .select("polygon_id", "image_id", "band", "min", "max", "mean", "std_pop", "count")
    )


def zonal_stats_multi(points: DataFrame, polygons: list[dict]) -> DataFrame:
    """Many polygons at once: unioned per-polygon clips (each polygon's
    bbox predicate still prunes independently). For large polygon layers
    prefer the cell-cover equi-join in ``tiling.cover_join``."""
    parts = [zonal_stats(points, p["rings"], p["polygon_id"]) for p in polygons]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def combine_stats_reference_quirk(stats_rows: list[dict]) -> dict:
    """The reference's cross-file merge keeps the FIRST file's mean/std
    and only widens min/max (test2.py:162-179). Reproduced faithfully as
    a documented quirk for contract parity."""
    if not stats_rows:
        return {}
    combined = dict(stats_rows[0])
    for r in stats_rows[1:]:
        combined["min"] = min(combined["min"], r["min"])
        combined["max"] = max(combined["max"], r["max"])
        combined["count"] = combined.get("count", 0) + r.get("count", 0)
    return combined


def stats_response(stats_df: DataFrame, layer_name: str, geometry_type: str = "Polygon") -> str:
    """Serialize to the HTTP contract of SIMPLE_FRONTEND_INTEGRATION.md:153-179
    (``{status, layer, min_max: {band_i: {...}|"Null"}, ...}``)."""
    rows = [r.asDict() for r in stats_df.collect()]
    min_max: dict = {}
    for r in rows:
        min_max[f"band_{int(r['band']) + 1}"] = {
            "min": r["min"], "max": r["max"], "mean": r["mean"],
            "std": r["std_pop"], "count": r["count"], "data_type": "float32",
        }
    if not min_max:
        min_max["band_1"] = "Null"  # empty-intersection sentinel (test2.py:1463-1473)
    return json.dumps(
        {"status": "success", "layer": layer_name, "min_max": min_max,
         "geometry_type": geometry_type, "method": "spark_zonal"},
        separators=(",", ":"),
    )
