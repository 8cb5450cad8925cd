"""Feature-export sinks: GeoJSON / CSV / JSON with the reference's exact
float formatting, plus catalog and combined-file outputs.

Formatting contracts preserved:
- CSV rows ``longitude,latitude,elevation`` at %.6f
  (doesSamples.py:95-101); compressed variant x,y,z at %.2f
  (thiswillcompress.py:59-71)
- GeoJSON point features with [lon, lat, z] coordinates and NO
  properties (completePixleOutput.py:99-105), compact separators
  (completePixleOutput.py:127-128)
- struct-of-arrays JSON doc with metadata envelope
  (doesSamples.py:108-133)
- master catalog: per-file entries sorted by source, overall bounds
  fold (doesSamples.py:351-466)

String assembly happens in built-in expressions (format_string/concat —
JVM); envelopes that are single documents are assembled driver-side from
aggregate query results (they are O(files), not O(points)).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def csv_line_col(lon="longitude", lat="latitude", z="elevation", fmt: str = "%.6f"):
    """One formatted CSV line per point (header handled by the writer)."""
    return F.format_string(f"{fmt},{fmt},{fmt}", F.col(lon), F.col(lat), F.col(z))


def geojson_feature_col(lon="longitude", lat="latitude", z="elevation"):
    """GeoJSON Feature string, byte-compatible with the reference's
    json.dump(separators=(',',':')) of the rounded values
    (completePixleOutput.py:99-128): lon/lat are 6-dp-rounded doubles,
    rendered %.6f then trailing-zero-trimmed (== repr of the rounded
    double); elevation is float(np.float32-rounded) — the reference
    prints its full double repr (e.g. 1001.52001953125), so it is cast
    to string (JVM shortest-roundtrip toString == Python repr here)."""
    return F.format_string(
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[%s,%s,%s]}}',
        _trim_num(F.format_string("%.6f", F.col(lon))),
        _trim_num(F.format_string("%.6f", F.col(lat))),
        F.col(z).cast("string"),
    )


def _trim_num(s):
    """Trim trailing zeros (and a bare trailing dot) from fixed-format
    numbers: '77.100000' -> '77.1', '28.000000' -> '28.0' — matching
    Python repr of the np.round()ed values for 6/2-dp-rounded doubles."""
    trimmed = F.regexp_replace(s, "0+$", "")
    return F.when(trimmed.endswith("."), F.concat(trimmed, F.lit("0"))).otherwise(trimmed)


def write_csv_per_image(points: DataFrame, path: str, fmt: str = "%.6f") -> None:
    """Combined CSV with source lineage column (completePixleOutput.py:252-282
    created this by pd.concat; here it's just a partitioned write)."""
    (
        points.select(
            "image_id",
            F.format_string(fmt, "longitude").alias("longitude"),
            F.format_string(fmt, "latitude").alias("latitude"),
            F.format_string(fmt, "elevation").alias("elevation"),
        )
        .write.mode("overwrite")
        .partitionBy("image_id")
        .option("header", True)
        .csv(path)
    )


def geojson_feature_collection(points: DataFrame, source_file: str,
                               total_original_points: int) -> str:
    """Driver-assembled FeatureCollection envelope
    (completePixleOutput.py:108-124). Use only for bounded outputs
    (the reference caps GeoJSON at 10k features)."""
    feats = [r[0] for r in points.select(geojson_feature_col()).collect()]
    envelope = {
        "type": "FeatureCollection",
        "crs": {"type": "name", "properties": {"name": "urn:ogc:def:crs:OGC:1.3:CRS84"}},
        "metadata": {
            "source_file": source_file,
            "total_original_points": total_original_points,
            "geojson_points": len(feats),
            "note": "Coordinates in WGS84 (longitude, latitude, elevation)",
        },
        "features": ["@@F@@"],
    }
    body = json.dumps(envelope, separators=(",", ":"))
    return body.replace('"@@F@@"', ",".join(feats))


def json_struct_of_arrays(points: DataFrame, metadata: dict) -> str:
    """The doesSamples.py:108-133 JSON doc: metadata + parallel arrays.
    Arrays come back from ONE aggregate (collect_list per column)."""
    row = points.agg(
        F.collect_list("longitude").alias("lon"),
        F.collect_list("latitude").alias("lat"),
        F.collect_list("elevation").alias("z"),
    ).collect()[0]
    doc = {
        "metadata": metadata,
        "data": {"longitude": row["lon"], "latitude": row["lat"], "elevation": row["z"]},
    }
    return json.dumps(doc, separators=(",", ":"))


def master_catalog(points: DataFrame, images: DataFrame) -> dict:
    """The master catalog document (doesSamples.py:351-466): one
    aggregation query -> per-file entries (sorted) + overall bounds."""
    per_file = (
        points.groupBy("image_id")
        .agg(
            F.count("*").alias("points"),
            F.min("longitude").alias("min_lon"), F.max("longitude").alias("max_lon"),
            F.min("latitude").alias("min_lat"), F.max("latitude").alias("max_lat"),
            F.min("elevation").alias("min_z"), F.max("elevation").alias("max_z"),
        )
        .join(images.select("image_id", "w", "h", "caption"), "image_id")
        .orderBy("image_id")  # doesSamples.py:439 sort by source
    ).collect()
    files = []
    ob = {"min_x": None, "max_x": None, "min_y": None, "max_y": None, "min_z": None, "max_z": None}
    for r in per_file:
        d = r.asDict()
        files.append({
            "source_tiff": d["image_id"], "file_prefix": d["image_id"],
            "bounds_wgs84": {
                "min_longitude": d["min_lon"], "max_longitude": d["max_lon"],
                "min_latitude": d["min_lat"], "max_latitude": d["max_lat"],
                "min_elevation": d["min_z"], "max_elevation": d["max_z"],
            },
            "original_points": d["w"] * d["h"], "frontend_points": d["points"],
            "has_valid_data": d["points"] > 0,
            "available_formats": {"csv": True, "json": True, "geojson_wgs84": True, "readme": True},
        })
        for src, dst, fn in (("min_lon", "min_x", min), ("max_lon", "max_x", max),
                             ("min_lat", "min_y", min), ("max_lat", "max_y", max),
                             ("min_z", "min_z", min), ("max_z", "max_z", max)):
            ob[dst] = d[src] if ob[dst] is None else fn(ob[dst], d[src])
    return {
        "type": "elevation_catalog",
        "total_files": len(files),
        "coordinate_system": "EPSG:4326",
        "overall_bounds": ob,
        "files": files,
    }


def analyze_report(per_image: DataFrame) -> str:
    """Human-readable master report (test.py:366-515): totals + sparsity
    histogram from the analyze aggregates."""
    rows = [r.asDict() for r in per_image.collect()]
    total_files = len(rows)
    total_valid = sum(r.get("valid_pixels", 0) for r in rows)
    lines = [
        "TIFF ANALYSIS MASTER REPORT",
        "=" * 50,
        f"Total files analyzed: {total_files}",
        f"Total valid points: {total_valid:,}",
    ]
    for r in rows:
        lines.append(
            f"  {r['image_id']}: {r.get('valid_pixels', 0):,} valid points "
            f"bounds=({r.get('min_longitude')},{r.get('min_latitude')})..."
            f"({r.get('max_longitude')},{r.get('max_latitude')})"
        )
    return "\n".join(lines)
