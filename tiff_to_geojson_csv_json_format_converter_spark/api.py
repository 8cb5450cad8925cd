"""User-facing converter API: everything the reference's scripts do,
as one class over the images table.

Script-parity map:
- ``analyze()``                <- test.py / analyzeAndCreateOnlyReadme
  (metadata + bounds, master report, no data files)
- ``convert(mode='valid')``    <- willOnlyStoreValidPoints.py
- ``convert(mode='sampled')``  <- doesSamples.py (100k/10k caps)
- ``convert(mode='full')``     <- completePixleOutput.py
- ``zonal_response(geometry)`` <- test2.py / get_raster_stats_* endpoint
- ``nearest(queries)``         <- pyc getElevation JS (kNN k=1)
- ``catalog()``                <- create_master_catalog

Per-image output files (GeoJSON / CSV / JSON / readme) are assembled
from ONE distributed pass; file writing is bounded by the reference's
own output caps (10k GeoJSON features), so the driver-side assembly is
O(files + capped features), never O(pixels).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import geometry
from .operators import extract, joins, sinks, tiling, zonal
from .sources import synth, tiff_dir


class Converter:
    def __init__(self, spark: SparkSession, images: DataFrame):
        self.spark = spark
        self.images = images

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_tiff_dir(cls, spark: SparkSession, path: str) -> "Converter":
        return cls(spark, tiff_dir.read_tiff_dir(spark, path))

    @classmethod
    def from_synthetic(cls, spark: SparkSession, scale: str = "xs") -> "Converter":
        return cls(spark, synth.images_df(spark, scale))

    # -- pipelines ------------------------------------------------------------

    def points(self, mode: str = "valid") -> DataFrame:
        if mode == "valid":  # willOnlyStoreValidPoints.py
            return extract.extract_points(self.images, valid_only=True)
        if mode == "sampled":  # doesSamples.py caps
            return extract.extract_points(
                self.images, valid_only=False,
                sample_cap=extract.MAX_FRONTEND_POINTS,
            )
        if mode == "full":  # completePixleOutput.py
            return extract.extract_points(self.images, valid_only=False)
        raise ValueError(f"unknown mode {mode!r}")

    def analyze(self) -> DataFrame:
        """Per-image metadata incl. sparsity (test.py:83-95)."""
        pts = extract.extract_points(self.images, valid_only=True)
        agg = extract.analyze_images(pts)
        # valid_pixels counts points across ALL bands — the denominator
        # must too, or multi-band images inflate the percentage
        totals = self.images.select(
            "image_id",
            (F.col("w") * F.col("h") * F.col("band_count")).alias("total_pixels"),
        )
        out = totals.join(agg, "image_id", "left").na.fill({"valid_pixels": 0})
        pct = F.col("valid_pixels").cast("double") / F.col("total_pixels").cast("double")
        return out.withColumn(
            "valid_percentage", pct * 100.0
        ).withColumn(
            "has_valid_data", F.col("valid_pixels") > 0
        ).withColumn(
            "data_sparsity", F.when(pct < 0.1, "sparse").otherwise("dense")
        )

    def convert(self, out_dir: str, mode: str = "sampled", geojson_cap: int | None = None) -> dict:
        """Write per-image GeoJSON (+CSV for sampled mode) files + master
        catalog + combined CSV, mirroring the reference converters'
        on-disk contract."""
        os.makedirs(out_dir, exist_ok=True)
        cap = geojson_cap or extract.MAX_GEOJSON_POINTS
        pts = self.points(mode)
        geo_pts = extract.extract_points(
            self.images,
            valid_only=(mode == "valid"),
            sample_cap=extract.MAX_FRONTEND_POINTS if mode == "sampled" else None,
            geojson_cap=cap if mode == "sampled" else None,
        )
        # deterministic feature order: collect (pixel_idx, feature)
        # structs and sort — collect_list alone is shuffle-order-dependent
        # (same fix sinks.geojson_collection_docs carries)
        feats = (
            geo_pts.filter(F.col("band") == 0)
            .groupBy("image_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        F.col("pixel_idx").alias("o"),
                        sinks.geojson_feature_col().alias("f"),
                    ))),
                    lambda s_: s_["f"],
                ).alias("features"),
                F.count("*").alias("n"),
            )
        )
        written = []
        for row in feats.toLocalIterator():
            fc = {
                "type": "FeatureCollection",
                "crs": {"type": "name", "properties": {"name": "urn:ogc:def:crs:OGC:1.3:CRS84"}},
                "metadata": {
                    "source_file": row["image_id"],
                    "geojson_points": row["n"],
                    "note": "Coordinates in WGS84 (longitude, latitude, elevation)",
                },
                "features": ["@@F@@"],
            }
            body = json.dumps(fc, separators=(",", ":")).replace('"@@F@@"', ",".join(row["features"]))
            p = os.path.join(out_dir, f"{row['image_id']}_wgs84.geojson")
            with open(p, "w") as f:
                f.write(body)
            written.append(p)
        # combined CSV with lineage (completePixleOutput.py:252-282)
        sinks.write_csv_per_image(pts, os.path.join(out_dir, "combined_csv"))
        # master catalog (doesSamples.py:351-466)
        cat = sinks.master_catalog(pts, self.images)
        with open(os.path.join(out_dir, "master_catalog.json"), "w") as f:
            json.dump(cat, f, indent=2)
        # all-NoData info files (willOnlyStoreValidPoints.py:80-94).
        # O(files) driver-side collect, like the reference's local-file
        # writes and the analyze-report sink class (sinks.py carries the
        # same note): rows here are one per IMAGE (metadata only, no
        # pixels), so the collect is catalog-sized, not data-sized. At
        # true 10^8-file scale route this through a distributed text
        # sink keyed by image_id instead.
        if mode == "valid":
            have = {r["image_id"] for r in pts.select("image_id").distinct().collect()}
            for r in self.images.select("image_id", "w", "h", "crs").collect():
                if r["image_id"] not in have:
                    p = os.path.join(out_dir, f"{r['image_id']}.info.txt")
                    with open(p, "w") as f:
                        f.write(
                            "TIFF FILE ANALYSIS - NO VALID DATA\n" + "=" * 50 + "\n\n"
                            f"Source file: {r['image_id']}\n"
                            f"Dimensions: {r['w']} x {r['h']}\n"
                            f"Original CRS: {r['crs']}\n\n"
                            "STATUS: NO GEOJSON FILE CREATED\n"
                            "REASON: All pixels contain NoData/infinity values\n"
                        )
        return {"geojson_files": written, "catalog": cat}

    def zonal_response(self, geometry_obj, layer_name: str = "layer") -> str:
        """The HTTP endpoint contract (test2.py:198-1526)."""
        rings = geometry.normalize_geometry(geometry_obj)
        pts = extract.extract_points(self.images, valid_only=True)
        stats = zonal.zonal_stats(pts, rings, layer_name)
        # reference merge quirk (test2.py:162-179): keep the FIRST file's
        # mean/std/count (first in image_id order — deterministic via
        # min_by, never F.first after a shuffle) and only widen min/max
        merged = stats.groupBy("band").agg(
            F.min("min").alias("min"), F.max("max").alias("max"),
            F.min_by("mean", "image_id").alias("mean"),
            F.min_by("std_pop", "image_id").alias("std_pop"),
            F.min_by("count", "image_id").alias("count"),
        )
        return zonal.stats_response(merged, layer_name)

    def nearest(self, queries: DataFrame, k: int = 1) -> DataFrame:
        pts = extract.extract_points(self.images, valid_only=True)
        return joins.knn_join(pts, queries, k=k)

    def catalog(self) -> dict:
        pts = extract.extract_points(self.images, valid_only=True)
        return sinks.master_catalog(pts, self.images)

    def tiles(self, level: int = tiling.DEFAULT_LEVEL) -> DataFrame:
        return tiling.tile_histogram(
            extract.extract_points(self.images, valid_only=True), level
        )
