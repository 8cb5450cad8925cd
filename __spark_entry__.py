"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline; ``queries()`` /
``oracle_sql()`` expose one entry per implemented operator from
SURVEY.md §2, checked against DuckDB at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full raster->vector extraction over the synthetic
    Iceberg-shaped image+caption table (decode -> affine -> reproject ->
    NoData filter -> round -> tile-assign), returning per-image zonal
    rollups joined back to captions."""
    from pyspark.sql import functions as F

    from tiff_to_geojson_csv_json_format_converter_spark.functions import cells
    from tiff_to_geojson_csv_json_format_converter_spark.operators import extract
    from tiff_to_geojson_csv_json_format_converter_spark.sources import synth

    images = synth.images_df(spark, "xs")
    pts = extract.extract_points(images, valid_only=True)
    tiled = pts.withColumn(
        "cell_id", cells.cell_id_col(F.col("longitude"), F.col("latitude"), 12)
    )
    agg = tiled.groupBy("image_id").agg(
        F.count("*").alias("valid_pixels"),
        F.min("longitude").alias("min_longitude"),
        F.max("longitude").alias("max_longitude"),
        F.min("latitude").alias("min_latitude"),
        F.max("latitude").alias("max_latitude"),
        F.min("elevation").alias("min_elevation"),
        F.max("elevation").alias("max_elevation"),
        F.countDistinct("cell_id").alias("n_tiles"),
    )
    captions = images.select("image_id", "caption", "phash")
    return agg.join(F.broadcast(captions), "image_id").orderBy("image_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tiff_to_geojson_csv_json_format_converter_spark.plans import entry_queries

    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key."""
    from tiff_to_geojson_csv_json_format_converter_spark.plans import entry_queries

    return entry_queries.oracle_sql()
