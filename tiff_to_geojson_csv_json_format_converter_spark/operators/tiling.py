"""Tile assignment, skew-aware repartitioning, catalog rollup.

The engine's "tiling" output (BASELINE.json north_rule) assigns every
point a hierarchical cell id (functions.cells). Assignment is pure
integer arithmetic in whole-stage codegen — zero Python, zero shuffle.

Skew: the synthetic layout concentrates ~80 % of images in a few Delhi
cells. Writing or joining partitioned by raw cell id would hot-spot one
task, so ``salted_repartition`` spreads each hot cell over
``salt_buckets`` subpartitions (pmod(hash(image_id), salt)) while AQE's
skew-join splitting handles the join-side residual (SURVEY.md §4).

The catalog rollup reproduces the reference master catalog
(doesSamples.py:351-466, completePixleOutput.py:284-468): per-image
bounds + counts, folded into overall bounds — one aggregation query;
the grand-total row is the catalog's ``overall_bounds``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells

DEFAULT_LEVEL = 12


def assign_tiles(points: DataFrame, level: int = DEFAULT_LEVEL,
                 lon_col: str = "longitude", lat_col: str = "latitude") -> DataFrame:
    """Add ``cell_id`` (morton, hierarchical) and ``tile_id`` (row-major)
    columns — pure codegen, no UDF."""
    return points.withColumn(
        "cell_id", cells.cell_id_col(F.col(lon_col), F.col(lat_col), level)
    ).withColumn(
        "tile_id", cells.tile_id_col(F.col(lon_col), F.col(lat_col), level)
    )


def salted_repartition(df: DataFrame, key: str = "cell_id", salt_buckets: int = 8,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, salt) to split hot cells across tasks —
    explicit salting for the dense-tile skew the north rule calls out."""
    # the salt must vary WITHIN a key group or it splits nothing: hash a
    # second column when one exists, else a per-row id (placement-only —
    # no determinism requirement attaches to partition assignment)
    if "image_id" in df.columns:
        salt = F.pmod(F.xxhash64("image_id"), F.lit(salt_buckets))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    df = df.withColumn("_salt", salt)
    parts = [F.col(key), F.col("_salt")]
    out = df.repartition(num_partitions, *parts) if num_partitions else df.repartition(*parts)
    return out.drop("_salt")


def tile_histogram(points: DataFrame, level: int = DEFAULT_LEVEL) -> DataFrame:
    """Points per tile — the skew diagnostic + the tile manifest."""
    return (
        assign_tiles(points, level)
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"), F.countDistinct("image_id").alias("n_images"))
    )


def catalog_rollup(points: DataFrame) -> DataFrame:
    """Per-image catalog entries plus the grand-total overall_bounds row
    (``rollup``): image_id = NULL row carries the catalog fold the
    reference accumulates imperatively at doesSamples.py:403-408."""
    return (
        points.rollup("image_id")
        .agg(
            F.count("*").alias("points"),
            F.min("longitude").alias("min_longitude"),
            F.max("longitude").alias("max_longitude"),
            F.min("latitude").alias("min_latitude"),
            F.max("latitude").alias("max_latitude"),
            F.min("elevation").alias("min_elevation"),
            F.max("elevation").alias("max_elevation"),
        )
        .withColumn("is_overall", F.col("image_id").isNull())
    )


def write_tiled(points: DataFrame, path: str, level: int = DEFAULT_LEVEL,
                salt_buckets: int = 8, coarse_level: int = 6) -> None:
    """Write the point table partitioned by a COARSE cell prefix (few
    thousand directories max) with salted in-partition spread. Readers
    with a bbox predicate prune partitions via the prefix column."""
    tiled = assign_tiles(points, level)
    tiled = tiled.withColumn(
        "cell_prefix",
        cells.cell_id_col(F.col("longitude"), F.col("latitude"), coarse_level),
    )
    (
        salted_repartition(tiled, "cell_prefix", salt_buckets)
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(path)
    )
