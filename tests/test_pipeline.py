"""End-to-end pipeline tests: zonal/kNN/tiling vs the numpy oracle on
real decoded rasters, resumable catalog, streaming incremental driver,
sink formatting parity (SURVEY.md §5 items 3-5)."""

import glob
import json
import os

import numpy as np
import pytest

from tests import oracle
from tiff_to_geojson_csv_json_format_converter_spark.functions import cells
from tiff_to_geojson_csv_json_format_converter_spark.operators import (
    extract, joins, sinks, tiling, zonal,
)
from tiff_to_geojson_csv_json_format_converter_spark.plans.catalog import ParquetCatalog
from tiff_to_geojson_csv_json_format_converter_spark.sources import synth
from tiff_to_geojson_csv_json_format_converter_spark.streaming import incremental


@pytest.fixture(scope="module")
def images_pdf():
    n, sizes = synth.SCALES["xs"]
    return synth.generate_pandas(np.arange(n), n, sizes)


@pytest.fixture(scope="module")
def points_sdf(spark):
    return extract.extract_points(synth.images_df(spark, "xs"), valid_only=True).cache()


@pytest.fixture(scope="module")
def points_pdf(images_pdf):
    return oracle.extract_points(images_pdf, valid_only=True)


class TestZonal:
    def test_golden_delhi_matches_oracle(self, spark, points_sdf, points_pdf):
        got = zonal.zonal_stats(points_sdf, [synth.GOLDEN_DELHI_RING], "poly_0000").toPandas()
        want = oracle.zonal_stats(points_pdf, [synth.GOLDEN_DELHI_RING], "poly_0000")
        assert len(got) == len(want) and len(got) > 0
        got = got.sort_values(["image_id", "band"]).reset_index(drop=True)
        want = want.sort_values(["image_id", "band"]).reset_index(drop=True)
        assert got["image_id"].tolist() == want["image_id"].tolist()
        assert got["count"].tolist() == want["count"].tolist()
        np.testing.assert_array_equal(got["min"].to_numpy(), want["min"].to_numpy())
        np.testing.assert_array_equal(got["max"].to_numpy(), want["max"].to_numpy())
        np.testing.assert_allclose(got["mean"].to_numpy(), want["mean"].to_numpy(), rtol=1e-12)
        np.testing.assert_allclose(got["std_pop"].to_numpy(), want["std_pop"].to_numpy(), rtol=1e-9)

    def test_miss_everything_polygon_is_empty(self, spark, points_sdf):
        rings = [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]
        got = zonal.zonal_stats(points_sdf, rings, "poly_0001")
        assert got.count() == 0
        resp = json.loads(zonal.stats_response(got, "slope_layer"))
        assert resp["min_max"]["band_1"] == "Null"  # sentinel contract

    def test_combine_stats_reference_quirk(self, spark):
        """E5: the reference's cross-file merge keeps the FIRST file's
        mean/std/count and only widens min/max (test2.py:162-179 — the
        merge branch touches nothing else) — reproduced faithfully."""
        rows = [
            {"min": 10.0, "max": 50.0, "mean": 30.0, "std_pop": 5.0, "count": 100},
            {"min": 5.0, "max": 70.0, "mean": 99.0, "std_pop": 9.0, "count": 50},
        ]
        out = zonal.combine_stats_reference_quirk(rows)
        assert out["min"] == 5.0 and out["max"] == 70.0
        assert out["mean"] == 30.0 and out["std_pop"] == 5.0  # first file kept
        assert out["count"] == 100  # first file's count kept, not summed

    def test_stats_response_contract(self, spark, points_sdf):
        got = zonal.zonal_stats(points_sdf, [synth.GOLDEN_DELHI_RING], "poly_0000")
        resp = json.loads(zonal.stats_response(got.limit(1), "slope_layer"))
        assert resp["status"] == "success"
        band = resp["min_max"]["band_1"]
        assert set(band) == {"min", "max", "mean", "std", "count", "data_type"}


class TestKnn:
    def test_knn_matches_exhaustive_oracle(self, spark, points_sdf, points_pdf):
        queries = synth.knn_queries(24)
        # restrict to queries near data (ring expansion bounded); far-away
        # probes are exercised for the 'exact' flag below
        near = queries[(queries.lon > 70) & (queries.lon < 90)].reset_index(drop=True)
        qdf = spark.createDataFrame(near)
        got = joins.knn_join(
            points_sdf.select("image_id", "pixel_idx", "longitude", "latitude"),
            qdf, k=1, level=12, max_ring=3,
        ).toPandas().set_index("query_id")
        # exhaustive numpy oracle (the reference JS min-distance reduce)
        P = points_pdf
        for _, q in near.iterrows():
            d2 = (P["longitude"].to_numpy() - q.lon) ** 2 + (P["latitude"].to_numpy() - q.lat) ** 2
            order = np.lexsort((P["pixel_idx"].to_numpy(), P["image_id"].to_numpy(), d2))
            best = order[0]
            if q.query_id in got.index:
                row = got.loc[q.query_id]
                if bool(np.atleast_1d(row["exact"])[0]):
                    assert np.atleast_1d(row["dist2"])[0] == pytest.approx(d2[best], rel=1e-12), q.query_id

    def test_far_query_flagged_inexact_or_absent(self, spark, points_sdf):
        import pandas as pd

        far = pd.DataFrame([{"query_id": "far_1", "lon": -120.0, "lat": 40.0, "k": 1}])
        got = joins.knn_join(
            points_sdf.select("image_id", "pixel_idx", "longitude", "latitude"),
            spark.createDataFrame(far), k=1, level=12, max_ring=2,
        ).toPandas()
        assert len(got) == 0 or not got["exact"].any()


class TestTiling:
    def test_column_twin_equals_numpy(self, spark, points_sdf, points_pdf):
        from pyspark.sql import functions as F

        got = (
            points_sdf.withColumn("cell_id", cells.cell_id_col(F.col("longitude"), F.col("latitude"), 12))
            .withColumn("tile_id", cells.tile_id_col(F.col("longitude"), F.col("latitude"), 12))
            .select("image_id", "pixel_idx", "band", "cell_id", "tile_id")
            .toPandas()
            .sort_values(["image_id", "band", "pixel_idx"])
            .reset_index(drop=True)
        )
        P = points_pdf.sort_values(["image_id", "band", "pixel_idx"]).reset_index(drop=True)
        want_cell = cells.cell_id(P["longitude"].to_numpy(), P["latitude"].to_numpy(), 12)
        tx, ty = cells.tile_xy(P["longitude"].to_numpy(), P["latitude"].to_numpy(), 12)
        assert np.array_equal(got["cell_id"].to_numpy(), want_cell)
        assert np.array_equal(got["tile_id"].to_numpy(), tx * (1 << 12) + ty)

    def test_multi_level_cell_ids_bit_equal(self, spark, points_sdf, points_pdf):
        """The derived multi-level forms (cell_id_multi_col /
        explode_cell_levels) must be bit-equal to the direct per-level
        cell_id_col: the Z-order prefix shift and the per-level floor
        must agree at every level, including at grid-edge coordinates."""
        from pyspark.sql import functions as F

        levels = [4, 6, 8, 10, 12, 14, 16]
        edge = spark.createDataFrame(
            [(-180.0, 90.0), (179.999999, -89.999999), (0.0, 0.0),
             (180.0, -90.0), (-0.0000001, 0.0000001)],
            "longitude double, latitude double")
        for df in (points_sdf.select("longitude", "latitude"), edge):
            multi = cells.cell_id_multi_col(
                F.col("longitude"), F.col("latitude"), levels)
            sel = df.select(
                *[m.alias(f"m{lv}") for lv, m in zip(levels, multi)],
                "longitude", "latitude").toPandas()
            for lv in levels:
                want = cells.cell_id(sel["longitude"].to_numpy(),
                                     sel["latitude"].to_numpy(), lv)
                assert np.array_equal(sel[f"m{lv}"].to_numpy(), want), lv
            # explode form: same multiset of (lon, lat, cell) triples
            ex = cells.explode_cell_levels(
                df, F.col("longitude"), F.col("latitude"), levels).toPandas()
            assert len(ex) == len(sel) * len(levels)
            got = sorted(zip(ex["longitude"], ex["latitude"], ex["cell"]))
            want_all = sorted(
                (lo, la, int(cells.cell_id(np.array([lo]), np.array([la]), lv)[0]))
                for lo, la in zip(sel["longitude"], sel["latitude"])
                for lv in levels)
            assert got == want_all

    def test_salted_repartition_preserves_rows(self, spark, points_sdf):
        tiled = tiling.assign_tiles(points_sdf, 12)
        before = tiled.count()
        after_df = tiling.salted_repartition(tiled, "cell_id", salt_buckets=4, num_partitions=8)
        assert after_df.count() == before
        assert after_df.columns == tiled.columns

    def test_tile_pyramid_child_merge_equals_direct(self, spark, points_sdf):
        """The pyramid rolls each level up from its children (4->1);
        recomputing every level directly from the points must give the
        identical multiset — the floor/shift derivation is exact."""
        from pyspark.sql import functions as F

        pts = points_sdf.withColumn(
            "zc", F.floor(F.col("elevation") * 100.0).cast("long"))
        pyr = tiling.tile_pyramid(pts, "zc", finest=12, coarsest=8)
        got = {tuple(r) for r in pyr.collect()}
        want = set()
        for lv in range(8, 13):
            direct = (
                pts.select(
                    cells.tile_x_col(F.col("longitude"), lv).alias("tile_x"),
                    cells.tile_y_col(F.col("latitude"), lv).alias("tile_y"),
                    "zc")
                .groupBy("tile_x", "tile_y")
                .agg(F.count("*").alias("n_points"),
                     F.sum("zc").alias("sum_v"),
                     F.min("zc").alias("min_v"), F.max("zc").alias("max_v"))
            )
            want |= {(lv, r["tile_x"], r["tile_y"], r["n_points"],
                      r["sum_v"], r["min_v"], r["max_v"])
                     for r in direct.collect()}
        assert got == want
        # coarser levels can never have more occupied tiles than finer
        per_level = {lv: sum(1 for t in got if t[0] == lv)
                     for lv in range(8, 13)}
        for lv in range(9, 13):
            assert per_level[lv - 1] <= per_level[lv]
        with pytest.raises(ValueError, match="level range"):
            tiling.tile_pyramid(pts, "zc", finest=4, coarsest=8)

    def test_tile_pyramid_hll_distinct_merges_across_levels(
            self, spark, points_sdf):
        """distinct_col adds a DataSketches HLL sketch that MERGES up
        the pyramid (exact distinct counts cannot) — every level's
        estimate must track the exact per-tile distinct image count."""
        from pyspark.sql import functions as F

        pts = points_sdf.withColumn(
            "zc", F.floor(F.col("elevation") * 100.0).cast("long"))
        pyr = tiling.tile_pyramid(pts, "zc", finest=12, coarsest=9,
                                  distinct_col="image_id")
        assert "hll" not in pyr.columns
        got = {(r["level"], r["tile_x"], r["tile_y"]): r["approx_distinct"]
               for r in pyr.collect()}
        assert got  # non-empty
        for lv in range(9, 13):
            exact = (
                pts.select(
                    cells.tile_x_col(F.col("longitude"), lv).alias("tx"),
                    cells.tile_y_col(F.col("latitude"), lv).alias("ty"),
                    "image_id")
                .groupBy("tx", "ty")
                .agg(F.countDistinct("image_id").alias("nd"))
            )
            for r in exact.collect():
                est = got[(lv, r["tx"], r["ty"])]
                assert abs(est - r["nd"]) <= max(1, 0.05 * r["nd"]), (
                    lv, r["tx"], r["ty"], est, r["nd"])

    def test_catalog_rollup_overall_equals_union_of_files(self, spark, points_sdf):
        roll = tiling.catalog_rollup(points_sdf).toPandas()
        overall = roll[roll["is_overall"]]
        per_file = roll[~roll["is_overall"]]
        assert len(overall) == 1
        o = overall.iloc[0]
        assert o["points"] == per_file["points"].sum()
        assert o["min_longitude"] == per_file["min_longitude"].min()
        assert o["max_latitude"] == per_file["max_latitude"].max()


class TestCatalogResume:
    def test_kill_and_resume_no_duplicates(self, spark, points_sdf, tmp_path):
        root = str(tmp_path / "cat")
        df = tiling.assign_tiles(points_sdf, 12).withColumn(
            "part_key", (F_col("cell_id") % 4).cast("string")
        )
        cat = ParquetCatalog(spark, root)
        parts = sorted(r[0] for r in df.select("part_key").distinct().collect())
        # first run writes only half the partitions, then "dies"
        r1 = cat.run_partitioned_job(df, "part_key", "snap-001", parts=parts[:2])
        assert set(r1["written"]) == set(parts[:2])
        # resume writes the rest, skips completed
        r2 = cat.run_partitioned_job(df, "part_key", "snap-002", parts=parts)
        assert set(r2["skipped"]) == set(parts[:2])
        assert set(r2["written"]) == set(parts[2:])
        # re-run is a full no-op
        r3 = cat.run_partitioned_job(df, "part_key", "snap-003", parts=parts)
        assert not r3["written"]
        # no duplicates: total rows in catalog == source rows
        assert cat.read().count() == df.count()
        snaps = cat.snapshots()
        assert [s["snapshot_id"] for s in snaps] == ["snap-001", "snap-002", "snap-003"]

    def test_bool_partition_keys_write_all_rows(self, spark, tmp_path):
        # regression: Python str(True) = 'True' but Spark's cast renders
        # 'true'; the old string-rendered pending filter matched nothing,
        # wrote no files, yet recorded the partition complete (0 rows) —
        # silent data loss that resume never repaired
        root = str(tmp_path / "catbool")
        df = spark.range(100).withColumn("flag", (F_col("id") % 2 == 0))
        cat = ParquetCatalog(spark, root)
        r1 = cat.run_partitioned_job(df, "flag", "snap-b1")
        assert set(r1["written"]) == {"true", "false"}
        assert cat.read().count() == 100
        # resume skips both engine-rendered keys
        r2 = cat.run_partitioned_job(df, "flag", "snap-b2")
        assert not r2["written"]
        assert set(r2["skipped"]) == {"true", "false"}

    def test_noncanonical_string_partition_keys_roundtrip(self, spark, tmp_path):
        # regression: partition-directory type inference re-typed a string
        # partition column from its directory names ('00' came back as int
        # 0), so the verification read-back rendered '0' != '00' and the
        # data-loss guard raised forever even though every row was written.
        # The read-back now pins df's own schema.
        from pyspark.sql import functions as F

        root = str(tmp_path / "catnoncanon")
        df = spark.range(20).withColumn(
            "part_key", F.lpad((F.col("id") % 10).cast("string"), 2, "0")
        )
        cat = ParquetCatalog(spark, root)
        r1 = cat.run_partitioned_job(df, "part_key", "snap-n1")
        assert set(r1["written"]) == {f"{i:02d}" for i in range(10)}
        assert cat.read().count() == 20
        # the PUBLIC read must also keep the original string keys: without
        # the pinned _schema.json, inference re-types '00'..'09' to int
        # 0..9 and distinct partitions become indistinguishable
        got_keys = {r["part_key"] for r in cat.read().select("part_key").distinct().collect()}
        assert got_keys == {f"{i:02d}" for i in range(10)}
        r2 = cat.run_partitioned_job(df, "part_key", "snap-n2")
        assert not r2["written"] and len(r2["skipped"]) == 10

    def test_empty_requested_partition_records_zero_rows(self, spark, tmp_path):
        root = str(tmp_path / "catempty")
        df = spark.range(10).withColumn("part_key", (F_col("id") % 2).cast("string"))
        cat = ParquetCatalog(spark, root)
        r1 = cat.run_partitioned_job(df, "part_key", "snap-e1", parts=["0", "1", "9"])
        assert set(r1["written"]) == {"0", "1", "9"}
        done = cat.completed_parts()
        assert "9" in done  # legitimately-empty partition has 0-row lineage
        assert cat.read().count() == 10


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


class TestStreaming:
    def test_available_now_incremental_matches_batch(self, spark, tmp_path):
        images_path = str(tmp_path / "images")
        out_path = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        synth.images_df(spark, "xs").write.parquet(images_path)
        q = incremental.incremental_extract(spark, images_path, out_path, ckpt)
        q.awaitTermination(300)
        got = spark.read.parquet(out_path)
        batch = extract.extract_points(spark.read.parquet(images_path), valid_only=True)
        assert got.count() == batch.count()
        # second run: checkpoint says nothing new -> no additional rows
        q2 = incremental.incremental_extract(spark, images_path, out_path, ckpt)
        q2.awaitTermination(300)
        assert spark.read.parquet(out_path).count() == batch.count()

    def test_windowed_event_counts(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = incremental.windowed_event_counts(ev).toPandas()
        assert out["n"].sum() == ev.count()

    def test_stateful_sessionization(self, spark, tmp_path):
        """applyInPandasWithState gap sessionizer: session event counts
        must cover every event exactly once (closed + running)."""
        import shutil

        ev_dir = tmp_path / "events"
        ev_dir.mkdir()
        shutil.copy("/root/testdata/sf0.001/events.parquet", ev_dir / "events.parquet")
        ev_path = "/root/testdata/sf0.001/events.parquet"
        out = str(tmp_path / "sessions")
        q = incremental.sessionize_stateful(
            spark, str(ev_dir), out, str(tmp_path / "ck"), gap_seconds=1800
        )
        q.awaitTermination(300)
        got = spark.read.parquet(out).toPandas()
        ev = spark.read.parquet(ev_path).toPandas()
        assert set(got["user_id"]) == set(ev["user_id"])
        # every event lands in exactly one session (closed or final running)
        assert got["n_events"].sum() == len(ev)
        # sessions respect the gap: recompute via pandas oracle for one user
        import pandas as pd

        u = int(ev["user_id"].iloc[0])
        ts = ev[ev.user_id == u].sort_values("ts")["ts"]
        gaps = (ts.diff() > pd.Timedelta(seconds=1800)).sum()
        assert len(got[got.user_id == u]) == gaps + 1


class TestFusedOperators:
    def test_tile_partials_equal_row_path(self, spark, points_sdf):
        from tiff_to_geojson_csv_json_format_converter_spark.operators import extract as ex

        images = synth.images_df(spark, "xs")
        fused = ex.extract_tile_partials(images, 12).toPandas().sort_values("tile_id").reset_index(drop=True)
        unf = tiling.tile_histogram(points_sdf, 12).toPandas().sort_values("tile_id").reset_index(drop=True)
        assert fused["tile_id"].tolist() == unf["tile_id"].tolist()
        assert fused["n_points"].tolist() == unf["n_points"].tolist()

    def test_zonal_fused_equals_row_path(self, spark, points_sdf):
        images = synth.images_df(spark, "xs")
        zf = zonal.zonal_stats_fused(images, [synth.GOLDEN_DELHI_RING], "p").toPandas().sort_values(["image_id", "band"]).reset_index(drop=True)
        zu = zonal.zonal_stats(points_sdf, [synth.GOLDEN_DELHI_RING], "p").toPandas().sort_values(["image_id", "band"]).reset_index(drop=True)
        assert zf["count"].tolist() == zu["count"].tolist()
        np.testing.assert_array_equal(zf["min"].to_numpy(), zu["min"].to_numpy())
        np.testing.assert_array_equal(zf["max"].to_numpy(), zu["max"].to_numpy())
        np.testing.assert_allclose(zf["mean"].to_numpy(), zu["mean"].to_numpy(), rtol=1e-12)
        np.testing.assert_allclose(zf["std_pop"].to_numpy(), zu["std_pop"].to_numpy(), rtol=1e-7, atol=1e-9)


class TestSinks:
    def test_geojson_feature_matches_reference_json(self, spark, points_sdf):
        """Feature strings must byte-equal the reference's
        json.dump(separators=(',',':')) of the rounded floats
        (completePixleOutput.py:99-128)."""
        sample = points_sdf.filter("band = 0").limit(200)
        got = [r[0] for r in sample.select(sinks.geojson_feature_col()).collect()]
        rows = sample.collect()
        for feat, r in zip(got, rows):
            want = json.dumps(
                {"type": "Feature",
                 "geometry": {"type": "Point",
                              "coordinates": [r["longitude"], r["latitude"], r["elevation"]]}},
                separators=(",", ":"),
            )
            assert feat == want, (feat, want)

    def test_feature_collection_envelope(self, spark, points_sdf):
        fc = sinks.geojson_feature_collection(points_sdf.limit(5), "img_x.tif", 256)
        doc = json.loads(fc)
        assert doc["type"] == "FeatureCollection"
        assert doc["metadata"]["geojson_points"] == 5
        assert len(doc["features"]) == 5

    def test_struct_of_arrays_json(self, spark, points_sdf):
        doc = json.loads(sinks.json_struct_of_arrays(points_sdf.limit(10), {"source_file": "x"}))
        assert set(doc["data"]) == {"longitude", "latitude", "elevation"}
        assert len(doc["data"]["longitude"]) == 10

    def test_struct_of_arrays_envelope_parity(self, spark, points_sdf):
        """Byte parity with the reference envelope (doesSamples.py:106-137):
        same metadata fields, same bounds over the SAMPLED points, arrays
        in deterministic pixel order, json.dumps(separators=(',',':'))."""
        img = points_sdf.filter("band = 0").select("image_id").first()["image_id"]
        pts = points_sdf.filter(points_sdf["image_id"] == img).filter("band = 0")
        # shuffle partitions on purpose: order must come from order_col
        got = sinks.json_struct_of_arrays(
            pts.repartition(7),
            {},
            source_file=f"{img}.tif",
            original_crs="EPSG:32643",
            original_dimensions=(32, 32),
            original_total_points=1024,
            sample_rate=1,
            nodata_value=None,
            order_col="pixel_idx",
        )
        rows = sorted(pts.collect(), key=lambda r: r["pixel_idx"])
        lon = np.array([r["longitude"] for r in rows])
        lat = np.array([r["latitude"] for r in rows])
        z = np.array([r["elevation"] for r in rows])
        want = json.dumps({
            "metadata": {
                "source_file": f"{img}.tif",
                "original_crs": "EPSG:32643",
                "output_crs": "EPSG:4326",
                "coordinate_system": "WGS84 (longitude, latitude)",
                "original_dimensions": [32, 32],
                "original_total_points": 1024,
                "frontend_points": len(rows),
                "sample_rate": 1,
                "nodata_value": None,
                "bounds": {
                    "min_longitude": float(lon.min()), "max_longitude": float(lon.max()),
                    "min_latitude": float(lat.min()), "max_latitude": float(lat.max()),
                    "min_elevation": float(z.min()), "max_elevation": float(z.max()),
                },
            },
            "data": {"longitude": lon.tolist(), "latitude": lat.tolist(),
                     "elevation": z.tolist()},
        }, separators=(",", ":"))
        assert got == want

    def test_distributed_geojson_docs_match_driver_assembly(self, spark, points_sdf):
        """The executor-side FeatureCollection builder must byte-equal the
        driver-assembled envelope for every image."""
        images = synth.images_df(spark, "xs")
        pts = points_sdf.filter("band = 0")
        docs = {r["image_id"]: r["doc"]
                for r in sinks.geojson_collection_docs(pts.repartition(5), images).collect()}
        img_meta = {r["image_id"]: r["w"] * r["h"]
                    for r in images.select("image_id", "w", "h").collect()}
        assert docs
        for image_id, doc in list(docs.items())[:3]:
            single = (pts.filter(pts["image_id"] == image_id)
                      .orderBy("pixel_idx").coalesce(1))
            want = sinks.geojson_feature_collection(
                single, image_id, img_meta[image_id])
            assert doc == want

    def test_write_geojson_per_image(self, spark, points_sdf, tmp_path):
        images = synth.images_df(spark, "xs")
        out = str(tmp_path / "gj")
        sinks.write_geojson_per_image(points_sdf.filter("band = 0"), images, out)
        files = glob.glob(os.path.join(out, "image_id=*", "part-*"))
        assert files
        doc = json.loads(open(files[0]).read())
        assert doc["type"] == "FeatureCollection"
        assert doc["metadata"]["geojson_points"] == len(doc["features"])

    def test_master_catalog(self, spark, points_sdf):
        images = synth.images_df(spark, "xs")
        cat = sinks.master_catalog(points_sdf, images)
        assert cat["type"] == "elevation_catalog"
        assert cat["total_files"] == len(cat["files"])
        # every source image is enumerated — all-NoData files included,
        # flagged has_valid_data=False with null bounds (doesSamples
        # catalogs every file)
        assert cat["total_files"] == images.count()
        empties = [f for f in cat["files"] if not f["has_valid_data"]]
        assert empties and all(f["frontend_points"] == 0 for f in empties)
        valid = [f for f in cat["files"] if f["has_valid_data"]]
        lo = min(f["bounds_wgs84"]["min_longitude"] for f in valid)
        assert cat["overall_bounds"]["min_x"] == lo


def test_stateful_sessions_cross_batch_continuity(spark, tmp_path):
    """Multi-batch streaming: state must carry a running session across
    batches (maxFilesPerTrigger=1 forces one file per micro-batch)."""
    import os
    import time as _time

    import pandas as pd

    from tiff_to_geojson_csv_json_format_converter_spark.streaming import incremental

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    mk = lambda eid, ts, uid: (eid, ts.to_pydatetime(), uid, "click", 1.0, "{}")
    ev_dir = str(tmp_path / "events"); os.makedirs(ev_dir)
    cols = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # file A: u1 two events 10 min apart; u2 one event
    spark.createDataFrame(
        [mk(1, t0, 1), mk(2, t0 + pd.Timedelta(seconds=600), 1), mk(3, t0, 2)], cols
    ).coalesce(1).write.parquet(f"{ev_dir}/a")
    # file B (newer mtime): u1 continues within gap; u2 returns after 2 h
    spark.createDataFrame(
        [mk(4, t0 + pd.Timedelta(seconds=1200), 1),
         mk(5, t0 + pd.Timedelta(seconds=7200), 2)], cols
    ).coalesce(1).write.parquet(f"{ev_dir}/b")
    now = _time.time()
    for sub, off in (("a", -60), ("b", 0)):
        for f in os.listdir(f"{ev_dir}/{sub}"):
            os.utime(f"{ev_dir}/{sub}/{f}", (now + off, now + off))
    q = incremental.sessionize_stateful(
        spark, f"{ev_dir}/*", str(tmp_path / "out"), str(tmp_path / "ck"),
        gap_seconds=1800, max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out")).toPandas()
    # u1's final snapshot merges events from BOTH batches into one session
    u1 = out[(out.user_id == 1) & (out.n_events == 3)]
    assert len(u1) == 1
    assert u1.iloc[0]["session_start"] == t0
    assert u1.iloc[0]["session_end"] == t0 + pd.Timedelta(seconds=1200)
    assert not u1.iloc[0]["closed"]
    # u2's first session closed by the >gap event in batch 2
    u2closed = out[(out.user_id == 2) & out.closed]
    assert len(u2closed) == 1 and u2closed.iloc[0]["n_events"] == 1
