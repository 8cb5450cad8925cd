"""Converter API + TIFF-directory source parity tests: real .tif files
on disk -> binaryFile scan -> full pipeline -> reference-shaped outputs."""

import json
import os

import numpy as np
import pytest

from tests import oracle
from tiff_to_geojson_csv_json_format_converter_spark.api import Converter
from tiff_to_geojson_csv_json_format_converter_spark.sources import codecs, synth, tiff_dir


@pytest.fixture(scope="module")
def images_pdf():
    n, sizes = synth.SCALES["xs"]
    pdf = synth.generate_pandas(np.arange(n), n, sizes)
    # GeoTIFF PixelScale form requires single-band axis-aligned images
    return pdf[pdf["band_count"] == 1].reset_index(drop=True)


@pytest.fixture(scope="module")
def tiff_directory(images_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("tiffs")
    tiff_dir.write_tiff_dir(images_pdf, str(d))
    return str(d)


class TestGeoTiff:
    def test_geotiff_metadata_roundtrip(self):
        rng = np.random.default_rng(9)
        arr = rng.normal(1000, 100, (20, 30)).astype(np.float32)
        tr = (0.002, 0.0, 77.25, 0.0, -0.002, 28.375)
        buf = codecs.encode_tiff(arr, transform=tr, crs="EPSG:32643", nodata=float(codecs.NODATA_F32))
        assert np.array_equal(codecs.decode_tiff(buf), arr)
        meta = codecs.decode_geotiff_meta(buf)
        assert meta["w"] == 30 and meta["h"] == 20
        assert meta["transform"] == pytest.approx(tr)
        assert meta["crs"] == "EPSG:32643"
        assert meta["nodata"] == pytest.approx(float(codecs.NODATA_F32))

    def test_geographic_crs_key(self):
        arr = np.zeros((4, 4), dtype=np.uint8)
        buf = codecs.encode_tiff(arr, transform=(1.0, 0, 0, 0, -1.0, 0), crs="EPSG:4326")
        assert codecs.decode_geotiff_meta(buf)["crs"] == "EPSG:4326"


class TestTiffDirSource:
    def test_scan_parses_all_files(self, spark, tiff_directory, images_pdf):
        df = tiff_dir.read_tiff_dir(spark, tiff_directory)
        got = df.toPandas().sort_values("image_id").reset_index(drop=True)
        assert len(got) == len(images_pdf)
        assert got["image_id"].tolist() == sorted(f"{i}.tif" for i in images_pdf["image_id"])
        # metadata parsed back identically
        want = images_pdf.sort_values("image_id").reset_index(drop=True)
        np.testing.assert_allclose(
            np.stack(got["transform"].to_numpy()), np.stack(want["transform"].to_numpy())
        )
        assert got["crs"].tolist() == want["crs"].tolist()

    def test_extraction_from_disk_matches_oracle(self, spark, tiff_directory, images_pdf):
        """Full file-to-points parity: real .tif files through binaryFile
        must yield the same points as the in-memory table."""
        from tiff_to_geojson_csv_json_format_converter_spark.operators import extract

        df = tiff_dir.read_tiff_dir(spark, tiff_directory)
        got = extract.extract_points(df, valid_only=True).toPandas()
        got["image_id"] = got["image_id"].str.replace(".tif", "", regex=False)
        want = oracle.extract_points(images_pdf, valid_only=True)
        got = got.sort_values(["image_id", "band", "pixel_idx"]).reset_index(drop=True)
        want = want.sort_values(["image_id", "band", "pixel_idx"]).reset_index(drop=True)
        assert len(got) == len(want)
        for c in ["longitude", "latitude", "elevation"]:
            np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


class TestConverter:
    def test_convert_valid_mode_outputs(self, spark, tmp_path):
        conv = Converter.from_synthetic(spark, "xs")
        res = conv.convert(str(tmp_path / "out"), mode="valid")
        assert res["catalog"]["total_files"] > 0
        assert res["geojson_files"]
        # a geojson file parses and has the reference envelope shape
        with open(res["geojson_files"][0]) as f:
            doc = json.load(f)
        assert doc["type"] == "FeatureCollection"
        assert doc["features"][0]["geometry"]["type"] == "Point"
        # all-NoData images got info files instead of geojson
        infos = [p for p in os.listdir(tmp_path / "out") if p.endswith(".info.txt")]
        assert infos

    def test_analyze_contract(self, spark):
        conv = Converter.from_synthetic(spark, "xs")
        out = conv.analyze().toPandas()
        assert {"valid_percentage", "has_valid_data", "data_sparsity"} <= set(out.columns)
        assert (out[~out["has_valid_data"]]["valid_pixels"] == 0).all()

    def test_zonal_response_contract(self, spark):
        conv = Converter.from_synthetic(spark, "xs")
        resp = json.loads(conv.zonal_response(
            {"type": "Polygon", "coordinates": [synth.GOLDEN_DELHI_RING]}, "slope"
        ))
        assert resp["status"] == "success" and resp["layer"] == "slope"
        assert "band_1" in resp["min_max"]


class TestCsvByteParity:
    def test_csv_lines_match_pandas_to_csv(self, spark, images_pdf):
        """A7: the engine's CSV rows must byte-equal what the reference
        writes via df.to_csv(float_format='%.6f') (doesSamples.py:101)."""
        import io

        from pyspark.sql import functions as F

        from tests import oracle
        from tiff_to_geojson_csv_json_format_converter_spark.operators import extract, sinks

        one = images_pdf[images_pdf["image_id"] == "img_00000000"]
        sdf = synth.images_df(spark, "xs").filter(F.col("image_id") == "img_00000000")
        pts = extract.extract_points(sdf, valid_only=True).filter("band = 0")
        got = [r[0] for r in pts.orderBy("pixel_idx").select(sinks.csv_line_col()).collect()]
        want_pts = oracle.extract_points(one, valid_only=True)
        want_pts = want_pts[want_pts["band"] == 0].sort_values("pixel_idx")
        buf = io.StringIO()
        want_pts[["longitude", "latitude", "elevation"]].to_csv(
            buf, index=False, float_format="%.6f", header=False
        )
        want = buf.getvalue().splitlines()
        assert got == want


class TestCli:
    def test_cli_analyze_synthetic(self, spark, capsys):
        # reuse the running session via getOrCreate inside the CLI
        from tiff_to_geojson_csv_json_format_converter_spark import cli

        rc = cli.main(["analyze", "--synthetic", "xs"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        doc = json.loads(out)
        assert doc["files"] == 32
