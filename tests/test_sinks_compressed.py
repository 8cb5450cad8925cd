"""A9 compressed-sink goldens: the engine's per-image gzip CSV / NPZ /
gzip JSON / compact-grid / readme outputs must match a reference-shaped
local implementation (thiswillcompress.py:55-160 semantics: native-CRS
x/y, float32 downcast THEN 2-dp round, ALL pixels, compact separators)
byte-for-byte on the decompressed content."""

import gzip
import io
import json

import numpy as np
import pandas as pd
import pytest

from tiff_to_geojson_csv_json_format_converter_spark.functions import affine
from tiff_to_geojson_csv_json_format_converter_spark.operators import sinks
from tiff_to_geojson_csv_json_format_converter_spark.sources import codecs, synth


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("compressed"))
    images = synth.images_df(spark, "xs").limit(3)
    manifest = sinks.write_compressed_outputs(images, out_dir).toPandas()
    meta = images.select(
        "image_id", "bytes", "w", "h", "fmt", "transform", "crs", "nodata"
    ).toPandas()
    return manifest, meta


def _reference_arrays(row):
    """The reference script's own numpy pipeline, re-run locally."""
    grid = codecs.decode(row["bytes"], row["fmt"], row["w"], row["h"])
    rows_flat, cols_flat = np.divmod(np.arange(row["h"] * row["w"]), row["w"])
    x, y = affine.pixel_to_world(tuple(row["transform"]), rows_flat, cols_flat)
    xr = np.round(x.astype(np.float32), 2)
    yr = np.round(y.astype(np.float32), 2)
    zr = np.round(grid.reshape(-1).astype(np.float32), 2)
    return xr, yr, zr


def test_manifest_covers_all_formats(outputs):
    manifest, meta = outputs
    assert set(manifest["format"]) == set(sinks.COMPRESSED_FORMATS)
    assert set(manifest["image_id"]) == set(meta["image_id"])
    assert (manifest["n_bytes"] > 0).all()


def test_csv_gz_bytes_match_reference_to_csv(outputs):
    manifest, meta = outputs
    for _, r in meta.iterrows():
        xr, yr, zr = _reference_arrays(r)
        want = pd.DataFrame({"x": xr, "y": yr, "z": zr}).to_csv(
            index=False, float_format="%.2f"
        ).encode()
        p = manifest[(manifest.image_id == r["image_id"]) & (manifest.format == "csv")]["path"].iloc[0]
        got = gzip.open(p, "rb").read()
        assert got == want, r["image_id"]


def test_json_gz_matches_reference_doc(outputs):
    manifest, meta = outputs
    for _, r in meta.iterrows():
        xr, yr, zr = _reference_arrays(r)
        nodata = None if pd.isna(r["nodata"]) else float(r["nodata"])
        want = json.dumps({
            "meta": {"file": r["image_id"], "crs": r["crs"],
                     "dims": [int(r["w"]), int(r["h"])],
                     "nodata": nodata, "count": len(xr)},
            "x": xr.tolist(), "y": yr.tolist(), "z": zr.tolist(),
        }, separators=(",", ":")).encode()
        p = manifest[(manifest.image_id == r["image_id"]) & (manifest.format == "json")]["path"].iloc[0]
        assert gzip.open(p, "rb").read() == want, r["image_id"]


def test_compact_grid_matches_reference_doc(outputs):
    manifest, meta = outputs
    for _, r in meta.iterrows():
        _, _, zr = _reference_arrays(r)
        nodata = None if pd.isna(r["nodata"]) else float(r["nodata"])
        want = json.dumps({
            "meta": {"file": r["image_id"], "crs": r["crs"],
                     "width": int(r["w"]), "height": int(r["h"]),
                     "transform": [float(v) for v in r["transform"]],
                     "nodata": nodata},
            "elevation_grid": zr.reshape(r["h"], r["w"]).tolist(),
        }, separators=(",", ":")).encode()
        p = manifest[(manifest.image_id == r["image_id"]) & (manifest.format == "compact")]["path"].iloc[0]
        assert gzip.open(p, "rb").read() == want, r["image_id"]


def test_npz_roundtrips_reference_arrays(outputs):
    manifest, meta = outputs
    for _, r in meta.iterrows():
        xr, yr, zr = _reference_arrays(r)
        p = manifest[(manifest.image_id == r["image_id"]) & (manifest.format == "npz")]["path"].iloc[0]
        with np.load(p, allow_pickle=True) as z:
            np.testing.assert_array_equal(z["x"], xr)
            np.testing.assert_array_equal(z["y"], yr)
            np.testing.assert_array_equal(z["z"], zr)
            md = z["metadata"].item()
            assert md["source_file"] == r["image_id"]
            assert md["dimensions"] == [int(r["w"]), int(r["h"])]


def test_readme_contract(outputs):
    manifest, meta = outputs
    for _, r in meta.iterrows():
        p = manifest[(manifest.image_id == r["image_id"]) & (manifest.format == "readme")]["path"].iloc[0]
        txt = open(p).read()
        assert txt.startswith(f"Elevation data for {r['image_id']}\n")
        assert f"Coordinate system: {r['crs']}" in txt
        assert "Ultra-compact grid format" in txt


def test_gzip_bytes_are_deterministic(spark, tmp_path):
    """Two runs must produce identical bytes (mtime=0 in the gzip header
    — the documented deviation from the reference's wall-clock mtime)."""
    images = synth.images_df(spark, "xs").limit(1)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = sinks.write_compressed_outputs(images, d1, formats=("csv", "json")).toPandas()
    m2 = sinks.write_compressed_outputs(images, d2, formats=("csv", "json")).toPandas()
    for f in ("csv", "json"):
        p1 = m1[m1.format == f]["path"].iloc[0]
        p2 = m2[m2.format == f]["path"].iloc[0]
        assert open(p1, "rb").read() == open(p2, "rb").read()
