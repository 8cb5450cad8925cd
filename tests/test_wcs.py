"""A5 WCS/WMS fetch ladder (sources/wcs.py): URL contracts per rung and
CRS family, response classification, ladder fall-through, and REST
path resolution — the reference flow (test2.py:286-992) minus only the
HTTP transport, which is an injected callable driven here with canned
responses. The fetched bytes feed the in-repo TIFF decode."""

import numpy as np
import pytest

from tiff_to_geojson_csv_json_format_converter_spark.sources import codecs, wcs

BASE = "http://gs.example:8080/geoserver"
BBOX = (77.1, 28.1, 77.4, 28.4)


def test_url_ladder_geographic_axis_names():
    urls = dict(wcs.getcoverage_urls(BASE, "dem", BBOX, buffer=0.001))
    v201 = urls["wcs-2.0.1"]
    assert "coverageId=useruploads:dem" in v201
    assert f"subset=Long({77.1 - 0.001},{77.4 + 0.001})" in v201
    assert f"subset=Lat({28.1 - 0.001},{28.4 + 0.001})" in v201
    assert "outputCRS=EPSG:4326" in v201
    v111 = urls["wcs-1.1.1"]
    assert "identifier=useruploads:dem" in v111
    assert (f"BoundingBox={77.1 - 0.001},{28.1 - 0.001},"
            f"{77.4 + 0.001},{28.4 + 0.001},EPSG:4326") in v111
    assert "GridType=urn:ogc:def:method:WCS:1.1:2dSimpleGrid" in v111
    v100 = urls["wcs-1.0.0"]
    assert "coverage=useruploads:dem" in v100
    assert "format=GeoTIFF" in v100 and "width=1024&height=1024" in v100
    wms = urls["wms-1.3.0"]
    assert "request=GetMap" in wms and "styles=" in wms
    assert "width=1024&height=1024" in wms
    # WMS 1.3.0 + EPSG:4326 = LAT-FIRST bbox (CRS-defined axis order; a
    # deliberate spec-following deviation from the reference's
    # unconditional lon-first, test2.py:920-929)
    assert f"bbox={28.1 - 0.001},{77.1 - 0.001},{28.4 + 0.001},{77.4 + 0.001}" in wms


def test_url_ladder_projected_axis_names():
    """The reference's axis-naming quirk (test2.py:815-837): projected
    coverages subset on E/N, geographic ones on Long/Lat."""
    urls = dict(wcs.getcoverage_urls(
        BASE, "dem", (700000.0, 3100000.0, 701000.0, 3101000.0),
        native_crs="EPSG:32643", buffer=10.0,
    ))
    v201 = urls["wcs-2.0.1"]
    assert "subset=E(699990.0,701010.0)" in v201
    assert "subset=N(3099990.0,3101010.0)" in v201
    assert "Long(" not in v201 and "Lat(" not in v201
    assert "outputCRS=EPSG:32643" in v201
    # projected CRS keeps E,N (x-first) order in the WMS rung
    assert "bbox=699990.0,3099990.0,701010.0,3101010.0" in urls["wms-1.3.0"]


def _tiff_bytes():
    grid = np.arange(16, dtype=np.float32).reshape(4, 4)
    return codecs.encode_tiff(grid)


def test_ladder_first_rung_success():
    body = _tiff_bytes()
    calls = []

    def fetch(url):
        calls.append(url)
        return 200, "image/geotiff", body

    rung, got = wcs.fetch_coverage(fetch, BASE, "dem", BBOX)
    assert rung == "wcs-2.0.1" and got == body and len(calls) == 1
    # fetched bytes decode through the SAME in-repo raster codec path
    out = codecs.decode_tiff(got)
    np.testing.assert_array_equal(out.reshape(4, 4),
                                  np.arange(16, dtype=np.float32).reshape(4, 4))


def test_ladder_falls_through_xml_then_error_then_tiff_content_type():
    """Rung 1 returns an XML service exception, rung 2 a 404, rung 3
    succeeds with the 'tiff-in-content-type' acceptance only the 1.0.0
    rung has (test2.py:902-906)."""
    body = _tiff_bytes()
    responses = [
        (200, "application/xml", b"<ServiceExceptionReport/>"),
        (404, "text/html", b"not found"),
        (200, "application/x-tiff", body),
    ]
    calls = []

    def fetch(url):
        calls.append(url)
        return responses[len(calls) - 1]

    rung, got = wcs.fetch_coverage(fetch, BASE, "dem", BBOX)
    assert rung == "wcs-1.0.0" and got == body and len(calls) == 3


def test_ladder_exhaustion_lists_every_rung():
    def fetch(url):
        return 500, "text/plain", b"boom"

    with pytest.raises(RuntimeError) as ei:
        wcs.fetch_coverage(fetch, BASE, "dem", BBOX)
    msg = str(ei.value)
    for rung in ("wcs-2.0.1", "wcs-1.1.1", "wcs-1.0.0", "wms-1.3.0"):
        assert rung in msg


def test_non_tiff_content_rejected_on_non_v100_rungs():
    with pytest.raises(ValueError, match="non-image"):
        wcs.classify_response("wcs-2.0.1", 200, "application/x-tiff", b"x")
    assert wcs.classify_response("wcs-1.0.0", 200, "application/x-tiff", b"x") == b"x"


def test_store_name_strips_workspace_prefix():
    j = {"coverage": {"store": {"name": "useruploads:dem_store"}}}
    assert wcs.store_name_from_coverage(j) == "dem_store"
    assert wcs.store_name_from_coverage(
        {"coverage": {"store": {"name": "bare"}}}) == "bare"
    with pytest.raises(ValueError, match="no store name"):
        wcs.store_name_from_coverage({"coverage": {}})


def test_resolve_store_path_file_url_and_relative(tmp_path):
    abs_target = tmp_path / "data" / "dem.tif"
    abs_target.parent.mkdir()
    abs_target.write_bytes(b"x")
    # absolute file:// URL -> stripped
    j = {"coverageStore": {"url": f"file://{abs_target}"}}
    assert wcs.resolve_store_path(j) == str(abs_target)
    # relative path -> resolved against the first candidate dir that has it
    j = {"coverageStore": {"url": "data/dem.tif"}}
    got = wcs.resolve_store_path(j, data_dirs=[str(tmp_path / "nope"), str(tmp_path)])
    assert got == str(tmp_path / "data" / "dem.tif")
    # unresolvable relative path returned as-is (reference behavior)
    j = {"coverageStore": {"url": "missing/x.tif"}}
    assert wcs.resolve_store_path(j, data_dirs=[str(tmp_path)]) == "missing/x.tif"


def test_resolve_store_path_env_override(tmp_path, monkeypatch):
    target = tmp_path / "envdir" / "f.tif"
    target.parent.mkdir()
    target.write_bytes(b"x")
    monkeypatch.setenv("GEOSERVER_DATA_DIR", str(tmp_path / "envdir"))
    j = {"coverageStore": {"url": "f.tif"}}
    assert wcs.resolve_store_path(j, data_dirs=[str(tmp_path)]) == str(target)
