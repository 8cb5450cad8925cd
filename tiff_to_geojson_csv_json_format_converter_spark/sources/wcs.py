"""A5: remote WCS/WMS coverage fetch — the reference's GeoServer ladder
(test2.py:286-992) with the network transport as an injected seam.

Everything EXCEPT the HTTP GET itself is implemented and tested offline:
URL construction for every rung of the reference's fallback ladder
(WCS 2.0.1 -> 1.1.1 -> 1.0.0 -> WMS 1.3.0 GetMap), response
classification (status + content-type, XML service exceptions rejected),
and the REST metadata -> original-file-path resolution. The transport is
a caller-supplied ``fetch(url) -> (status, content_type, body)``
callable: in production that's one line of requests/urllib; in this
sandbox (no network) the tests drive the ladder with canned responses.
Fetched coverage bytes feed the SAME decode pipeline as on-disk rasters
(sources/codecs.py) — which is why the engine treats a remote coverage
as just another ``bytes`` column at plan level.

Reference quirks preserved:

- WCS 2.0.1 axis naming depends on the CRS family: geographic coverages
  subset on ``Long``/``Lat``, projected ones on ``E``/``N``
  (test2.py:815-837).
- The clip bbox is padded by ``buffer`` on every side, at every rung.
- WCS 1.0.0 and WMS force a 1024x1024 output grid (test2.py:896-897,
  925-926).
- Layer names carry the ``useruploads`` workspace prefix.
- The REST store 'url' field may be file://-prefixed or relative to the
  GeoServer data dir; relative paths resolve against a candidate list
  with the GEOSERVER_DATA_DIR environment override first
  (test2.py:345-372).
"""

from __future__ import annotations

import os
from collections.abc import Callable

# fetch(url) -> (http_status, content_type, body_bytes)
Fetch = Callable[[str], tuple[int, str, bytes]]

DEFAULT_WORKSPACE = "useruploads"
GRID_SIZE = 1024  # the reference's fixed WCS-1.0.0 / WMS output grid


def getcoverage_urls(base_url: str, layer: str, bbox: tuple, *,
                     native_crs: str = "EPSG:4326", buffer: float = 0.001,
                     workspace: str = DEFAULT_WORKSPACE) -> list[tuple[str, str]]:
    """The full fallback ladder as (rung_name, url) pairs, in the order
    the reference tries them. ``bbox`` is (minx, miny, maxx, maxy)
    ALREADY in the native CRS (transform first — functions/projection.py
    covers the UTM<->WGS84 cases the reference used pyproj for)."""
    minx, miny, maxx, maxy = (float(v) for v in bbox)
    x0, x1 = minx - buffer, maxx + buffer
    y0, y1 = miny - buffer, maxy + buffer
    qualified = f"{workspace}:{layer}"
    if native_crs == "EPSG:4326":
        axis = (f"subset=Long({x0},{x1})&subset=Lat({y0},{y1})")
    else:
        # projected CRS: GeoServer names the axes E/N, not Long/Lat
        axis = (f"subset=E({x0},{x1})&subset=N({y0},{y1})")
    v201 = (
        f"{base_url}/wcs?service=WCS&version=2.0.1&request=GetCoverage&"
        f"coverageId={qualified}&{axis}&"
        f"format=image/geotiff&outputCRS={native_crs}"
    )
    v111 = (
        f"{base_url}/wcs?service=WCS&version=1.1.1&request=GetCoverage&"
        f"identifier={qualified}&"
        f"BoundingBox={x0},{y0},{x1},{y1},{native_crs}&"
        f"format=image/geotiff&GridCS={native_crs}&"
        f"GridType=urn:ogc:def:method:WCS:1.1:2dSimpleGrid"
    )
    v100 = (
        f"{base_url}/wcs?service=WCS&version=1.0.0&request=GetCoverage&"
        f"coverage={qualified}&bbox={x0},{y0},{x1},{y1}&"
        f"crs={native_crs}&response_crs={native_crs}&format=GeoTIFF&"
        f"width={GRID_SIZE}&height={GRID_SIZE}"
    )
    # WMS 1.3.0 bbox uses the CRS-DEFINED axis order: EPSG:4326 is
    # lat-first, projected CRSs are E,N. The reference sends lon-first
    # unconditionally (test2.py:920-929) — against a conformant server
    # that yields a rotated/blank image the ladder would ACCEPT as valid
    # coverage (silent wrong data, the one failure mode the ladder can't
    # see), so this rung deliberately deviates and follows the spec.
    if native_crs == "EPSG:4326":
        wms_bbox = f"{y0},{x0},{y1},{x1}"
    else:
        wms_bbox = f"{x0},{y0},{x1},{y1}"
    wms = (
        f"{base_url}/wms?service=WMS&version=1.3.0&request=GetMap&"
        f"layers={qualified}&bbox={wms_bbox}&"
        f"width={GRID_SIZE}&height={GRID_SIZE}&crs={native_crs}&"
        f"format=image/geotiff&styles="
    )
    return [("wcs-2.0.1", v201), ("wcs-1.1.1", v111),
            ("wcs-1.0.0", v100), ("wms-1.3.0", wms)]


def classify_response(rung: str, status: int, content_type: str,
                      body: bytes) -> bytes:
    """Accept or reject one rung's response, mirroring the reference's
    checks: HTTP 200 plus an image content-type (the 1.0.0 rung also
    accepts any '*tiff*' type); XML service-exception bodies are
    rejected so the ladder can fall through."""
    if status != 200:
        raise ValueError(f"{rung} failed with status {status}")
    ct = (content_type or "").lower()
    ok = ct.startswith("image/") or (rung == "wcs-1.0.0" and "tiff" in ct)
    if not ok:
        raise ValueError(f"{rung} returned non-image content: {content_type}")
    return body


def fetch_coverage(fetch: Fetch, base_url: str, layer: str, bbox: tuple, *,
                   native_crs: str = "EPSG:4326", buffer: float = 0.001,
                   workspace: str = DEFAULT_WORKSPACE) -> tuple[str, bytes]:
    """Walk the ladder until a rung yields raster bytes; return
    (rung_name, bytes). Raises RuntimeError listing every rung's failure
    when all four are exhausted — the reference's terminal error path."""
    errors = []
    for rung, url in getcoverage_urls(
        base_url, layer, bbox, native_crs=native_crs, buffer=buffer,
        workspace=workspace,
    ):
        try:
            status, content_type, body = fetch(url)
            return rung, classify_response(rung, status, content_type, body)
        except Exception as e:  # noqa: BLE001 — each rung falls through
            errors.append(f"{rung}: {e}")
    raise RuntimeError("all WCS/WMS rungs failed: " + "; ".join(errors))


def store_name_from_coverage(coverage_json: dict) -> str:
    """REST coverage metadata -> bare store name (the workspace prefix
    is stripped: 'useruploads:dem_store' -> 'dem_store')."""
    store = coverage_json.get("coverage", {}).get("store", {})
    name = store.get("name", "")
    if not name:
        raise ValueError("coverage metadata has no store name")
    return name.split(":", 1)[1] if ":" in name else name


def resolve_store_path(store_json: dict, data_dirs: list[str] | None = None,
                       exists: Callable[[str], bool] = os.path.exists) -> str:
    """REST coveragestore metadata -> local file path: strip the
    file://-style prefixes, then resolve relative paths against the
    GeoServer data-dir candidates (GEOSERVER_DATA_DIR environment
    override first). Returns the first existing path; a relative path
    that resolves nowhere is returned as-is (the reference continues
    with it, it 'might still work if we're in the right directory')."""
    url = store_json.get("coverageStore", {}).get("url", "")
    if not url:
        raise ValueError("store metadata has no url")
    if url.startswith("file://"):
        path = url[len("file://"):]
    elif url.startswith("file:"):
        path = url[len("file:"):]
    else:
        path = url
    if os.path.isabs(path):
        return path
    candidates = list(data_dirs or [])
    env_dir = os.getenv("GEOSERVER_DATA_DIR")
    if env_dir:
        candidates.insert(0, env_dir)
    for d in candidates:
        full = os.path.join(d, path)
        if exists(full):
            return full
    return path
