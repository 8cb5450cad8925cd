"""Vectorized planar geometry: bbox algebra, point-in-polygon, buffers.

Replaces the reference's shapely usage (``shape``, ``.bounds``,
``.intersects``, ``.intersection``, ``.buffer`` — test2.py:107,275-280)
with numpy. The PIP test is even-odd ray casting with the same
center-containment semantics as ``rasterio.mask.mask(..., all_touched
=False)`` (test2.py:1272): a pixel belongs to the zone iff its CENTER
is inside the polygon.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

Ring = Sequence[tuple[float, float]]  # closed or open; normalized below


def close_ring(ring: Ring) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if r.ndim != 2 or r.shape[1] != 2 or r.shape[0] < 3:
        raise ValueError("ring must be (N>=3, 2)")
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def ring_bbox(ring: Ring) -> tuple[float, float, float, float]:
    r = close_ring(ring)
    return float(r[:, 0].min()), float(r[:, 1].min()), float(r[:, 0].max()), float(r[:, 1].max())


def bbox_intersects(a: tuple[float, float, float, float], b: tuple[float, float, float, float]) -> bool:
    """Rectangle-overlap test — the catalog/file prefilter the reference
    runs before any expensive mask (test2.py:94-110; the emitted JS
    ``findFilesInBounds`` at doesSamples.py:488-494)."""
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def points_in_ring(x: np.ndarray, y: np.ndarray, ring: Ring) -> np.ndarray:
    """Even-odd ray-casting PIP, vectorized over points.

    Points exactly on a horizontal edge follow the half-open rule
    (yi > y) != (yj > y), the standard crossing-number convention.
    """
    r = close_ring(ring)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xi, yi = r[:-1, 0], r[:-1, 1]
    xj, yj = r[1:, 0], r[1:, 1]
    inside = np.zeros(x.shape, dtype=bool)
    for k in range(len(xi)):
        cond = (yi[k] > y) != (yj[k] > y)
        if yi[k] == yj[k]:
            continue
        x_cross = (xj[k] - xi[k]) * (y - yi[k]) / (yj[k] - yi[k]) + xi[k]
        inside ^= cond & (x < x_cross)
    return inside


def points_in_polygon(x: np.ndarray, y: np.ndarray, rings: Sequence[Ring]) -> np.ndarray:
    """Polygon with optional holes: ring[0] = shell, ring[1:] = holes
    (even-odd over all rings)."""
    inside = points_in_ring(x, y, rings[0])
    for hole in rings[1:]:
        inside ^= points_in_ring(x, y, hole)
    return inside


def signed_area(ring: Ring) -> float:
    """Shoelace signed area: > 0 for counter-clockwise rings."""
    r = close_ring(ring)
    x, y = r[:, 0], r[:, 1]
    return float(0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def buffer_ring(ring: Ring, dist: float, miter_limit: float = 8.0) -> np.ndarray:
    """Outward polygon offset by per-edge normal translation + miter
    join — a true buffer for simple polygons, CONCAVE included (the
    engine analog of the reference's ``polygon.buffer(0.001)`` tolerance
    pad, test2.py:275-277).

    Each edge line is shifted ``dist`` along its outward normal
    (orientation from the shoelace sign); each new vertex is the
    intersection of its two adjacent offset lines. Near-parallel /
    reflex-spike joins beyond ``miter_limit`` fall back to the bevel
    point (vertex + averaged normal), bounding vertex excursion the way
    real offsetting libraries do. Not a full Minkowski buffer (no arc
    joins, no self-intersection cleanup) — exactly enough for the
    reference's use: absorbing boundary-precision noise, where dist is
    tiny relative to edge lengths."""
    r = close_ring(ring)[:-1]
    n = len(r)
    d = np.roll(r, -1, axis=0) - r  # edge i: r[i] -> r[i+1]
    length = np.linalg.norm(d, axis=1, keepdims=True)
    length[length == 0] = 1.0
    u = d / length
    # outward normal: right of travel for CCW rings, left for CW
    sign = 1.0 if signed_area(ring) > 0 else -1.0
    normals = np.stack([u[:, 1], -u[:, 0]], axis=1) * sign
    p_off = r + normals * dist  # a point on each offset edge line
    out = np.empty_like(r)
    for i in range(n):
        j = (i - 1) % n
        # intersect offset lines of edge j (prev) and edge i (next)
        pj, uj = p_off[j] + u[j] * 0.0, u[j]
        pi, ui = p_off[i], u[i]
        cross = uj[0] * ui[1] - uj[1] * ui[0]
        miter_ok = abs(cross) > 1e-12
        if miter_ok:
            t = ((pi[0] - pj[0]) * ui[1] - (pi[1] - pj[1]) * ui[0]) / cross
            cand = pj + uj * t
            if np.linalg.norm(cand - r[i]) <= abs(dist) * miter_limit:
                out[i] = cand
                continue
        nav = normals[j] + normals[i]
        nn = np.linalg.norm(nav)
        out[i] = r[i] + (nav / nn if nn > 1e-12 else normals[i]) * dist
    return close_ring(out)


def points_in_union(x: np.ndarray, y: np.ndarray,
                    polygons: Sequence[Sequence[Ring]]) -> np.ndarray:
    """TRUE geometric-union membership: a point is in the union iff it is
    inside ANY polygon (each polygon = shell + holes, even-odd within).

    This is the engine form of the reference's turf ``union`` of drawn
    regions before zonal stats (slope.js:406,427): union SEMANTICS for
    clipping and aggregation, computed WITHOUT constructing the merged
    geometry. Overlap-safe where stacking all rings into one even-odd
    polygon is not (a point covered by two overlapping shells XORs to
    "outside" there; it ORs to "inside" here). The merged ring set
    itself is a client-display concern in the reference and stays out
    of the engine.
    """
    inside = points_in_polygon(x, y, polygons[0])
    for rings in polygons[1:]:
        inside = inside | points_in_polygon(x, y, rings)
    return inside


def classify_cells_interior(cell_boxes: np.ndarray,
                            rings: Sequence[Ring]) -> np.ndarray:
    """For cover cells (rows of [min_lon, min_lat, max_lon, max_lat]),
    return True where the cell is WHOLLY inside the polygon — i.e. its
    points need no ray-cast at join time (the D3 interior-cell shortcut:
    exact work becomes O(boundary cells), not O(area)).

    Conservative and exact: a cell is interior iff all 4 corners are
    inside (even-odd over all rings, holes included) AND no ring edge's
    bbox overlaps the cell box. If no edge touches the cell, containment
    is uniform across it, so the corner verdict holds for every interior
    point; any edge-bbox overlap demotes the cell to boundary (PIP'd per
    point) — never wrong, only occasionally slower.
    """
    boxes = np.asarray(cell_boxes, dtype=np.float64).reshape(-1, 4)
    k = len(boxes)
    if k == 0:
        return np.zeros(0, dtype=bool)
    # edge bboxes over all rings (shell + holes)
    segs = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        a, b = r[:-1], r[1:]
        segs.append(np.column_stack([
            np.minimum(a[:, 0], b[:, 0]), np.minimum(a[:, 1], b[:, 1]),
            np.maximum(a[:, 0], b[:, 0]), np.maximum(a[:, 1], b[:, 1]),
        ]))
    e = np.vstack(segs)  # (E, 4)
    # cell x edge bbox overlap: (k, E)
    overlap = (
        (boxes[:, None, 0] <= e[None, :, 2]) & (boxes[:, None, 2] >= e[None, :, 0])
        & (boxes[:, None, 1] <= e[None, :, 3]) & (boxes[:, None, 3] >= e[None, :, 1])
    ).any(axis=1)
    corners_x = boxes[:, [0, 2, 0, 2]].ravel()
    corners_y = boxes[:, [1, 1, 3, 3]].ravel()
    inside = points_in_polygon(corners_x, corners_y, rings).reshape(k, 4).all(axis=1)
    return inside & ~overlap


def buffer_ring_centroid_quirk(ring: Ring, dist: float) -> np.ndarray:
    """The round-1 centroid-scaling shortcut, kept as a documented quirk:
    pushes each vertex away from the centroid. WRONG for concave shells
    (edges near reflex corners can move inward); use ``buffer_ring``."""
    r = close_ring(ring)[:-1]
    c = r.mean(axis=0)
    v = r - c
    norm = np.linalg.norm(v, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    out = r + v / norm * dist
    return close_ring(out)


def normalize_geometry(obj: Any) -> list[list[list[float]]]:
    """Normalize the reference's accepted geometry shapes (test2.py:256-272,
    get_raster_stats_direct.py:39-52) into a list of polygons, each a list
    of rings [[x, y], ...]:

    - GeoJSON Polygon / MultiPolygon geometry
    - GeoJSON Feature (takes .geometry)
    - GeoJSON FeatureCollection (FIRST feature only — reference quirk)
    - "Canvas format": a list ``[geometry_dict, bounds]``
    """
    if isinstance(obj, list):  # canvas format [geometry, bounds]
        if obj and isinstance(obj[0], dict):
            return normalize_geometry(obj[0])
        raise ValueError("unrecognized canvas geometry list")
    if not isinstance(obj, dict):
        raise ValueError(f"unrecognized geometry {type(obj)}")
    t = obj.get("type")
    if t == "FeatureCollection":
        feats = obj.get("features") or []
        if not feats:
            raise ValueError("empty FeatureCollection")
        return normalize_geometry(feats[0])  # first feature only (test2.py:258-262)
    if t == "Feature":
        return normalize_geometry(obj["geometry"])
    if t == "Polygon":
        return [[[float(p[0]), float(p[1])] for p in ring] for ring in obj["coordinates"]]
    if t == "MultiPolygon":
        # even-odd PIP over the flattened ring list preserves multipolygon
        # semantics for disjoint parts (the only kind the reference unions,
        # slope.js:404-427)
        out: list[list[list[float]]] = []
        for poly in obj["coordinates"]:
            out.extend([[float(p[0]), float(p[1])] for p in ring] for ring in poly)
        return out
    raise ValueError(f"unsupported geometry type {t!r}")


def center_sample_ring(raster_bounds: tuple, frac: float = 0.1) -> np.ndarray:
    """D5 compatibility op (test2.py:1246-1256): when a query polygon
    misses the raster entirely, the reference substitutes a square of
    side ``frac * min(width, height)`` at the raster center. Returns the
    closed 5-vertex ring with the reference's exact vertex order and
    arithmetic (center ± sample_size/2)."""
    min_x, min_y, max_x, max_y = (float(v) for v in raster_bounds)
    center_x = (min_x + max_x) / 2
    center_y = (min_y + max_y) / 2
    sample_size = min(max_x - min_x, max_y - min_y) * frac
    h = sample_size / 2
    return np.array([
        (center_x - h, center_y - h),
        (center_x + h, center_y - h),
        (center_x + h, center_y + h),
        (center_x - h, center_y + h),
        (center_x - h, center_y - h),
    ])
