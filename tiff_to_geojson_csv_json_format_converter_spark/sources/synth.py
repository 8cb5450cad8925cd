"""Deterministic synthetic images+captions table (FIXTURES.md T1/T2).

Reproduces the reference's own fixture recipe — ``create_demo_data`` in
``/root/reference/__pycache__/tiff_processor_enhanced.cpython-310.pyc``
(linspace grid, sin/cos elevation surface + seeded noise, UTM CRS) — as
a seeded, distributed Spark generator. Everything derives from
``(SEED, image_index)``; no time/os randomness anywhere, so the table
is bit-identical across runs, partitionings and cluster sizes.

Schema (input_hint + geo sidecar folded in):
  image_id:string, bytes:binary, w:int, h:int, fmt:string,
  caption:string, phash:long, transform:array<double>[6], crs:string,
  nodata:double, band_count:int, min_lon/min_lat/max_lon/max_lat:double

Spatial layout is deliberately SKEWED: ~80 % of images cluster inside
the reference's golden Delhi polygon bbox (77.0-77.5 E, 28.0-28.5 N,
slope.js:158-167), the rest spread over 70-90 E / 20-35 N — so salted
repartitioning and AQE skew handling are actually exercised.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from ..functions import projection
from . import codecs

SEED = 42
NODATA = float(codecs.NODATA_F32)

# (n_images, [sizes]) per named scale
SCALES = {
    "xs": (32, [16]),
    "s": (256, [16, 64]),
    "m": (2048, [64, 256]),
}

_GOLDEN = np.float64((np.sqrt(5) - 1) / 2)

ARROW_SCHEMA_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, transform array<double>, crs string, nodata double, "
    "band_count int, min_lon double, min_lat double, max_lon double, max_lat double"
)


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def phash64(grid: np.ndarray) -> int:
    """64-bit perceptual hash: resize to 32x32 (block mean), 2-D DCT,
    top-left 8x8 (minus DC) vs median -> bits."""
    g = np.nan_to_num(np.asarray(grid, dtype=np.float64), nan=0.0)
    g = np.where(g <= -1e30, 0.0, g)
    h, w = g.shape
    ry = np.linspace(0, h, 33).astype(int)
    rx = np.linspace(0, w, 33).astype(int)
    small = np.add.reduceat(np.add.reduceat(g, ry[:-1], axis=0), rx[:-1], axis=1)
    # reduceat yields ONE element for an empty slice (images smaller than
    # 32px upsample), so the per-axis divisor is max(len, 1) — a flat
    # 0->1 clamp on the product divided a multi-column sum by 1
    cnt = np.outer(np.maximum(np.diff(ry), 1), np.maximum(np.diff(rx), 1))
    small = small / cnt
    d = _DCT32 @ small @ _DCT32.T
    block = d[:8, :8].flatten()[1:]
    med = np.median(block)
    bits = (block > med).astype(np.uint64)
    out = np.uint64(0)
    for b in bits:
        out = (out << np.uint64(1)) | b
    return int(out.astype(np.int64))


def image_params(i: int, n_images: int, sizes: list[int]) -> dict:
    """Pure per-image parameters: placement, size, fmt, crs, validity mode."""
    size = sizes[i % len(sizes)]
    in_cluster = (i % 5) != 0  # 80 % dense cluster
    # low-discrepancy placement (golden-ratio sequence, fully deterministic)
    u = float((i * _GOLDEN) % 1.0)
    v = float((i * _GOLDEN * _GOLDEN * 7.0) % 1.0)
    pixel_deg = 0.002
    span = size * pixel_deg
    if in_cluster:
        lon0 = 77.0 + u * (0.5 - span)
        lat1 = 28.0 + v * (0.5 - span) + span  # top edge
    else:
        lon0 = 70.0 + u * (20.0 - span)
        lat1 = 20.0 + v * (15.0 - span) + span
    if i % 8 == 5:
        crs = "EPSG:32643" if lon0 < 78.0 else "EPSG:32644"
    elif i % 8 == 6:
        crs = "EPSG:32644" if lon0 >= 78.0 else "EPSG:32643"
    else:
        crs = "EPSG:4326"
    band_count = 3 if i % 16 == 11 else 1
    if i % 5 == 4:
        fmt = "raw_u8"
    elif band_count > 1:
        fmt = "raw_f32"
    else:
        fmt = ["raw_f32", "npy", "tiff"][i % 3]
    if i % 16 == 7:
        valid_mode = "empty"  # all-NoData early-exit path (willOnlyStoreValidPoints.py:74-95)
    elif i % 16 == 3:
        valid_mode = "sparse"  # <10 % valid (test.py:94 sparsity classifier)
    elif i % 4 == 0:
        valid_mode = "full"  # 100 % valid
    else:
        valid_mode = "dense"
    if crs == "EPSG:4326":
        transform = (pixel_deg, 0.0, lon0, 0.0, -pixel_deg, lat1)
    else:
        ex, ny = projection.from_wgs84(np.array([lon0]), np.array([lat1]), crs)
        # ~0.002 deg at these latitudes ≈ 200 m easting step
        transform = (200.0, 0.0, float(ex[0]), 0.0, -200.0, float(ny[0]))
    return {
        "size": size, "fmt": fmt, "crs": crs, "band_count": band_count,
        "valid_mode": valid_mode, "transform": transform,
        "lon0": lon0, "lat1": lat1, "span": span,
    }


def make_grid(i: int, p: dict) -> np.ndarray:
    """(band_count, h, w) pixel grid; float32 surface or uint8 imagery."""
    size = p["size"]
    rng = np.random.default_rng([SEED, i])
    r, c = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    base = (
        500.0 * np.sin(0.05 * c + i * 0.1) * np.cos(0.07 * r - i * 0.05)
        + 1000.0
        + rng.normal(0.0, 5.0, (size, size))
    )
    bands = [base + 100.0 * b for b in range(p["band_count"])]
    grid = np.stack(bands).astype(np.float32)
    if p["fmt"] == "raw_u8":
        lo, hi = grid.min(), grid.max()
        g8 = np.clip((grid - lo) / max(hi - lo, 1e-9) * 255.0, 0, 255).astype(np.uint8)
        if p["valid_mode"] == "empty":
            g8[:] = 0
        elif p["valid_mode"] == "sparse":
            g8[:, rng.random((size, size)) > 0.05] = 0
        elif p["valid_mode"] == "dense":
            g8[:, rng.random((size, size)) < 0.10] = 0
        return g8
    if p["valid_mode"] == "empty":
        grid[:] = codecs.NODATA_F32
    elif p["valid_mode"] == "sparse":
        grid[:, rng.random((size, size)) > 0.05] = codecs.NODATA_F32
    elif p["valid_mode"] == "dense":
        grid[:, rng.random((size, size)) < 0.10] = codecs.NODATA_F32
    return grid


def wgs84_bbox(p: dict) -> tuple[float, float, float, float]:
    size = p["size"]
    a, b, c_, d, e, f = p["transform"]
    xs = np.array([c_, c_ + a * size, c_, c_ + a * size])
    ys = np.array([f, f, f + e * size, f + e * size])
    lon, lat = projection.to_wgs84(xs, ys, p["crs"])
    return float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max())


def generate_pandas(ids: np.ndarray, n_images: int, sizes: list[int]) -> pd.DataFrame:
    rows = []
    for i in (int(v) for v in ids):
        p = image_params(i, n_images, sizes)
        grid = make_grid(i, p)
        flat = grid.reshape(-1, grid.shape[-1])  # (bands*h, w) stacked
        buf = codecs.encode(flat, p["fmt"])
        bbox = wgs84_bbox(p)
        clon = (bbox[0] + bbox[2]) / 2.0
        clat = (bbox[1] + bbox[3]) / 2.0
        rows.append({
            "image_id": f"img_{i:08d}",
            "bytes": buf,
            "w": p["size"],
            "h": p["size"],
            "fmt": p["fmt"],
            "caption": f"elevation tile {i} near ({clat:.2f},{clon:.2f})",
            "phash": phash64(grid[0]),
            "transform": list(p["transform"]),
            "crs": p["crs"],
            "nodata": 0.0 if p["fmt"] == "raw_u8" else NODATA,
            "band_count": p["band_count"],
            "min_lon": bbox[0], "min_lat": bbox[1],
            "max_lon": bbox[2], "max_lat": bbox[3],
        })
    return pd.DataFrame(rows)


def images_df(spark, scale: str = "xs", n_images: int | None = None, num_partitions: int | None = None):
    """Distributed generation: spark.range -> mapInArrow. Each task
    generates its own id range — the generator scales linearly with
    executors and never funnels data through the driver."""
    n, sizes = SCALES[scale]
    if n_images is not None:
        n = n_images
    parts = num_partitions or max(8, n // 64)

    def gen(batches: Iterator) -> Iterator:
        import pyarrow as pa

        target = pa.schema([
            ("image_id", pa.string()), ("bytes", pa.binary()),
            ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
            ("caption", pa.string()), ("phash", pa.int64()),
            ("transform", pa.list_(pa.float64())), ("crs", pa.string()),
            ("nodata", pa.float64()), ("band_count", pa.int32()),
            ("min_lon", pa.float64()), ("min_lat", pa.float64()),
            ("max_lon", pa.float64()), ("max_lat", pa.float64()),
        ])
        for batch in batches:
            ids = batch.column("id").to_numpy()
            pdf = generate_pandas(ids, n, sizes)
            tbl = pa.Table.from_pandas(pdf, preserve_index=False).cast(target)
            yield from tbl.to_batches()

    return spark.range(0, n, numPartitions=parts).mapInArrow(gen, ARROW_SCHEMA_DDL)


# --- T3: polygons ------------------------------------------------------------

GOLDEN_DELHI_RING = [[77.0, 28.0], [77.5, 28.0], [77.5, 28.5], [77.0, 28.5], [77.0, 28.0]]


def polygons() -> list[dict]:
    """Deterministic clip/query polygons (FIXTURES.md T3): the reference's
    golden Delhi box (slope.js:158-167), a miss-everything box (the
    "Null"-sentinel path, test2.py:1463-1473), a partial-overlap box,
    a convex pentagon, a concave polygon, and a polygon with a hole."""
    return [
        {"polygon_id": "poly_0000", "rings": [GOLDEN_DELHI_RING]},
        {"polygon_id": "poly_0001", "rings": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]},
        {"polygon_id": "poly_0002", "rings": [[[77.2, 28.2], [77.3, 28.2], [77.3, 28.3], [77.2, 28.3], [77.2, 28.2]]]},
        {"polygon_id": "poly_0003", "rings": [[[77.1, 28.05], [77.4, 28.1], [77.45, 28.3], [77.25, 28.45], [77.05, 28.3], [77.1, 28.05]]]},
        {"polygon_id": "poly_0004", "rings": [[[77.0, 28.0], [77.5, 28.0], [77.5, 28.5], [77.25, 28.1], [77.0, 28.5], [77.0, 28.0]]]},
        {"polygon_id": "poly_0005", "rings": [
            [[77.0, 28.0], [77.5, 28.0], [77.5, 28.5], [77.0, 28.5], [77.0, 28.0]],
            [[77.2, 28.2], [77.3, 28.2], [77.3, 28.3], [77.2, 28.3], [77.2, 28.2]],
        ]},
        {"polygon_id": "poly_0006", "rings": [[[70.0, 20.0], [90.0, 20.0], [90.0, 35.0], [70.0, 35.0], [70.0, 20.0]]]},
    ]


def polygons_df(spark):
    import json
    rows = []
    for p in polygons():
        shell = np.asarray(p["rings"][0])
        rows.append((
            p["polygon_id"],
            json.dumps({"type": "Polygon", "coordinates": p["rings"]}),
            float(shell[:, 0].min()), float(shell[:, 1].min()),
            float(shell[:, 0].max()), float(shell[:, 1].max()),
        ))
    return spark.createDataFrame(
        rows,
        "polygon_id string, geojson string, min_lon double, min_lat double, max_lon double, max_lat double",
    )


# --- T4: kNN query points ----------------------------------------------------

def knn_queries(n: int = 64) -> pd.DataFrame:
    """Mix of on-center, between-pixel, outside-all-data and in-hole
    probes (FIXTURES.md T4)."""
    rows = []
    for k in range(n):
        u = float((k * _GOLDEN) % 1.0)
        v = float((k * _GOLDEN * 3.0) % 1.0)
        if k % 8 == 6:
            lon, lat = -120.0 + u, 40.0 + v  # far outside all data
        elif k % 2 == 0:
            lon, lat = 77.0 + u * 0.5, 28.0 + v * 0.5  # dense cluster
        else:
            lon, lat = 70.0 + u * 20.0, 20.0 + v * 15.0
        rows.append({"query_id": f"q_{k:04d}", "lon": lon, "lat": lat, "k": 1 if k % 3 else 4})
    return pd.DataFrame(rows)
