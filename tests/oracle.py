"""Single-process numpy oracle mirroring the reference converters
line-for-line (the "what to compute" ground truth the Spark engine is
checked against row-for-row).

Mirrors:
- grid explode + affine + float32 + reproject + round:
  /root/reference/completePixleOutput.py:41-68
- valid filter z > -1e30: /root/reference/willOnlyStoreValidPoints.py:64-95
- stride sampling: /root/reference/doesSamples.py:73-89,145-150
- zonal stats (population std, "Null" sentinel):
  /root/reference/get_raster_stats_clean.py:148-173

Unlike the engine, the oracle does everything the reference way: full
meshgrid first, transforms over ALL pixels, masks/sampling after —
so it also proves the engine's compute-only-sampled-pixels shortcut
is semantics-preserving.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tiff_to_geojson_csv_json_format_converter_spark.functions import geometry, projection
from tiff_to_geojson_csv_json_format_converter_spark.sources import codecs


def extract_image_points(
    img: dict,
    valid_only: bool = True,
    sample_cap: int | None = None,
    geojson_cap: int | None = None,
    round_output: bool = True,
) -> pd.DataFrame:
    """One image -> point rows, the reference way (full grid first)."""
    w, h, bands = img["w"], img["h"], img["band_count"]
    grid = codecs.decode(img["bytes"], img["fmt"], w, h * bands).reshape(bands, h, w)
    rows, cols = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")  # completePixleOutput.py:41
    rows_flat = rows.flatten()
    cols_flat = cols.flatten()
    a, b, c, d, e, f = (float(v) for v in img["transform"])
    x = c + a * (cols_flat + 0.5) + b * (rows_flat + 0.5)  # rasterio.transform.xy pixel centers
    y = f + d * (cols_flat + 0.5) + e * (rows_flat + 0.5)
    x = np.array(x, dtype=np.float32)  # completePixleOutput.py:50-52 float32 downcast
    y = np.array(y, dtype=np.float32)
    lon, lat = projection.to_wgs84(x.astype(np.float64), y.astype(np.float64), img["crs"])
    total = h * w
    pixel_idx = np.arange(total, dtype=np.int64)
    out = []
    for band in range(bands):
        z = grid[band].flatten().astype(np.float32)
        bl, bb, bz, bi = lon, lat, z, pixel_idx
        # stride sample over the FULL flattened grid, rate = total // cap
        # (doesSamples.py:73-89; rounding/sampling commute elementwise)
        if sample_cap is not None and total > sample_cap:
            sel = np.arange(0, total, total // sample_cap)
            bl, bb, bz, bi = bl[sel], bb[sel], bz[sel], bi[sel]
        if geojson_cap is not None and len(bi) > geojson_cap:  # doesSamples.py:145-150
            sel = np.arange(0, len(bi), len(bi) // geojson_cap)
            bl, bb, bz, bi = bl[sel], bb[sel], bz[sel], bi[sel]
        if valid_only:  # willOnlyStoreValidPoints.py:64-68
            mask = (bz > 0) if grid.dtype == np.uint8 else (bz > -1e30)
            bl, bb, bz, bi = bl[mask], bb[mask], bz[mask], bi[mask]
        if round_output:  # completePixleOutput.py:64-68
            bl = np.round(bl, 6)
            bb = np.round(bb, 6)
            bz = np.round(bz, 2)
        out.append(pd.DataFrame({
            "image_id": img["image_id"],
            "band": np.int32(band),
            "pixel_idx": bi,
            "longitude": np.asarray(bl, dtype=np.float64),
            "latitude": np.asarray(bb, dtype=np.float64),
            "elevation": np.asarray(bz, dtype=np.float64),
        }))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def extract_points(images: pd.DataFrame, **kw) -> pd.DataFrame:
    parts = [extract_image_points(img, **kw) for img in images.to_dict("records")]
    parts = [p for p in parts if len(p)]
    if not parts:
        return pd.DataFrame(columns=["image_id", "band", "pixel_idx", "longitude", "latitude", "elevation"])
    return pd.concat(parts, ignore_index=True)


def zonal_stats(points: pd.DataFrame, rings: list, polygon_id: str) -> pd.DataFrame:
    """Per (image, band) stats of points whose centers fall in the polygon
    — numpy population std (ddof=0), get_raster_stats_clean.py:163-170."""
    inside = geometry.points_in_polygon(
        points["longitude"].to_numpy(), points["latitude"].to_numpy(), rings
    )
    sub = points[inside]
    recs = []
    for (img, band), g in sub.groupby(["image_id", "band"]):
        z = g["elevation"].to_numpy()
        recs.append({
            "polygon_id": polygon_id, "image_id": img, "band": int(band),
            "min": float(z.min()), "max": float(z.max()),
            "mean": float(z.mean()), "std_pop": float(z.std()),
            "count": int(len(z)),
        })
    return pd.DataFrame(recs)
