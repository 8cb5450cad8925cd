"""Directory-of-TIFFs source: the reference's actual input mode (A1/A3).

``spark.read.format("binaryFile")`` scans the directory distributed
(each file one row: path, content); a mapInArrow pass parses the
GeoTIFF header (our pure-numpy codec) into the engine's images-table
shape. Mirrors the reference glob (.tif/.tiff any case, dedupe, sort —
completePixleOutput.py:174-176, test.py:221-226).

At 10^12 scale the binaryFile scan parallelizes by file; header parsing
touches only tag bytes per file.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from . import codecs, synth

TIFF_GLOB = "*.{tif,tiff,TIF,TIFF}"


def read_tiff_dir(spark, path: str, with_phash: bool = True):
    """Load a directory of GeoTIFFs as the engine images table.

    ``with_phash=False`` keeps the pass metadata-only: the perceptual
    hash is the one column that forces a FULL pixel decode per file
    (everything else reads header tags), so catalog-building scans over
    large archives should defer it (phash=0 placeholder; compute later
    via a dedicated pass over the ``bytes`` column where dedup needs
    it)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.[tT][iI][fF]*")
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterator) -> Iterator:
        import pyarrow as pa

        from .synth import ARROW_SCHEMA_DDL  # noqa: F401  (schema doc)

        for batch in batches:
            d = batch.to_pydict()
            rows = []
            for p, content in zip(d["path"], d["content"]):
                meta = codecs.decode_geotiff_meta(content)
                transform = meta["transform"] or (1.0, 0.0, 0.0, 0.0, -1.0, 0.0)
                crs = meta["crs"] or "EPSG:4326"
                w, h = meta["w"], meta["h"]
                a, b, c, dd, e, f = transform
                xs = np.array([c, c + a * w, c, c + a * w])
                ys = np.array([f, f, f + e * h, f + e * h])
                from ..functions import projection

                lon, lat = projection.to_wgs84(xs, ys, crs)
                image_id = os.path.basename(p)
                rows.append({
                    "image_id": image_id,
                    "bytes": content,
                    "w": w, "h": h, "fmt": "tiff",
                    "caption": image_id,
                    "phash": (synth.phash64(codecs.decode_tiff(content).astype(np.float64))
                              if with_phash else 0),
                    "transform": list(transform),
                    "crs": crs,
                    "nodata": meta["nodata"] if meta["nodata"] is not None else float(codecs.NODATA_F32),
                    "band_count": 1,
                    "min_lon": float(lon.min()), "min_lat": float(lat.min()),
                    "max_lon": float(lon.max()), "max_lat": float(lat.max()),
                })
            import pandas as pd

            pdf = pd.DataFrame(rows)
            target = pa.schema([
                ("image_id", pa.string()), ("bytes", pa.binary()),
                ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
                ("caption", pa.string()), ("phash", pa.int64()),
                ("transform", pa.list_(pa.float64())), ("crs", pa.string()),
                ("nodata", pa.float64()), ("band_count", pa.int32()),
                ("min_lon", pa.float64()), ("min_lat", pa.float64()),
                ("max_lon", pa.float64()), ("max_lat", pa.float64()),
            ])
            if rows:
                yield from pa.Table.from_pandas(pdf, preserve_index=False).cast(target).to_batches()

    out = df.mapInArrow(parse, synth.ARROW_SCHEMA_DDL)
    # dedupe + deterministic order (test.py:225-226 list(set(...)); sort())
    return out.dropDuplicates(["image_id"]).orderBy("image_id")


def write_tiff_dir(images_pdf, out_dir: str) -> list[str]:
    """Test helper: materialize synthetic images as real .tif files."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for img in images_pdf.to_dict("records"):
        grid = codecs.decode(img["bytes"], img["fmt"], img["w"], img["h"] * img["band_count"])
        arr = grid[: img["h"]]
        buf = codecs.encode_tiff(
            arr, transform=tuple(img["transform"]), crs=img["crs"], nodata=img["nodata"]
        )
        p = os.path.join(out_dir, f"{img['image_id']}.tif")
        with open(p, "wb") as f:
            f.write(buf)
        paths.append(p)
    return paths
