"""Pure-numpy raster codecs for the ``bytes`` column of the images table.

The environment has no rasterio/PIL, so the engine carries its own
minimal encoders/decoders for the formats the synthetic table uses:

- ``raw_f32``  — C-order float32 pixels, no header (shape from w/h cols)
- ``raw_u8``   — C-order uint8 pixels, no header (the WMS-imagery dtype
  the reference handles at test2.py:1024)
- ``npy``      — the NumPy .npy container
- ``tiff``     — a baseline little-endian TIFF subset: single IFD,
  one strip, uncompressed, 1 band, float32 or uint8 (honors the
  reference's TIFF identity: rasterio ``dataset.read(1)`` at
  completePixleOutput.py:21-23 maps to ``decode(bytes, fmt)`` here)

Everything is vectorized numpy; these run inside Arrow-batched pandas
UDFs on executors (never per-row Python object churn beyond the
per-image loop, matching the reference's per-file loop granularity).
"""

from __future__ import annotations

import io
import struct

import numpy as np

NODATA_F32 = np.float32(-3.4028235e38)  # reference NoData sentinel (willOnlyStoreValidPoints.py:66-68)

# --- TIFF subset -----------------------------------------------------------
# Tag ids (TIFF 6.0 spec, public):
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTE_COUNTS = 279
_T_SAMPLE_FORMAT = 339

_SF_UINT = 1
_SF_IEEEFP = 3


def encode_tiff(arr: np.ndarray) -> bytes:
    """Encode a 2-D uint8/float32 array as a minimal baseline TIFF."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.float32:
        bits, sfmt = 32, _SF_IEEEFP
    elif arr.dtype == np.uint8:
        bits, sfmt = 8, _SF_UINT
    else:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    h, w = arr.shape
    pixel_bytes = arr.tobytes()
    tags = [
        (_T_WIDTH, 3, 1, w),
        (_T_HEIGHT, 3, 1, h),
        (_T_BITS, 3, 1, bits),
        (_T_COMPRESSION, 3, 1, 1),
        (_T_PHOTOMETRIC, 3, 1, 1),
        (_T_STRIP_OFFSETS, 4, 1, 0),  # patched below
        (_T_SAMPLES_PER_PIXEL, 3, 1, 1),
        (_T_ROWS_PER_STRIP, 3, 1, h),
        (_T_STRIP_BYTE_COUNTS, 4, 1, len(pixel_bytes)),
        (_T_SAMPLE_FORMAT, 3, 1, sfmt),
    ]
    n = len(tags)
    ifd_offset = 8
    data_offset = ifd_offset + 2 + n * 12 + 4
    out = io.BytesIO()
    out.write(struct.pack("<2sHI", b"II", 42, ifd_offset))
    out.write(struct.pack("<H", n))
    for tag, typ, count, value in tags:
        if tag == _T_STRIP_OFFSETS:
            value = data_offset
        out.write(struct.pack("<HHII", tag, typ, count, value))
    out.write(struct.pack("<I", 0))  # next IFD
    out.write(pixel_bytes)
    return out.getvalue()


def decode_tiff(buf: bytes) -> np.ndarray:
    """Decode the baseline TIFF subset written by :func:`encode_tiff`."""
    order, magic, ifd_offset = struct.unpack_from("<2sHI", buf, 0)
    if order != b"II" or magic != 42:
        raise ValueError("not a little-endian TIFF")
    (n,) = struct.unpack_from("<H", buf, ifd_offset)
    tags: dict[int, int] = {}
    for i in range(n):
        tag, _typ, _count, value = struct.unpack_from("<HHII", buf, ifd_offset + 2 + i * 12)
        if tag in (_T_WIDTH, _T_HEIGHT):
            value &= 0xFFFF
        elif tag in (_T_BITS, _T_COMPRESSION, _T_SAMPLE_FORMAT):
            value &= 0xFFFF
        tags[tag] = value
    w, h = tags[_T_WIDTH], tags[_T_HEIGHT]
    bits = tags.get(_T_BITS, 8)
    sfmt = tags.get(_T_SAMPLE_FORMAT, _SF_UINT)
    if tags.get(_T_COMPRESSION, 1) != 1:
        raise ValueError("compressed TIFF not supported")
    off = tags[_T_STRIP_OFFSETS]
    count = tags[_T_STRIP_BYTE_COUNTS]
    dtype = np.float32 if (bits == 32 and sfmt == _SF_IEEEFP) else np.uint8
    return np.frombuffer(buf, dtype=dtype, count=count // np.dtype(dtype).itemsize, offset=off).reshape(h, w)


# --- dispatch ---------------------------------------------------------------

def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw_f32":
        return np.ascontiguousarray(arr, dtype=np.float32).tobytes()
    if fmt == "raw_u8":
        return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()
    if fmt == "npy":
        out = io.BytesIO()
        np.save(out, np.ascontiguousarray(arr))
        return out.getvalue()
    if fmt == "tiff":
        return encode_tiff(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode ``bytes`` -> 2-D ndarray (h, w). The engine's analog of
    ``rasterio.open(path); dataset.read(1)`` (completePixleOutput.py:21-23)."""
    if fmt == "raw_f32":
        return np.frombuffer(buf, dtype=np.float32, count=w * h).reshape(h, w)
    if fmt == "raw_u8":
        return np.frombuffer(buf, dtype=np.uint8, count=w * h).reshape(h, w)
    if fmt == "npy":
        return np.load(io.BytesIO(buf))
    if fmt == "tiff":
        return decode_tiff(buf)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    """PSNR between two decoded grids (input_hint gate: >=40 dB for lossy)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    if peak is None:
        peak = float(max(np.abs(a).max(), np.abs(b).max(), 1e-12))
    return 10.0 * np.log10(peak * peak / mse)
