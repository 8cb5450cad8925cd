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
- ``q8``/``q16`` — LOSSY linear min/max quantization with exact NoData
  (the input_hint's PSNR>=40dB decoded-pixel gate needs a lossy format;
  q8 measures ~50 dB, q16 ~96 dB — both gated in tests)

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
# Tag ids (TIFF 6.0 + GeoTIFF 1.1 + GDAL specs, all public):
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
_T_MODEL_PIXEL_SCALE = 33550   # GeoTIFF: (sx, sy, sz) doubles
_T_MODEL_TIEPOINT = 33922      # GeoTIFF: (i, j, k, x, y, z) doubles
_T_GEO_KEYS = 34735            # GeoTIFF: GeoKeyDirectory shorts
_T_GDAL_NODATA = 42113         # GDAL: ASCII nodata value

_SF_UINT = 1
_SF_IEEEFP = 3

# GeoKey ids
_GK_MODEL_TYPE = 1024          # 1=projected, 2=geographic
_GK_GEOGRAPHIC_TYPE = 2048     # EPSG geographic CS (4326)
_GK_PROJECTED_TYPE = 3072      # EPSG projected CS (326xx)

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}  # BYTE, ASCII, SHORT, LONG, DOUBLE


def encode_tiff(
    arr: np.ndarray,
    transform: tuple | None = None,
    crs: str | None = None,
    nodata: float | None = None,
) -> bytes:
    """Encode a 2-D uint8/float32 array as a minimal baseline (Geo)TIFF.

    With ``transform``/``crs``/``nodata`` set, writes the GeoTIFF tags
    (ModelPixelScale, ModelTiepoint, GeoKeyDirectory) and GDAL's nodata
    tag — the same metadata rasterio reads as ``dataset.transform``,
    ``dataset.crs``, ``dataset.nodata`` (test.py:291-298). Only
    axis-aligned transforms (b = d = 0) are representable this way.
    """
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.float32:
        bits, sfmt = 32, _SF_IEEEFP
    elif arr.dtype == np.uint8:
        bits, sfmt = 8, _SF_UINT
    else:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    h, w = arr.shape
    pixel_bytes = arr.tobytes()

    tags: list[tuple[int, int, int, object]] = [
        (_T_WIDTH, 3, 1, w),
        (_T_HEIGHT, 3, 1, h),
        (_T_BITS, 3, 1, bits),
        (_T_COMPRESSION, 3, 1, 1),
        (_T_PHOTOMETRIC, 3, 1, 1),
        (_T_STRIP_OFFSETS, 4, 1, None),  # patched after layout
        (_T_SAMPLES_PER_PIXEL, 3, 1, 1),
        (_T_ROWS_PER_STRIP, 3, 1, h),
        (_T_STRIP_BYTE_COUNTS, 4, 1, len(pixel_bytes)),
        (_T_SAMPLE_FORMAT, 3, 1, sfmt),
    ]
    if transform is not None:
        a, b, c, d, e, f = (float(v) for v in transform)
        if b != 0.0 or d != 0.0:
            raise ValueError("GeoTIFF PixelScale form requires axis-aligned transform")
        tags.append((_T_MODEL_PIXEL_SCALE, 12, 3, struct.pack("<3d", a, -e, 0.0)))
        tags.append((_T_MODEL_TIEPOINT, 12, 6, struct.pack("<6d", 0.0, 0.0, 0.0, c, f, 0.0)))
    if crs is not None:
        epsg = int(crs.split(":")[1])
        if crs.upper().startswith("EPSG:4326") or epsg == 4326:
            keys = [(
                _GK_MODEL_TYPE, 0, 1, 2), (_GK_GEOGRAPHIC_TYPE, 0, 1, 4326)]
        else:
            keys = [(_GK_MODEL_TYPE, 0, 1, 1), (_GK_PROJECTED_TYPE, 0, 1, epsg)]
        shorts = [1, 1, 0, len(keys)]
        for k in keys:
            shorts.extend(k)
        tags.append((_T_GEO_KEYS, 3, len(shorts), struct.pack(f"<{len(shorts)}H", *shorts)))
    if nodata is not None:
        s = (repr(float(nodata)) + "\x00").encode("ascii")
        tags.append((_T_GDAL_NODATA, 2, len(s), s))

    tags.sort(key=lambda t: t[0])  # TIFF requires ascending tag order
    n = len(tags)
    ifd_offset = 8
    ext_offset = ifd_offset + 2 + n * 12 + 4  # external tag data starts here
    ext_chunks: list[bytes] = []
    entries = []
    for tag, typ, count, value in tags:
        size = _TYPE_SIZES[typ] * count
        if isinstance(value, bytes):
            if size <= 4:
                packed = value.ljust(4, b"\x00")
                entries.append(struct.pack("<HHI", tag, typ, count) + packed)
            else:
                entries.append(struct.pack("<HHII", tag, typ, count, ext_offset))
                ext_chunks.append(value)
                ext_offset += len(value)
        else:
            entries.append((tag, typ, count, value))  # patched numeric below
    data_offset = ext_offset
    out = io.BytesIO()
    out.write(struct.pack("<2sHI", b"II", 42, ifd_offset))
    out.write(struct.pack("<H", n))
    for e in entries:
        if isinstance(e, bytes):
            out.write(e)
        else:
            tag, typ, count, value = e
            if tag == _T_STRIP_OFFSETS:
                value = data_offset
            out.write(struct.pack("<HHII", tag, typ, count, value))
    out.write(struct.pack("<I", 0))  # next IFD
    for chunk in ext_chunks:
        out.write(chunk)
    out.write(pixel_bytes)
    return out.getvalue()


def _parse_tiff_tags(buf: bytes) -> dict[int, tuple[int, int, int]]:
    order, magic, ifd_offset = struct.unpack_from("<2sHI", buf, 0)
    if order != b"II" or magic != 42:
        raise ValueError("not a little-endian TIFF")
    (n,) = struct.unpack_from("<H", buf, ifd_offset)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tag, typ, count, value = struct.unpack_from("<HHII", buf, ifd_offset + 2 + i * 12)
        tags[tag] = (typ, count, value)
    return tags


def _tag_scalar(tags, tag, default=None):
    if tag not in tags:
        return default
    typ, count, value = tags[tag]
    if _TYPE_SIZES[typ] * count <= 4 and typ == 3:
        return value & 0xFFFF
    return value


def _tag_data(buf: bytes, tags, tag) -> bytes | None:
    if tag not in tags:
        return None
    typ, count, value = tags[tag]
    size = _TYPE_SIZES[typ] * count
    if size <= 4:
        # value field holds the bytes inline (stored little-endian)
        return struct.pack("<I", value)[:size]
    return buf[value:value + size]


def decode_tiff(buf: bytes) -> np.ndarray:
    """Decode pixel data from the baseline TIFF subset."""
    tags = _parse_tiff_tags(buf)
    w = _tag_scalar(tags, _T_WIDTH)
    h = _tag_scalar(tags, _T_HEIGHT)
    bits = _tag_scalar(tags, _T_BITS, 8)
    sfmt = _tag_scalar(tags, _T_SAMPLE_FORMAT, _SF_UINT)
    if _tag_scalar(tags, _T_COMPRESSION, 1) != 1:
        raise ValueError("compressed TIFF not supported")
    off = _tag_scalar(tags, _T_STRIP_OFFSETS)
    count = _tag_scalar(tags, _T_STRIP_BYTE_COUNTS)
    dtype = np.float32 if (bits == 32 and sfmt == _SF_IEEEFP) else np.uint8
    return np.frombuffer(buf, dtype=dtype, count=count // np.dtype(dtype).itemsize, offset=off).reshape(h, w)


def decode_geotiff_meta(buf: bytes) -> dict:
    """Parse GeoTIFF metadata: the engine analog of rasterio's
    ``dataset.transform`` / ``.crs`` / ``.nodata`` / dimensions
    (test.py:291-298). Returns dict(w, h, transform, crs, nodata)."""
    tags = _parse_tiff_tags(buf)
    out: dict = {
        "w": _tag_scalar(tags, _T_WIDTH),
        "h": _tag_scalar(tags, _T_HEIGHT),
        "transform": None, "crs": None, "nodata": None,
    }
    scale = _tag_data(buf, tags, _T_MODEL_PIXEL_SCALE)
    tie = _tag_data(buf, tags, _T_MODEL_TIEPOINT)
    if scale and tie:
        sx, sy, _sz = struct.unpack("<3d", scale)
        _i, _j, _k, x0, y0, _z0 = struct.unpack("<6d", tie[:48])
        out["transform"] = (sx, 0.0, x0, 0.0, -sy, y0)
    geo = _tag_data(buf, tags, _T_GEO_KEYS)
    if geo:
        shorts = struct.unpack(f"<{len(geo) // 2}H", geo)
        nkeys = shorts[3]
        for k in range(nkeys):
            kid, _loc, _cnt, val = shorts[4 + 4 * k: 8 + 4 * k]
            if kid == _GK_GEOGRAPHIC_TYPE and val == 4326:
                out["crs"] = "EPSG:4326"
            elif kid == _GK_PROJECTED_TYPE:
                out["crs"] = f"EPSG:{val}"
    nod = _tag_data(buf, tags, _T_GDAL_NODATA)
    if nod:
        out["nodata"] = float(nod.split(b"\x00")[0].decode("ascii"))
    return out


# --- dispatch ---------------------------------------------------------------

def encode_quant(arr: np.ndarray, bits: int) -> bytes:
    """LOSSY quantized codec (``q8``/``q16``): linear min/max quantization
    of the valid pixels to ``bits``-bit codes, NoData kept exact.

    This is the engine's stand-in for lossy raster compression (the
    input_hint's PSNR>=40dB gate needs a lossy format to gate): header
    ``<2d`` (vmin, vmax) then one code per pixel; code 0 is reserved for
    the NODATA_F32 sentinel so NoData survives bit-exact, data codes are
    1..2^bits-1. Worst-case quantization PSNR is ~6.02*bits dB minus
    range slack — q8 lands ~48-50 dB on full-range grids, comfortably
    above the 40 dB gate, and q16 is transparent (~96 dB).
    """
    a = np.asarray(arr, dtype=np.float64)
    valid = a > float(NODATA_F32) / 2  # sentinel is hugely negative
    vmin = float(a[valid].min()) if valid.any() else 0.0
    vmax = float(a[valid].max()) if valid.any() else 0.0
    maxcode = (1 << bits) - 1
    span = (vmax - vmin) or 1.0
    codes = np.zeros(a.shape, dtype=np.uint8 if bits == 8 else np.uint16)
    # quantize VALID lanes only: running the scale over the -3.4e38
    # sentinel would overflow the float->int64 cast (platform-defined)
    scaled = np.rint((a[valid] - vmin) / span * (maxcode - 1)).astype(np.int64) + 1
    codes[valid] = np.clip(scaled, 1, maxcode).astype(codes.dtype)
    return struct.pack("<2d", vmin, vmax) + codes.tobytes()


def decode_quant(buf: bytes, w: int, h: int, bits: int) -> np.ndarray:
    vmin, vmax = struct.unpack_from("<2d", buf, 0)
    dtype = np.uint8 if bits == 8 else np.uint16
    maxcode = (1 << bits) - 1
    codes = np.frombuffer(buf, dtype=dtype, count=w * h, offset=16).reshape(h, w)
    span = (vmax - vmin) or 1.0
    out = vmin + (codes.astype(np.float64) - 1) / (maxcode - 1) * span
    out = out.astype(np.float32)
    out[codes == 0] = NODATA_F32
    return out


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
    if fmt == "q8":
        return encode_quant(arr, 8)
    if fmt == "q16":
        return encode_quant(arr, 16)
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
    if fmt == "q8":
        return decode_quant(buf, w, h, 8)
    if fmt == "q16":
        return decode_quant(buf, w, h, 16)
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
