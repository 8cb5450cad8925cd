"""Baseline PNG codec in pure numpy + zlib — no image library needed.

Same engineering class as the TIFF subset in sources/codecs.py: the
container has no PIL/imageio, but PNG's baseline form is just zlib
stream + per-row byte filters, both fully specified (RFC 2083) and
implementable exactly. This is what de-stubs ``multimodal.decode_media``
for real image bytes (reference analog: the uint8 imagery handling,
test2.py:1024).

Scope (raises otherwise, so the poison-pill path stays honest):

- bit depths 8 and 16 (big-endian samples, the elevation-raster depth);
  color types 0 (gray), 2 (RGB), 3 (palette, depth 8), 4 (gray+alpha),
  6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth) on
  both encode and decode; CRC-verified chunks.
- interlaced (Adam7) and 1/2/4-bit images raise NotImplementedError;
  structurally broken bytes raise ValueError — corrupt media must be
  DETECTED, not mis-decoded.

Decode stays vectorized where the filter allows (None/Sub/Up rows are
numpy ops; Sub via per-lane cumsum mod 256). Average/Paeth rows carry a
genuine left-neighbor data dependency, so those run a per-row python
loop — acceptable because rows are short relative to the zlib cost, and
the decode runs inside Arrow-batched ``mapInPandas`` tasks where
per-item python is already the execution model.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    c = c.astype(np.int64)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Baseline PNG writer: uint8 input -> bit depth 8, uint16 input ->
    bit depth 16 (big-endian per spec). Shapes: (h, w) -> gray,
    (h, w, 2) -> gray+alpha, (h, w, 3) -> RGB, (h, w, 4) -> RGBA.
    ``filter_type`` (0-4) is applied to every scanline — the encoder
    exists to give the DECODER deterministic real bytes covering every
    filter path at both depths."""
    img = np.asarray(img)
    # accept either byte order: raster bytes naturally materialize as
    # '>u2' (PNG/GeoTIFF are big-endian on disk), which != np.uint16 on
    # little-endian hosts even though the VALUES are plain uint16
    if img.dtype.kind == "u" and img.dtype.itemsize == 2:
        depth = 16
    elif img.dtype.kind == "u" and img.dtype.itemsize == 1:
        depth = 8
    else:
        raise ValueError(f"unsupported dtype {img.dtype} (uint8/uint16)")
    if img.ndim == 2:
        color, ch = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        ch = img.shape[2]
        color = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    h, w = img.shape[:2]
    # PNG filters operate on raw scanline BYTES with a bytes-per-pixel
    # left offset — 16-bit samples go big-endian first, then filter
    if depth == 16:
        raw = img.astype(">u2").reshape(h, -1).view(np.uint8).reshape(h, -1)
    else:
        raw = img.reshape(h, w * ch)
    bpp = ch * (depth // 8)
    stride = raw.shape[1]
    prev = np.zeros(stride, dtype=np.uint8)
    lines = []
    for y in range(h):
        row = raw[y]
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            filt = row - ((left.astype(np.int64) + prev.astype(np.int64)) // 2).astype(np.uint8)
        else:
            filt = row - _paeth_predict(left, prev, upleft)
        lines.append(bytes([filter_type]) + filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> np.ndarray:
    """Decode baseline PNG bytes -> uint8 (depth 8) or uint16 (depth 16)
    array: (h, w) for gray, (h, w, c) otherwise (palette images expand
    to RGB)."""
    if len(buf) < 8 or buf[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(buf):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", buf[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"bad IHDR length {len(data)} (want 13)")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    w, h, depth, color, comp, fmethod, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    if depth not in (8, 16):
        raise NotImplementedError(f"bit depth {depth} not supported (8/16)")
    if color not in _CHANNELS:
        raise ValueError(f"bad color type {color}")
    if color == 3 and depth != 8:
        raise ValueError("palette images must be bit depth <= 8")
    if comp != 0 or fmethod != 0:
        raise ValueError("bad compression/filter method")
    ch = _CHANNELS[color]
    bpp = ch * (depth // 8)  # filters work on raw scanline BYTES
    try:
        data = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from None
    stride = w * bpp
    if len(data) != h * (1 + stride):
        raise ValueError(
            f"IDAT size {len(data)} != expected {h * (1 + stride)}"
        )
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, 1 + stride)
    fts = arr[:, 0]
    rows = arr[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(fts[y])
        row = rows[y]
        if ft == 0:
            rec = row.copy()
        elif ft == 1:
            # Sub: per-lane prefix sum mod 256 removes the left dependency
            rec = np.cumsum(
                row.reshape(-1, bpp).astype(np.int64), axis=0
            ).astype(np.uint8).reshape(-1)
        elif ft == 2:
            rec = row + prev
        elif ft == 3:
            rec = np.empty(stride, dtype=np.uint8)
            rec[:bpp] = row[:bpp] + prev[:bpp] // 2
            for x in range(bpp, stride):
                rec[x] = row[x] + (int(rec[x - bpp]) + int(prev[x])) // 2
        elif ft == 4:
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft} on row {y}")
        out[y] = rec
        prev = rec
    if depth == 16:
        img = (
            np.ascontiguousarray(out).view(">u2").astype(np.uint16)
            .reshape(h, w, ch)
        )
    else:
        img = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if ch == 1:
        return img[:, :, 0]
    return img


def luma_u8(img: np.ndarray) -> np.ndarray:
    """Deterministic integer luma for multi-channel images (Rec.601
    weights, integer floor) — the canonical 2D uint8 view the feature/
    resize kernels consume. Gray/gray+alpha use the gray channel
    directly; 16-bit samples take their high byte (the deterministic
    8-bit view of a 16-bit raster)."""
    if img.ndim == 2:
        out = img.astype(np.int64)
    elif img.shape[2] == 2:
        out = img[:, :, 0].astype(np.int64)
    else:
        r, g, b = (img[:, :, i].astype(np.int64) for i in range(3))
        out = (r * 299 + g * 587 + b * 114) // 1000
    if img.dtype == np.uint16:
        out >>= 8
    return out.astype(np.uint8)
