"""Uncompressed AVI (RIFF DIB) codec in pure numpy — no video library.

Completes the multimodal de-stubbing arc (png.py images, wav.py audio):
AVI's container layer is the same RIFF chunk grammar as WAV, and the
'DIB ' (uncompressed device-independent bitmap) codec stores each frame
as raw bottom-up BGR24 rows — both fully specified and implementable
exactly. With this, video rows decode and frame-sample through a REAL
container parse; only compressed codecs (H.264/VP9/...) remain
environment-constrained stubs.

Layout written/read (the canonical minimal player-compatible shape):

    RIFF 'AVI ' { LIST 'hdrl' { avih, LIST 'strl' { strh, strf } },
                  LIST 'movi' { '00db' <frame bytes> ... } }

Scope: 24-bit uncompressed frames (biCompression=0), one video stream;
structurally broken bytes raise ValueError, compressed streams raise
NotImplementedError — corrupt or unsupported media must be DETECTED.
"""

from __future__ import annotations

import struct

import numpy as np

from . import riff

_chunk = riff.chunk
_list = riff.list_chunk
_walk = riff.walk


def _row_stride(w: int) -> int:
    return (w * 3 + 3) & ~3  # BMP rows pad to 4-byte boundaries


def encode_avi(frames: np.ndarray, fps: int = 30) -> bytes:
    """Write uncompressed AVI: ``frames`` is uint8 (n, h, w, 3) RGB (or
    (n, h, w) gray, stored as equal BGR channels). Each frame becomes a
    '00db' DIB chunk: bottom-up rows, BGR order, 4-byte row padding."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 3:
        if f.shape[-1] in (3, 4):
            # almost certainly a single RGB(A) frame, NOT a gray clip of
            # 3px-wide frames — silently encoding it as one would produce
            # garbage dimensions; demand the explicit 4-D form
            raise ValueError(
                f"ambiguous 3-D input {frames.shape}: pass (n, h, w) gray "
                f"clips, or (1, h, w, 3) for a single RGB frame"
            )
        f = np.repeat(f[:, :, :, None], 3, axis=3)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError(f"unsupported frames shape {frames.shape}")
    n, h, w, _ = f.shape
    stride = _row_stride(w)
    frame_bytes = []
    for img in f:
        bgr = img[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
        if stride == w * 3:
            raw = bgr.tobytes()
        else:
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, : w * 3] = bgr.reshape(h, w * 3)
            raw = padded.tobytes()
        frame_bytes.append(raw)
    frame_size = stride * h
    # avih flags stay 0: we write no idx1 chunk, so AVIF_HASINDEX would
    # promise an index that does not exist
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1), frame_size * fps, 0, 0, n, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    # spec AVISTREAMHEADER: fccType, fccHandler, dwFlags, wPriority,
    # wLanguage, dwInitialFrames, dwScale, dwRate, dwStart, dwLength,
    # dwSuggestedBufferSize, dwQuality, dwSampleSize (8 dwords after
    # wLanguage), then rcFrame — 56 bytes total
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                      frame_size, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                       0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", fb) for fb in frame_bytes))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _parse_avi(buf: bytes) -> tuple[int, int, bool, list[tuple[int, int]]]:
    """Container walk WITHOUT decoding pixels: validates structure and
    returns (w, h, topdown, [(frame_payload_pos, len), ...]) — the index
    the frame SAMPLER needs, so striding a long video touches only the
    sampled frames' bytes. ``topdown`` reflects the DIB height sign:
    negative biHeight means rows are stored top-down (no flip)."""
    end = riff.header(buf, b"AVI ", "AVI")
    w = h = None
    bitcount = compression = None
    frames: list[tuple[int, int]] = []
    for tag, ltype, p, ln in _walk(buf, 12, end):
        if tag == b"LIST" and ltype == b"hdrl":
            for t2, lt2, p2, ln2 in _walk(buf, p, p + ln):
                if t2 == b"LIST" and lt2 == b"strl":
                    for t3, _lt3, p3, ln3 in _walk(buf, p2, p2 + ln2):
                        if t3 == b"strf":
                            if ln3 < 40:
                                raise ValueError("bad strf (BITMAPINFOHEADER)")
                            (_sz, w, h, _planes, bitcount, compression
                             ) = struct.unpack("<IiiHHI", buf[p3:p3 + 20])
        elif tag == b"LIST" and ltype == b"movi":
            for t2, _lt2, p2, ln2 in _walk(buf, p, p + ln):
                if t2 in (b"00db", b"00dc"):
                    frames.append((p2, ln2))
    if w is None or not frames:
        raise ValueError("missing stream format or frames")
    if compression != 0 or bitcount != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit DIB frames supported "
            f"(got biCompression={compression}, {bitcount}-bit)"
        )
    topdown = int(h) < 0
    w, h = int(w), abs(int(h))
    stride = _row_stride(w)
    for i, (_p2, ln2) in enumerate(frames):
        if ln2 != stride * h:
            raise ValueError(f"frame {i}: size {ln2} != expected {stride * h}")
    return w, h, topdown, frames


def _decode_frame(buf: bytes, pos: int, ln: int, w: int, h: int,
                  topdown: bool = False) -> np.ndarray:
    stride = _row_stride(w)
    rows = np.frombuffer(buf[pos:pos + ln], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not topdown:
        bgr = bgr[::-1]  # positive biHeight = bottom-up rows -> flip
    return bgr[:, :, ::-1]  # BGR -> RGB


def decode_avi(buf: bytes) -> np.ndarray:
    """Decode uncompressed AVI bytes -> uint8 (n_frames, h, w, 3) RGB."""
    w, h, topdown, frames = _parse_avi(buf)
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, (p2, ln2) in enumerate(frames):
        out[i] = _decode_frame(buf, p2, ln2, w, h, topdown)
    return out


def sample_avi_frames(buf: bytes, every_n: int) -> list[tuple[int, np.ndarray]]:
    """Stride-sample frames WITHOUT decoding the skipped ones: one
    container walk builds the frame index, then only every ``every_n``-th
    frame's bytes are touched. Returns [(frame_idx, (h, w, 3) RGB), ...]."""
    w, h, topdown, frames = _parse_avi(buf)
    return [
        (i, _decode_frame(buf, frames[i][0], frames[i][1], w, h, topdown))
        for i in range(0, len(frames), max(every_n, 1))
    ]


def first_frame(buf: bytes) -> np.ndarray:
    """Decode ONLY the first frame — O(1) in clip length (one container
    walk for the index, one frame's bytes touched). The shape
    ``decode_media`` needs: features/resize over a video row must not
    pay O(n_frames) decode for a representative frame."""
    w, h, topdown, frames = _parse_avi(buf)
    return _decode_frame(buf, frames[0][0], frames[0][1], w, h, topdown)
