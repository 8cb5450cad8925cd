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


def _chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _row_stride(w: int) -> int:
    return (w * 3 + 3) & ~3  # BMP rows pad to 4-byte boundaries


def encode_avi(frames: np.ndarray, fps: int = 30) -> bytes:
    """Write uncompressed AVI: ``frames`` is uint8 (n, h, w, 3) RGB (or
    (n, h, w) gray, stored as equal BGR channels). Each frame becomes a
    '00db' DIB chunk: bottom-up rows, BGR order, 4-byte row padding."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 3:
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
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1), frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, n, frame_size, 0, 0, 0)
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


def _walk(buf: bytes, pos: int, end: int):
    """Yield (tag, list_type_or_None, payload_start, payload_len)."""
    while pos + 8 <= end:
        tag = buf[pos:pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        if pos + 8 + length > end:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"LIST":
            yield tag, buf[pos + 8:pos + 12], pos + 12, length - 4
        else:
            yield tag, None, pos + 8, length
        pos += 8 + length + (length & 1)


def _parse_avi(buf: bytes) -> tuple[int, int, list[tuple[int, int]]]:
    """Container walk WITHOUT decoding pixels: validates structure and
    returns (w, h, [(frame_payload_pos, len), ...]) — the index the
    frame SAMPLER needs, so striding a long video touches only the
    sampled frames' bytes."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI magic")
    (riff_size,) = struct.unpack("<I", buf[4:8])
    if riff_size + 8 > len(buf):
        raise ValueError("truncated RIFF payload")
    w = h = None
    bitcount = compression = None
    frames: list[tuple[int, int]] = []
    for tag, ltype, p, ln in _walk(buf, 12, 8 + riff_size):
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
    w, h = int(w), abs(int(h))
    stride = _row_stride(w)
    for i, (_p2, ln2) in enumerate(frames):
        if ln2 != stride * h:
            raise ValueError(f"frame {i}: size {ln2} != expected {stride * h}")
    return w, h, frames


def _decode_frame(buf: bytes, pos: int, ln: int, w: int, h: int) -> np.ndarray:
    stride = _row_stride(w)
    rows = np.frombuffer(buf[pos:pos + ln], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB


def decode_avi(buf: bytes) -> np.ndarray:
    """Decode uncompressed AVI bytes -> uint8 (n_frames, h, w, 3) RGB."""
    w, h, frames = _parse_avi(buf)
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, (p2, ln2) in enumerate(frames):
        out[i] = _decode_frame(buf, p2, ln2, w, h)
    return out


def sample_avi_frames(buf: bytes, every_n: int) -> list[tuple[int, np.ndarray]]:
    """Stride-sample frames WITHOUT decoding the skipped ones: one
    container walk builds the frame index, then only every ``every_n``-th
    frame's bytes are touched. Returns [(frame_idx, (h, w, 3) RGB), ...]."""
    w, h, frames = _parse_avi(buf)
    return [
        (i, _decode_frame(buf, frames[i][0], frames[i][1], w, h))
        for i in range(0, len(frames), max(every_n, 1))
    ]
