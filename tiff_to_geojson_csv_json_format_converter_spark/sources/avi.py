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

Scope: one video stream, two codecs — 24-bit uncompressed DIB frames
(biCompression=0) and, since the in-repo JPEG codec landed, MJPEG
(biCompression='MJPG': each frame chunk is a baseline JPEG, decoded by
sources/jpeg.py — the classic motion-JPEG layout). Other compressions
raise NotImplementedError; structurally broken bytes raise ValueError —
corrupt or unsupported media must be DETECTED.
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


_MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian


def encode_avi(frames: np.ndarray, fps: int = 30, codec: str = "DIB",
               quality: int = 90) -> bytes:
    """Write AVI: ``frames`` is uint8 (n, h, w, 3) RGB (or (n, h, w)
    gray, stored as equal BGR channels). ``codec='DIB'`` stores raw
    bottom-up BGR '00db' chunks (lossless); ``codec='MJPG'`` stores one
    baseline JPEG per '00dc' chunk (motion-JPEG — lossy, PSNR-gated in
    tests, typically 10-30x smaller)."""
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
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"unsupported codec {codec!r} (DIB/MJPG)")
    n, h, w, _ = f.shape
    if n == 0:
        raise ValueError("empty clip: at least one frame required")
    stride = _row_stride(w)
    frame_bytes = []
    if codec == "MJPG":
        from . import jpeg as _jpeg

        frame_bytes = [_jpeg.encode_jpeg(img, quality) for img in f]
        frame_size = max(len(b) for b in frame_bytes)
        chunk_tag = b"00dc"
        compression = _MJPG_FOURCC
        handler = b"MJPG"
    else:
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
        chunk_tag = b"00db"
        compression = 0
        handler = b"DIB "
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
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                      frame_size, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       frame_size, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(chunk_tag, fb) for fb in frame_bytes))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _parse_avi(buf: bytes) -> tuple[int, int, bool, str, list[tuple[int, int]]]:
    """Container walk WITHOUT decoding pixels: validates structure and
    returns (w, h, topdown, codec, [(frame_payload_pos, len), ...]) —
    the index the frame SAMPLER needs, so striding a long video touches
    only the sampled frames' bytes. ``topdown`` reflects the DIB height
    sign (negative biHeight = rows stored top-down, no flip); ``codec``
    is 'dib' or 'mjpg'."""
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
    if compression == 0 and bitcount == 24:
        codec = "dib"
    elif compression == _MJPG_FOURCC:
        codec = "mjpg"
    else:
        raise NotImplementedError(
            f"only uncompressed 24-bit DIB or MJPG frames supported "
            f"(got biCompression={compression}, {bitcount}-bit)"
        )
    topdown = int(h) < 0
    w, h = int(w), abs(int(h))
    if codec == "dib":
        stride = _row_stride(w)
        for i, (_p2, ln2) in enumerate(frames):
            if ln2 != stride * h:
                raise ValueError(
                    f"frame {i}: size {ln2} != expected {stride * h}")
    return w, h, topdown, codec, frames


def _decode_frame(buf: bytes, pos: int, ln: int, w: int, h: int,
                  topdown: bool = False, codec: str = "dib") -> np.ndarray:
    if codec == "mjpg":
        from . import jpeg as _jpeg

        try:
            img = _jpeg.decode_jpeg(buf[pos:pos + ln])
        except ValueError as e:
            if "missing Huffman table" in str(e):
                # the VfW/'AVI1' convention omits DHT from each frame and
                # implies the Annex K tables; classify that clearly
                # instead of a generic corrupt-stream error (supporting
                # it means hardcoding the spec tables — documented gap)
                raise NotImplementedError(
                    "DHT-less MJPG frames (AVI1 fixed-table convention) "
                    "not supported; frames must carry their Huffman tables"
                ) from None
            raise
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        if img.shape[:2] != (h, w):
            raise ValueError(
                f"MJPG frame is {img.shape[:2]}, header says {(h, w)}")
        return img
    stride = _row_stride(w)
    rows = np.frombuffer(buf[pos:pos + ln], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not topdown:
        bgr = bgr[::-1]  # positive biHeight = bottom-up rows -> flip
    return bgr[:, :, ::-1]  # BGR -> RGB


def decode_avi(buf: bytes) -> np.ndarray:
    """Decode AVI bytes (DIB or MJPG) -> uint8 (n_frames, h, w, 3) RGB."""
    w, h, topdown, codec, frames = _parse_avi(buf)
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, (p2, ln2) in enumerate(frames):
        out[i] = _decode_frame(buf, p2, ln2, w, h, topdown, codec)
    return out


def sample_avi_frames(buf: bytes, every_n: int) -> list[tuple[int, np.ndarray]]:
    """Stride-sample frames WITHOUT decoding the skipped ones: one
    container walk builds the frame index, then only every ``every_n``-th
    frame's bytes are touched (for MJPG that means skipped frames'
    JPEGs are never entropy-decoded). Returns
    [(frame_idx, (h, w, 3) RGB), ...]."""
    w, h, topdown, codec, frames = _parse_avi(buf)
    return [
        (i, _decode_frame(buf, frames[i][0], frames[i][1], w, h, topdown, codec))
        for i in range(0, len(frames), max(every_n, 1))
    ]


def first_frame(buf: bytes) -> np.ndarray:
    """Decode ONLY the first frame — O(1) in clip length (one container
    walk for the index, one frame's bytes touched). The shape
    ``decode_media`` needs: features/resize over a video row must not
    pay O(n_frames) decode for a representative frame."""
    w, h, topdown, codec, frames = _parse_avi(buf)
    return _decode_frame(buf, frames[0][0], frames[0][1], w, h, topdown, codec)
