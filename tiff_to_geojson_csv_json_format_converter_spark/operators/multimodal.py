"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample operators.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures) is real and tested. Codec status:

- IMAGE decode is REAL: ``png`` (sources/png.py — gray/RGB/RGBA/
  palette, depths 8/16, all five scanline filters, CRC-verified) and
  ``jpeg`` (sources/jpeg.py — baseline sequential, DHT-table-driven),
  plus the deterministic ``fake/gray8`` plumbing format.
- AUDIO decode is REAL for uncompressed AND compressed rows:
  ``decode_media('wav')`` parses RIFF PCM16 and IMA-ADPCM (format 17,
  the 4-bit compressed integer codec) via sources/wav.py and presents
  the waveform to the generic kernels as the deterministic (frames,
  channels) high-byte envelope — feature pooling and block-mean
  resize become temporal pooling.
- VIDEO decode is REAL for both uncompressed AND motion-JPEG clips:
  ``decode_media('avi')`` parses RIFF/AVI (sources/avi.py, DIB or MJPG
  frames — the latter decoded by the in-repo JPEG codec) and yields the
  first frame's luma in O(1) of clip length; the frame sampler indexes
  the container and decodes only sampled frames. Inter-frame codecs
  (H.264/VP9/AAC/MP3 — the ``mp4`` rows) remain stubbed (no ffmpeg in
  this container): ``decode_media`` raises ``NotImplementedError`` for
  them, which the operators surface as ok=false poison-pill rows.
  Swapping in a real codec is a one-function change — the distributed
  plumbing does not move.

Raster imagery is separately supported end-to-end via sources.codecs
(the engine's own numpy TIFF/raw/npy codecs); this module is the
general media surface beyond rasters.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, media_type string, fmt string, bytes binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURES_SCHEMA = "media_id string, feature array<double>, n_bytes long, ok boolean"
FRAMES_SCHEMA = "media_id string, frame_idx int, frame_bytes binary"


def decode_media(buf: bytes, media_type: str, fmt: str) -> np.ndarray:
    """Decode media bytes to a 2D uint8 array.

    REAL codecs (all in-repo, pure numpy): ``png`` (sources/png.py —
    gray/RGB/RGBA/palette, depths 8/16, CRC-verified), ``wav``
    (sources/wav.py — RIFF/PCM16, presented as the (frames, channels)
    high-byte envelope), ``jpeg`` (sources/jpeg.py — baseline
    sequential), ``avi`` (sources/avi.py — uncompressed DIB or MJPG,
    first frame only, O(1) in clip length). Multi-channel images
    collapse to deterministic integer luma so the feature/resize
    kernels see one canonical 2D uint8 view; ``fake/gray8`` remains the
    deterministic plumbing-test format. COMPRESSED audio/video codecs
    stay stubbed (no ffmpeg in this container): they raise
    NotImplementedError, which the operators surface as ok=false
    poison-pill rows."""
    if fmt == "png":
        from ..sources import png as _png

        return _png.luma_u8(_png.decode_png(buf))
    if fmt == "jpeg":
        from ..sources import jpeg as _jpeg
        from ..sources import png as _png

        return _png.luma_u8(_jpeg.decode_jpeg(buf))
    if fmt == "wav":
        from ..sources import wav as _wav

        samples, _sr = _wav.decode_wav(buf)
        return _wav.envelope_u8(samples)
    if fmt == "avi":
        from ..sources import avi as _avi
        from ..sources import png as _png

        # O(1) in clip length: only the first frame's bytes decode
        return _png.luma_u8(_avi.first_frame(buf))
    if fmt == "fake/gray8":
        side = max(1, int(np.sqrt(len(buf))))
        return np.frombuffer(buf[: side * side], dtype=np.uint8).reshape(side, side)
    raise NotImplementedError(
        f"media codec for {media_type}/{fmt} not available in this environment; "
        "plug a decoder into decode_media()"
    )


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode -> mean-pool grid features per item, in mapInPandas batches.
    Real plumbing: binary in, fixed-width array<double> out, one Arrow
    batch per ~task; items that fail to decode yield ok=false rows
    (never task failure — poison-pill media must not kill a 100 TB job)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    img = decode_media(r.bytes, r.media_type, r.fmt)
                    edges = np.linspace(0, img.shape[0], feat_dim + 1).astype(int)
                    feat = [float(img[edges[i]:max(edges[i + 1], edges[i] + 1)].mean()) for i in range(feat_dim)]
                    rows.append((r.media_id, feat, len(r.bytes), True))
                except Exception:
                    # unsupported codec OR corrupt bytes -> poison-pill row,
                    # never task failure (real codecs raise ValueError/
                    # OSError on corrupt media, not NotImplementedError)
                    rows.append((r.media_id, [0.0] * feat_dim, len(r.bytes), False))
            yield pd.DataFrame(rows, columns=["media_id", "feature", "n_bytes", "ok"])

    return media.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = "media_id string, width int, height int, resized binary, ok boolean"


def block_mean_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean downsample to (out_h, out_w), uint8
    floor — the pure-numpy resize kernel (reduceat over row/col edges,
    the same trick the phash uses). Exact and library-free.

    Upsampling contract (out > in): an empty block takes the sample at
    its block-start index (reduceat's empty-slice value) — i.e.
    nearest-neighbor fill, independently brute-force-tested in
    tests/test_ops.py."""
    h, w = img.shape
    ry = np.linspace(0, h, out_h + 1).astype(int)
    rx = np.linspace(0, w, out_w + 1).astype(int)
    acc = np.add.reduceat(np.add.reduceat(img.astype(np.int64), ry[:-1], axis=0), rx[:-1], axis=1)
    # reduceat contributes ONE element for an empty slice (the value at
    # the block-start index), not zero — so the divisor per axis is
    # max(slice length, 1), never 0->1 on the product (that bug divided
    # a multi-column sum by 1 for empty-row blocks and wrapped uint8)
    cnt = np.outer(np.maximum(np.diff(ry), 1), np.maximum(np.diff(rx), 1))
    return (acc // cnt).astype(np.uint8)


def resize_media(media: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Decode -> block-mean resize -> re-encode, one Arrow batch per
    ~task. Same poison-pill contract as extract_features: rows whose
    format has no codec yield ok=false, never task failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    img = decode_media(r.bytes, r.media_type, r.fmt)
                    small = block_mean_resize(img, out_h, out_w)
                    rows.append((r.media_id, out_w, out_h, small.tobytes(), True))
                except Exception:
                    # any decode/kernel failure — unsupported codec OR
                    # corrupt bytes — is a poison-pill row, never a task
                    # failure (with real codecs, corrupt media raises
                    # ValueError/OSError, not NotImplementedError)
                    rows.append((r.media_id, 0, 0, b"", False))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "resized", "ok"]
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def _sample_frames_row(buf: bytes, fmt: str, n_frames, every_n: int) -> list[tuple]:
    """Per-row frame sampler — ONE implementation shared by the Spark
    kernel and the driver-oracle replay. ``avi`` rows parse the REAL
    container (sources/avi.py: the chunk walk indexes every frame but
    decodes only the sampled ones — the shape that holds for long
    videos); other formats fall back to metadata-stride byte slicing
    (the plumbing contract for still-stubbed codecs).

    Poison-pill contract (same as extract_features/resize_media: corrupt
    media must not kill a 100 TB job): a row whose bytes fail the
    container parse yields the single sentinel frame (-1, b"") — visible
    in the output, never a task failure."""
    # one clamp for BOTH branches: every_n < 1 means "every frame"
    # (previously the stub path clamped but the AVI path collapsed the
    # same argument to the poison pill — same input, two contracts)
    every_n = max(int(every_n), 1)
    if fmt == "avi":
        from ..sources import avi as _avi

        try:
            return [(idx, fr.tobytes())
                    for idx, fr in _avi.sample_avi_frames(buf, every_n)]
        except Exception:
            return [(-1, b"")]
    try:
        n = int(n_frames)  # raises on None and NaN (NaN is truthy)
    except (TypeError, ValueError):
        return [(-1, b"")]
    if n < 0:  # negative metadata is corrupt, not a zero-frame clip
        return [(-1, b"")]
    frame_len = max(1, len(buf) // max(n, 1))
    return [(idx, buf[idx * frame_len:(idx + 1) * frame_len])
            for idx in range(0, n, every_n)]


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: emits (media_id, frame_idx,
    frame_bytes) with deterministic stride — one-to-many mapInPandas,
    the same explode shape the raster extractor uses. Real container
    parse for ``avi`` rows, metadata-stride slicing otherwise (see
    _sample_frames_row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for idx, fb in _sample_frames_row(r.bytes, r.fmt, r.n_frames, every_n):
                    rows.append((r.media_id, idx, fb))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return media.filter(F.col("media_type") == "video").mapInPandas(run, FRAMES_SCHEMA)


def synth_media_rows(n: int = 64) -> list[tuple]:
    """Deterministic media rows — shared by the Spark table below and
    the single-process oracle replays in plans/entry_queries.py. Image
    rows rotate through REAL PNG bytes (sources/png.py, gray/RGB/RGBA
    content across all five scanline filters — round-tripped exactly),
    REAL baseline-JPEG bytes (sources/jpeg.py, smooth deterministic
    content), and the ``fake/gray8`` plumbing format; audio rows are
    REAL RIFF/WAV bytes (sources/wav.py, alternating mono/stereo,
    rotating PCM16 / G.711 µ-law / IMA ADPCM / G.711 A-law); video rows
    rotate through
    REAL uncompressed-AVI clips, REAL MJPEG-in-AVI clips (sources/avi.py
    + sources/jpeg.py, container-parsed frame sampling), and the ``mp4``
    stub format (poison-pill path — codecs like H.264 need ffmpeg,
    absent here)."""
    from ..sources import png as _png
    from ..sources import wav as _wav

    rows = []
    for i in range(n):
        rng = np.random.default_rng([7, i])
        side = 16 + (i % 3) * 8
        mt = ["image", "audio", "video"][i % 3]
        if mt == "image" and (i // 3) % 4 == 1:
            from ..sources import jpeg as _jpeg

            # REAL compressed bytes: smooth deterministic content (JPEG
            # is built for it; pure noise is its worst case)
            fmt = "jpeg"
            yy, xx = np.mgrid[0:side, 0:side]
            img = ((xx * (3 + i % 5) + yy * (2 + i % 3)) % 256).astype(np.uint8)
            buf = _jpeg.encode_jpeg(img, quality=90)
        elif mt == "image" and (i // 3) % 2 == 0:
            fmt = "png"
            nch = [1, 3, 4][(i // 6) % 3]
            shape = (side, side) if nch == 1 else (side, side, nch)
            img = rng.integers(0, 255, shape, dtype=np.int64).astype(np.uint8)
            buf = _png.encode_png(img, filter_type=(i // 3) % 5)
        elif mt == "audio":
            fmt = "wav"
            ach = 1 + (i // 3) % 2  # alternate mono / stereo
            samples = rng.integers(-32768, 32767, (side * side, ach),
                                   dtype=np.int64).astype(np.int16)
            # audio rows rotate through all four in-repo codecs so the
            # digests exercise every lossy-decode path (like MJPEG does
            # for video): PCM16, G.711 mu-law/A-law (elementwise
            # companding), IMA ADPCM (block-predictive)
            enc = [_wav.encode_wav, _wav.encode_wav_mulaw,
                   _wav.encode_wav_adpcm, _wav.encode_wav_alaw][(i // 3) % 4]
            buf = enc(samples, 16000)
        elif mt == "video" and (i // 3) % 3 != 2:
            from ..sources import avi as _avi

            fmt = "avi"
            side = 8  # real 30-frame 8x8 clip, container-parseable
            if (i // 3) % 3 == 0:
                clip = rng.integers(0, 255, (30, side, side, 3),
                                    dtype=np.int64).astype(np.uint8)
                buf = _avi.encode_avi(clip, fps=30)
            else:
                # MJPEG: smooth deterministic frames (JPEG-friendly)
                yy, xx = np.mgrid[0:side, 0:side]
                clip = np.stack([
                    np.repeat((((xx * 3 + yy * 2 + t * 7) % 256)
                               .astype(np.uint8))[:, :, None], 3, axis=2)
                    for t in range(30)
                ])
                buf = _avi.encode_avi(clip, fps=30, codec="MJPG", quality=90)
        else:
            fmt = "fake/gray8" if mt == "image" else "mp4"
            buf = rng.integers(0, 255, side * side, dtype=np.int64).astype(np.uint8).tobytes()
        rows.append((
            f"media_{i:05d}", mt, fmt,
            bytearray(buf), side, side, 30 if mt == "video" else 0, 16000 if mt == "audio" else 0,
        ))
    return rows


def synth_media_df(spark, n: int = 64):
    """Deterministic fake media table for plumbing tests."""
    return spark.createDataFrame(synth_media_rows(n), MEDIA_SCHEMA)
