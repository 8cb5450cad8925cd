"""WAV (RIFF/PCM) codec in pure numpy — no audio library needed.

Same engineering class as the PNG codec in sources/png.py: the
container has no soundfile/ffmpeg, but canonical WAV is just a RIFF
chunk walk + little-endian PCM samples, fully specified and
implementable exactly. This de-stubs ``multimodal.decode_media`` for
real audio bytes; only video remains an environment-constrained stub.

Scope (raises otherwise, keeping the poison-pill path honest):

- format 1 (integer PCM) at 16-bit, and format 3 (IEEE float) rejected
  explicitly: PCM16 is the training-data interchange baseline.
  Mono/multi-channel; any sample rate.
- structurally broken bytes (bad magic, truncated chunks, odd data
  size) raise ValueError — corrupt media must be DETECTED, not
  mis-decoded; non-PCM16 encodings raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np

from . import riff


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Canonical RIFF/WAVE writer: int16 samples, shape (n,) mono or
    (n, channels); interleaved little-endian PCM16 data chunk."""
    s = np.asarray(samples)
    if not (s.dtype.kind == "i" and s.dtype.itemsize == 2):
        raise ValueError(f"unsupported dtype {s.dtype} (int16 PCM only)")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"unsupported shape {samples.shape}")
    n, ch = s.shape
    data = s.astype("<i2").tobytes()  # row-major = interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + riff.chunk(b"fmt ", fmt) + riff.chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE bytes -> (samples, sample_rate); samples are
    int16 shaped (n_frames, n_channels). The chunk walk is bounded by
    the declared RIFF size, so trailing tagger bytes (ID3, padding)
    after the payload are ignored, not parsed as chunks."""
    end = riff.header(buf, b"WAVE", "WAV")
    fmt = None
    data = None
    for tag, _ltype, p, length in riff.walk(buf, 12, end):
        if tag == b"fmt ":
            if length < 16:
                raise ValueError(f"bad fmt chunk length {length}")
            fmt = struct.unpack("<HHIIHH", buf[p:p + 16])
        elif tag == b"data":
            data = buf[p:p + length]
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only integer PCM16 supported (got format {audio_format}, {bits}-bit)"
        )
    if ch < 1:
        raise ValueError("bad channel count 0")
    if len(data) % (2 * ch) != 0:
        raise ValueError(f"data size {len(data)} not a whole number of frames")
    samples = np.frombuffer(data, dtype="<i2").astype(np.int16).reshape(-1, ch)
    return samples, int(sample_rate)


def envelope_u8(samples: np.ndarray) -> np.ndarray:
    """Deterministic 2D uint8 view of a PCM16 waveform for the generic
    media kernels (feature pooling, block-mean resize): the high byte
    offset to unsigned — (s >> 8) + 128 — per (frame, channel). Loses
    only the low byte, which pooled statistics don't see."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    return ((s >> 8) + 128).astype(np.uint8)
