"""WAV (RIFF/PCM) codec in pure numpy — no audio library needed.

Same engineering class as the PNG codec in sources/png.py: the
container has no soundfile/ffmpeg, but canonical WAV is just a RIFF
chunk walk + little-endian PCM samples, fully specified and
implementable exactly. This de-stubs ``multimodal.decode_media`` for
real audio bytes; only video remains an environment-constrained stub.

Scope (raises otherwise, keeping the poison-pill path honest):

- format 1 (integer PCM) at 16-bit: the training-data interchange
  baseline. Mono/multi-channel; any sample rate.
- format 17 (IMA/DVI ADPCM, 4-bit): the classic COMPRESSED integer
  codec — 4x smaller than PCM16, fully specified integer arithmetic
  (step table + index table, no floats), so decode is exact and
  engine-portable. Blocks are independent (each block header carries
  the predictor + step index), which is also the right distributed
  shape: a 100 TB audio corpus splits at block boundaries.
- formats 7 and 6 (G.711 µ-law / A-law, 8-bit): the telephony
  companding codecs — 2x smaller than PCM16, pure elementwise integer
  math (no inter-sample state at all), so they split anywhere, not
  just at block boundaries.
- format 3 (IEEE float) and everything else raise NotImplementedError;
  structurally broken bytes (bad magic, truncated chunks, odd data
  size) raise ValueError — corrupt media must be DETECTED, not
  mis-decoded.
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


# IMA/DVI ADPCM tables (IMA Digital Audio Focus and Compatibility
# Committee, "Recommended Practices for Enhancing Digital Audio
# Compatibility", rev 3.00, 1992 — public spec; same tables as every
# implementation since)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

IMA_BLOCK_FRAMES = 505  # frames per block (1 header + 504 nibbles/ch)


def _ima_decode_nibbles(nibbles: np.ndarray, predictor: int,
                        index: int) -> np.ndarray:
    """Decode a run of 4-bit codes with the standard integer recurrence.
    Sequential by construction (each sample feeds the next predictor) —
    but blocks are independent, so the per-block loop is the unit of
    parallelism, not this one."""
    out = np.empty(len(nibbles), dtype=np.int16)
    pred, idx = int(predictor), int(index)
    steps, adj = _IMA_STEPS, _IMA_INDEX_ADJ
    for i, nib in enumerate(nibbles):
        step = int(steps[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(adj[nib & 7])))
        out[i] = pred
    return out


def _ima_encode_block(samples: np.ndarray, index: int) -> tuple[bytes, np.ndarray, int]:
    """Encode one channel-block: (header+nibble bytes, decoded samples,
    final step index). samples[0] rides verbatim in the 4-byte header;
    the rest quantize to 4-bit codes against the decoder's own
    reconstruction (standard predictive-coding closure: encoder and
    decoder track the identical predictor chain)."""
    pred = int(samples[0])
    idx = int(index)
    header = struct.pack("<hBB", pred, idx, 0)
    nibbles = np.empty(len(samples) - 1, dtype=np.uint8)
    decoded = np.empty(len(samples), dtype=np.int16)
    decoded[0] = pred
    steps, adj = _IMA_STEPS, _IMA_INDEX_ADJ
    for i, s in enumerate(samples[1:]):
        step = int(steps[idx])
        delta = int(s) - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        half = step >> 1
        if delta >= half:
            nib |= 2
            delta -= half
        quarter = step >> 2
        if delta >= quarter:
            nib |= 1
        # reconstruct exactly as the decoder will
        diff = step >> 3
        if nib & 1:
            diff += quarter
        if nib & 2:
            diff += half
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(adj[nib & 7])))
        nibbles[i] = nib
        decoded[i + 1] = pred
    packed = (nibbles[0::2] | (nibbles[1::2].astype(np.uint16) << 4)).astype(np.uint8)
    return header + packed.tobytes(), decoded, idx


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """RIFF/WAVE writer for IMA ADPCM (format 17), mono or stereo.

    Frames pad to whole blocks of IMA_BLOCK_FRAMES (silence fill — the
    'fact' chunk records the true frame count and decode_wav trims to
    it). Stereo interleaves 4-byte nibble groups per channel within
    each block, per the IMA recommended practice."""
    s = np.asarray(samples)
    if not (s.dtype.kind == "i" and s.dtype.itemsize == 2):
        raise ValueError(f"unsupported dtype {s.dtype} (int16 PCM only)")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"unsupported shape {samples.shape} (mono/stereo)")
    n, ch = s.shape
    if n == 0:
        raise ValueError("empty sample array")
    spb = IMA_BLOCK_FRAMES
    n_blocks = -(-n // spb)
    padded = np.zeros((n_blocks * spb, ch), dtype=np.int16)
    padded[:n] = s
    block_align = (4 + (spb - 1) // 2) * ch
    blobs = []
    idx = [0] * ch
    for b in range(n_blocks):
        chunk_frames = padded[b * spb:(b + 1) * spb]
        per_ch = []
        for c in range(ch):
            blob, _dec, idx[c] = _ima_encode_block(chunk_frames[:, c], idx[c])
            per_ch.append(blob)
        if ch == 1:
            blobs.append(per_ch[0])
        else:
            # headers first (one per channel), then 4-byte groups
            # round-robin across channels
            blobs.extend(p[:4] for p in per_ch)
            bodies = [p[4:] for p in per_ch]
            for off in range(0, len(bodies[0]), 4):
                for c in range(ch):
                    blobs.append(bodies[c][off:off + 4])
    data = b"".join(blobs)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 17, ch, sample_rate, byte_rate,
                      block_align, 4, 2, spb)
    fact = struct.pack("<I", n)
    body = (b"WAVE" + riff.chunk(b"fmt ", fmt) + riff.chunk(b"fact", fact)
            + riff.chunk(b"data", data))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_adpcm(data: bytes, ch: int, block_align: int,
                  spb: int, n_frames: int | None) -> np.ndarray:
    """IMA ADPCM data chunk -> int16 (n_frames, ch). Each block is
    self-contained; a truncated final block raises (corrupt media must
    be detected)."""
    if block_align < 4 * ch or len(data) % block_align != 0:
        raise ValueError(
            f"ADPCM data size {len(data)} not whole blocks of {block_align}"
        )
    per_ch_body = (block_align - 4 * ch) // ch
    if per_ch_body * ch + 4 * ch != block_align:
        raise ValueError(f"ADPCM block_align {block_align} not channel-even")
    if ch == 2 and per_ch_body % 4 != 0:
        # stereo bodies interleave in 4-byte nibble groups per the IMA
        # layout; a channel-even but non-group-aligned block_align (e.g.
        # 20) would otherwise surface as an opaque numpy broadcast error
        raise ValueError(
            f"stereo ADPCM block_align {block_align} not a whole number "
            "of 4-byte nibble groups per channel"
        )
    got_spb = 1 + per_ch_body * 2
    if spb and spb != got_spb:
        raise ValueError(
            f"fmt declares {spb} samples/block, block layout holds {got_spb}"
        )
    n_blocks = len(data) // block_align
    out = np.empty((n_blocks * got_spb, ch), dtype=np.int16)
    for b in range(n_blocks):
        block = data[b * block_align:(b + 1) * block_align]
        for c in range(ch):
            pred, idx, _r = struct.unpack_from("<hBB", block, c * 4)
            if idx > 88:
                raise ValueError(f"ADPCM step index {idx} out of range")
            if ch == 1:
                body = block[4:]
            else:
                groups = [block[off:off + 4]
                          for off in range(4 * ch + c * 4, len(block), 4 * ch)]
                body = b"".join(groups)
            raw = np.frombuffer(body, dtype=np.uint8)
            nibbles = np.empty(len(raw) * 2, dtype=np.uint8)
            nibbles[0::2] = raw & 0x0F
            nibbles[1::2] = raw >> 4
            dec = _ima_decode_nibbles(nibbles, pred, idx)
            out[b * got_spb, c] = pred
            out[b * got_spb + 1:(b + 1) * got_spb, c] = dec
    if n_frames is not None:
        if n_frames > len(out):
            raise ValueError(
                f"fact frame count {n_frames} exceeds decoded {len(out)}"
            )
        out = out[:n_frames]
    return out


# --- µ-law (G.711) — format 7 ------------------------------------------
# ITU-T Recommendation G.711 (1988), the public telephony companding
# spec: 8 bits/sample, log-segmented. Both directions are pure integer
# numpy (no loops — unlike ADPCM there is no inter-sample recurrence),
# and encode(decode(u)) == u for all 256 codes (asserted in tests),
# so the codec is exact and engine-portable.

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


def mulaw_decode_u8(codes: np.ndarray) -> np.ndarray:
    """µ-law bytes -> int16 linear PCM (elementwise)."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32)
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def mulaw_encode_i16(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> µ-law bytes (elementwise)."""
    s = np.asarray(samples, dtype=np.int32)
    sign = np.where(s < 0, 0x80, 0)
    mag = np.minimum(np.abs(s), _MULAW_CLIP) + _MULAW_BIAS
    # exponent = bit_length(mag) - 8 clipped to [0,7]; frexp's exponent
    # IS bit_length for positive ints (mag >= BIAS > 0, < 2^16 — exact
    # in float64)
    _, e2 = np.frexp(mag.astype(np.float64))
    exp = np.clip(e2 - 8, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def alaw_decode_u8(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear PCM (elementwise). Per G.711: toggle
    the even bits (xor 0x55), then expand the segment/mantissa pair;
    the sign bit SET means positive (opposite of µ-law)."""
    a = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    exp = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    mag = np.where(
        exp == 0, t + 8,
        np.where(exp == 1, t + 0x108, (t + 0x108) << np.maximum(exp - 1, 0)),
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def alaw_encode_i16(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> A-law bytes (elementwise)."""
    s = np.asarray(samples, dtype=np.int32) >> 3  # 13-bit domain
    mask = np.where(s >= 0, 0xD5, 0x55)
    mag = np.where(s >= 0, s, -s - 1)
    # segment = bit_length(mag) - 5 clipped to [0,7] (seg ends 0x1F,
    # 0x3F, ..., 0xFFF); 13-bit input can't overflow seg 7
    _, e2 = np.frexp(np.maximum(mag, 1).astype(np.float64))
    seg = np.clip(e2 - 5, 0, 7)
    mant = np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    return (((seg << 4) | mant) ^ mask).astype(np.uint8)


def _encode_wav_g711(samples: np.ndarray, sample_rate: int,
                     fmt_tag: int, companded: np.ndarray) -> bytes:
    n, ch = companded.shape
    fmt = struct.pack("<HHIIHHH", fmt_tag, ch, sample_rate,
                      sample_rate * ch, ch, 8, 0)
    fact = struct.pack("<I", n)
    body = (b"WAVE" + riff.chunk(b"fmt ", fmt) + riff.chunk(b"fact", fact)
            + riff.chunk(b"data", companded.tobytes()))  # row-major = interleaved
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _check_i16_2d(samples: np.ndarray) -> np.ndarray:
    s = np.asarray(samples)
    if not (s.dtype.kind == "i" and s.dtype.itemsize == 2):
        raise ValueError(f"unsupported dtype {s.dtype} (int16 PCM only)")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"unsupported shape {samples.shape}")
    return s


def encode_wav_mulaw(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE writer for G.711 µ-law (format 7): int16 samples in,
    8-bit companded interleaved data out, with the customary 'fact'
    frame count for a non-PCM format."""
    s = _check_i16_2d(samples)
    return _encode_wav_g711(s, sample_rate, 7, mulaw_encode_i16(s))


def encode_wav_alaw(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE writer for G.711 A-law (format 6)."""
    s = _check_i16_2d(samples)
    return _encode_wav_g711(s, sample_rate, 6, alaw_encode_i16(s))


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE bytes -> (samples, sample_rate); samples are
    int16 shaped (n_frames, n_channels). The chunk walk is bounded by
    the declared RIFF size, so trailing tagger bytes (ID3, padding)
    after the payload are ignored, not parsed as chunks."""
    end = riff.header(buf, b"WAVE", "WAV")
    fmt = None
    fmt_extra = b""
    data = None
    n_frames = None
    for tag, _ltype, p, length in riff.walk(buf, 12, end):
        if tag == b"fmt ":
            if length < 16:
                raise ValueError(f"bad fmt chunk length {length}")
            fmt = struct.unpack("<HHIIHH", buf[p:p + 16])
            fmt_extra = buf[p + 16:p + length]
        elif tag == b"data":
            data = buf[p:p + length]
        elif tag == b"fact":
            if length >= 4:
                (n_frames,) = struct.unpack("<I", buf[p:p + 4])
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, sample_rate, _rate, align, bits = fmt
    if ch < 1:
        raise ValueError("bad channel count 0")
    if audio_format == 17:
        if bits != 4:
            raise NotImplementedError(f"{bits}-bit IMA ADPCM (4-bit only)")
        if ch > 2:
            raise NotImplementedError(f"{ch}-channel IMA ADPCM (mono/stereo)")
        spb = 0
        if len(fmt_extra) >= 4:
            (spb,) = struct.unpack("<H", fmt_extra[2:4])
        return _decode_adpcm(data, ch, align, spb, n_frames), int(sample_rate)
    if audio_format in (6, 7):
        law = "A-law" if audio_format == 6 else "mu-law"
        if bits != 8:
            raise NotImplementedError(f"{bits}-bit {law} (8-bit only)")
        if len(data) % ch != 0:
            raise ValueError(
                f"data size {len(data)} not a whole number of frames"
            )
        codes = np.frombuffer(data, dtype=np.uint8).reshape(-1, ch)
        dec = alaw_decode_u8 if audio_format == 6 else mulaw_decode_u8
        return dec(codes), int(sample_rate)
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only integer PCM16, IMA ADPCM and G.711 supported "
            f"(got format {audio_format}, {bits}-bit)"
        )
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
