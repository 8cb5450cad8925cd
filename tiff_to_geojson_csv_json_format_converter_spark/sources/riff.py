"""Shared RIFF container grammar — the chunk layer under both WAV
(sources/wav.py) and AVI (sources/avi.py).

One copy of the rules both formats share: '<tag><le32 length><payload>'
chunks, word alignment (odd-length payloads pad one byte), LIST chunks
carrying a 4-byte list type, and a walk BOUNDED by the declared RIFF
payload size (bytes past it — ID3 tags, padding appended by taggers —
are not chunks and must be ignored, not parsed)."""

from __future__ import annotations

import struct


def chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def list_chunk(list_type: bytes, payload: bytes) -> bytes:
    return chunk(b"LIST", list_type + payload)


def header(buf: bytes, form: bytes, what: str) -> int:
    """Validate 'RIFF <size> <form>' and return the payload END offset
    (8 + declared size) — the bound every walk must respect."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != form:
        raise ValueError(f"not a {what}: bad RIFF/{form.decode().strip()} magic")
    (riff_size,) = struct.unpack("<I", buf[4:8])
    if riff_size + 8 > len(buf):
        raise ValueError("truncated RIFF payload")
    return 8 + riff_size


def walk(buf: bytes, pos: int, end: int):
    """Yield (tag, list_type_or_None, payload_start, payload_len) for
    each chunk in [pos, end); LIST chunks report their type and inner
    payload so callers can recurse with another walk()."""
    while pos + 8 <= end:
        tag = buf[pos:pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        if pos + 8 + length > end:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"LIST":
            if length < 4:
                # a LIST payload must at least hold its 4-byte list type;
                # anything shorter would make the inner length negative and
                # slice the type from bytes past the declared payload
                raise ValueError(f"LIST chunk with invalid length {length}")
            yield tag, buf[pos + 8:pos + 12], pos + 12, length - 4
        else:
            yield tag, None, pos + 8, length
        pos += 8 + length + (length & 1)  # chunks are word-aligned
