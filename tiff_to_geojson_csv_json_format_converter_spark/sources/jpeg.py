"""Baseline JPEG codec in pure numpy — no image library.

The last media-codec stub was "compressed formats": baseline sequential
JPEG (ITU-T T.81) is zigzag + quantized 8x8 DCT + canonical Huffman, all
fully specified and implementable exactly, so compressed IMAGE bytes can
now decode in-repo (only compressed VIDEO/audio codecs remain
environment stubs).

Scope:

- decode: baseline sequential (SOF0), 8-bit, grayscale or 3-component
  YCbCr with no subsampling required for OUR encoder's output, and
  arbitrary per-component sampling ACCEPTED only when all factors are
  equal (true 4:4:4); Huffman tables are read from the stream's DHT
  segments, so JPEGs from other encoders (Annex K tables, optimized
  tables) decode too. Progressive (SOF2), arithmetic coding, 12-bit,
  subsampled chroma and restart intervals raise NotImplementedError;
  structurally broken bytes raise ValueError.
- encode: quality-scaled Annex K quantization tables, 4:4:4 (no
  subsampling), flat canonical Huffman tables written to DHT (every
  DC symbol at 4 bits, every AC symbol at 8 — valid prefix codes chosen
  for implementation obviousness over compression ratio; any standard
  decoder reads the tables from the stream).

JPEG is lossy: round-trips are verified by PSNR gates (>= 40 dB on
smooth content at quality 95) plus exact cases (constant blocks whose
only nonzero coefficient is DC).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K base quantization tables (luminance, chrominance)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)


def _zigzag_order() -> np.ndarray:
    """The standard zigzag scan, generated (not hand-copied): diagonals
    of constant i+j, odd diagonals run top-right->bottom-left (i
    ascending), even ones the reverse."""
    coords = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag = diag[::-1]
        coords.extend(diag)
    return np.array([i * 8 + j for i, j in coords], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) / 2 * (
            1 / np.sqrt(2) if _k == 0 else 1.0
        )


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# canonical Huffman machinery (shared by encode + decode)
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (bits-per-length, value list) -> {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _enc_tables(dc_depth: int = 4, ac_depth: int = 8):
    """Flat canonical encoder tables: every DC symbol (0..11) at
    ``dc_depth`` bits, every AC symbol at ``ac_depth`` — valid prefix
    codes whenever the leaf budget holds (12 <= 2^dc, 162 <= 2^ac).
    Parameterized so tests can emit streams with DIFFERENT declared
    code lengths, proving the decoder reads DHT rather than assuming
    the default layout."""
    if 12 > (1 << dc_depth) or len(_AC_SYMBOLS) > (1 << ac_depth):
        raise ValueError("table depth too small for symbol alphabet")
    dc_bits = [0] * 16
    dc_bits[dc_depth - 1] = 12
    ac_bits = [0] * 16
    ac_bits[ac_depth - 1] = len(_AC_SYMBOLS)
    return dc_bits, list(range(12)), ac_bits, list(_AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            # truncate consumed high bits: an unbounded python-int
            # accumulator makes every subsequent shift O(total bits)
            # and the whole pass quadratic in scan length
            self.acc &= (1 << self.nbits) - 1
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("truncated entropy-coded segment")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.buf):
                raise ValueError("truncated after 0xFF in scan")
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1  # keep the accumulator bounded
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid Huffman code in scan")


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(wr: _BitWriter, coefs: np.ndarray, dc_prev: int,
                  dc_codes, ac_codes) -> int:
    zz = coefs.reshape(-1)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - dc_prev
    size = _size_cat(diff)
    code, ln = dc_codes[size]
    wr.write(code, ln)
    if size:
        wr.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wr.write(code, ln)
            run -= 16
        size = _size_cat(v)
        code, ln = ac_codes[(run << 4) | size]
        wr.write(code, ln)
        wr.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        wr.write(code, ln)
    return dc


def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return padded, bh, bw


def encode_jpeg(img: np.ndarray, quality: int = 90,
                table_depths: tuple[int, int] = (4, 8)) -> bytes:
    """Baseline sequential JPEG: uint8 (h, w) grayscale or (h, w, 3) RGB
    (encoded 4:4:4 YCbCr, no subsampling)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"unsupported dtype {img.dtype} (uint8 only)")
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        # the decoder (ours and the spec) rejects zero dimensions — an
        # encoder must not emit bytes its own decoder refuses
        raise ValueError("zero image dimension")
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"dimensions {h}x{w} exceed the 16-bit SOF fields")
    ncomp = len(planes)
    ql, qc = _quality_tables(quality)
    qtabs = [ql] + ([qc] if ncomp == 3 else [])
    dc_bits, dc_vals, ac_bits, ac_vals = _enc_tables(*table_depths)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    # quantized coefficient planes
    qplanes = []
    for ci, plane in enumerate(planes):
        padded, bh, bw = _blocks_of(plane)
        qt = qtabs[min(ci, len(qtabs) - 1)].astype(np.float64)
        coefs = np.empty((bh, bw, 8, 8), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                d = _C @ block @ _C.T
                coefs[by, bx] = np.rint(d / qt).astype(np.int64)
        qplanes.append((coefs, bh, bw))

    wr = _BitWriter()
    dc_prev = [0] * ncomp
    bh, bw = qplanes[0][1], qplanes[0][2]
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                dc_prev[ci] = _encode_block(
                    wr, qplanes[ci][0][by, bx], dc_prev[ci], dc_codes, ac_codes
                )
    scan = wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    for ti, qt in enumerate(qtabs):
        out += seg(0xDB, bytes([ti]) + bytes(
            int(v) for v in qt.reshape(-1)[_ZIGZAG]))
    comp_spec = b"".join(
        bytes([ci + 1, 0x11, 0 if ci == 0 else 1]) for ci in range(ncomp)
    )
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
               + bytes([ncomp]) + comp_spec)
    for cls, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        out += seg(0xC4, bytes([cls << 4]) + bytes(bits) + bytes(vals))
    sos_comp = b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
    out += seg(0xDA, bytes([ncomp]) + sos_comp + bytes([0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG -> uint8 (h, w) or (h, w, 3)."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    comps = []
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # legal fill bytes: any number of extra 0xFF may pad a marker
        # (T.81 B.1.1.2)
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(buf):
            # the skip can run past the loop guard: a stream ending in a
            # 0xFF run must still fail with the contractual ValueError
            raise ValueError("truncated stream after fill bytes")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", buf[pos + 2:pos + 4])
        payload = buf[pos + 4:pos + 2 + seglen]
        if len(payload) != seglen - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8)
                if len(zz) != 64:
                    raise ValueError("short DQT payload")
                t = np.zeros(64, dtype=np.int64)
                t[_ZIGZAG] = zz
                qtabs[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                if len(bits) != 16:
                    raise ValueError("short DHT payload")
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                if len(vals) != n:
                    raise ValueError("short DHT payload")
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {(c, ln): sym for sym, (c, ln) in codes.items()}
                p += 17 + n
        elif marker == 0xC0:
            precision = payload[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit precision")
            hh, ww = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            comps = []
            for ci in range(nc):
                cid, sampling, tq = payload[6 + ci * 3:9 + ci * 3]
                comps.append((cid, sampling >> 4, sampling & 0x0F, tq))
            if any(c[1] != 1 or c[2] != 1 for c in comps):
                # equal-but-not-1 factors (e.g. 2x2 everywhere) are legal
                # 4:4:4 too, but interleave MULTIPLE blocks per component
                # per MCU (T.81 A.2.3) — decoding them with the 1-block
                # layout would silently garble pixels, so reject
                raise NotImplementedError(
                    "only 1x1 sampling factors supported (no subsampling, "
                    "no multi-block MCUs)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG not supported (grayscale or YCbCr)"
                )
            sof = (hh, ww, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential (SOF0) supported, got SOF 0xFF{marker:02X}"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI)")
        elif marker == 0xDA:
            ns = payload[0]
            if sof is not None and ns != sof[2]:
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG not supported"
                )
            scan_comps = []
            for ci in range(ns):
                cid, tables = payload[1 + ci * 2:3 + ci * 2]
                scan_comps.append((cid, tables >> 4, tables & 0x0F))
            if sof is not None:
                sof_ids = [c[0] for c in comps]
                scan_ids = [sc[0] for sc in scan_comps]
                if scan_ids != sof_ids and set(scan_ids) <= set(sof_ids):
                    # the decoder indexes planes positionally and
                    # color-converts assuming frame-header (Y,Cb,Cr)
                    # order; a permuted OR duplicated SOS list of known
                    # ids would silently swap/garble channels (subset
                    # check, not set equality: [1,1,3] must be refused
                    # too; ids absent from SOF stay a ValueError in the
                    # comp_q lookup below)
                    raise NotImplementedError(
                        "SOS component order differs from SOF order"
                    )
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if sof is None or scan_start is None:
        raise ValueError("missing SOF0 or SOS")
    h, w, nc = sof
    if h == 0 or w == 0:
        raise ValueError("zero image dimension")
    bh, bw = -(-h // 8), -(-w // 8)
    rd = _BitReader(buf, scan_start)
    planes = [np.empty((bh * 8, bw * 8), dtype=np.float64) for _ in range(nc)]
    dc_prev = [0] * nc
    comp_q = {c[0]: c[3] for c in comps}
    for by in range(bh):
        for bx in range(bw):
            for ci in range(nc):
                cid, dc_t, ac_t = scan_comps[ci]
                dct = huff.get((0, dc_t))
                act = huff.get((1, ac_t))
                if dct is None or act is None:
                    raise ValueError("scan references missing Huffman table")
                size = rd.huff(dct)
                if size > 15:
                    # a corrupted DHT can declare arbitrary byte values
                    # as "symbols"; a DC size category past 15 would read
                    # a >2^63 magnitude and overflow the int64 store
                    # (spec bound for 8-bit baseline is 11)
                    raise ValueError(f"invalid DC size category {size}")
                diff = 0
                if size:
                    v = rd.bits(size)
                    diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                dc_prev[ci] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = dc_prev[ci]
                k = 1
                while k < 64:
                    sym = rd.huff(act)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run != 15:
                            raise ValueError(f"bad AC symbol {sym:02X}")
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    v = rd.bits(size)
                    zz[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    k += 1
                if cid not in comp_q:
                    raise ValueError(f"scan component id {cid} not in frame header")
                qt = qtabs.get(comp_q[cid])
                if qt is None:
                    raise ValueError("missing quantization table")
                coefs = np.zeros(64, dtype=np.int64)
                coefs[_ZIGZAG] = zz
                block = coefs.reshape(8, 8) * qt
                pix = _C.T @ block.astype(np.float64) @ _C + 128.0
                planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = pix
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
