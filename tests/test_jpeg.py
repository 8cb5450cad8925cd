"""Baseline JPEG codec (sources/jpeg.py): PSNR round-trip gates (JPEG
is lossy — exactness only where quantization preserves it), DHT-driven
decoding, marker/stream robustness, and the decode_media wiring."""

import struct

import numpy as np
import pytest

from tiff_to_geojson_csv_json_format_converter_spark.operators import multimodal
from tiff_to_geojson_csv_json_format_converter_spark.sources import jpeg, png


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(h, w, fx=3, fy=2):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * fx + y * fy) % 256).astype(np.uint8)


def test_constant_blocks_roundtrip_exact():
    """A constant image has only DC energy: quantized DC reconstructs
    the exact level for any quality."""
    for level in (0, 64, 137, 255):
        img = np.full((24, 24), level, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 75))
        np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("shape", [(32, 32), (37, 29), (8, 8), (9, 17)])
def test_gray_smooth_psnr_gate(shape):
    img = _smooth(*shape)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 95))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert psnr(img, out) >= 40.0


def test_color_smooth_psnr_gate():
    h, w = 30, 26
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x + y) % 256, (2 * x) % 256, (3 * y) % 256],
                   axis=2).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 95))
    assert out.shape == img.shape
    assert psnr(img, out) >= 35.0


def test_noise_worst_case_still_reasonable():
    img = np.random.default_rng(1).integers(0, 255, (24, 24), dtype=np.int64).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 95))
    assert psnr(img, out) >= 30.0  # noise is JPEG's worst case


def test_quality_dial_trades_size_for_error():
    img = _smooth(48, 48)
    hi = jpeg.encode_jpeg(img, 95)
    lo = jpeg.encode_jpeg(img, 30)
    assert len(lo) < len(hi)
    assert psnr(img, jpeg.decode_jpeg(hi)) > psnr(img, jpeg.decode_jpeg(lo))


def test_decoder_reads_tables_from_dht_not_assumptions():
    """Streams carrying DIFFERENT declared Huffman code lengths must
    decode to identical pixels — the decoder is table-driven."""
    img = _smooth(20, 20)
    b1 = jpeg.encode_jpeg(img, 95)
    b2 = jpeg.encode_jpeg(img, 95, table_depths=(5, 9))
    assert b1 != b2
    np.testing.assert_array_equal(jpeg.decode_jpeg(b1), jpeg.decode_jpeg(b2))


def test_corrupt_and_unsupported_streams_raise():
    img = _smooth(16, 16)
    good = jpeg.encode_jpeg(img, 90)
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"JUNK" + good)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(good[: len(good) // 2])
    # SOF0 -> SOF2 (progressive) must raise NotImplementedError
    prog = bytearray(good)
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg.decode_jpeg(bytes(prog))
    # DRI segment -> restart intervals unsupported, detected not garbled
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 8)
    with_dri = good[:2] + dri + good[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        jpeg.decode_jpeg(with_dri)


def test_zigzag_is_the_standard_scan():
    """Spot-check the generated zigzag against the published first/last
    entries of the T.81 scan."""
    zz = jpeg._zigzag_order()
    assert list(zz[:16]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert list(zz[-8:]) == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(zz.tolist()) == list(range(64))


def test_decode_media_jpeg_real_bytes():
    img = _smooth(16, 16)
    got = multimodal.decode_media(jpeg.encode_jpeg(img, 95), "image", "jpeg")
    assert got.shape == (16, 16) and got.dtype == np.uint8
    assert psnr(img, got) >= 40.0


def test_synth_media_rows_include_real_jpeg():
    rows = multimodal.synth_media_rows(64)
    fmts = {fmt for (_m, mt, fmt, *_r) in rows if mt == "image"}
    assert fmts == {"png", "jpeg", "fake/gray8"}
    for (_m, mt, fmt, buf, w, h, *_r) in rows:
        if fmt == "jpeg":
            out = jpeg.decode_jpeg(bytes(buf))
            assert out.shape == (h, w)
            # smooth synthetic content: quality 90 keeps it faithful
            yy, xx = np.mgrid[0:h, 0:w]
            # reconstruct the generator's content deterministically
            # (the row index is in the media_id)
            i = int(_m.split("_")[1])
            want = ((xx * (3 + i % 5) + yy * (2 + i % 3)) % 256).astype(np.uint8)
            assert psnr(want, out) >= 30.0


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of extra 0xFF bytes may pad a marker."""
    img = _smooth(12, 12)
    good = jpeg.encode_jpeg(img, 90)
    padded = good[:2] + b"\xff\xff" + good[2:]
    np.testing.assert_array_equal(jpeg.decode_jpeg(padded), jpeg.decode_jpeg(good))


def test_non_1x1_sampling_and_cmyk_rejected_not_garbled():
    """Equal-but-not-1 sampling factors interleave multiple blocks per
    MCU — decoding them with the 1-block layout would silently garble
    pixels, so they must be REJECTED; same for 2/4-component frames."""
    img = _smooth(16, 16)
    good = bytearray(jpeg.encode_jpeg(img, 90))
    sof = good.index(b"\xff\xc0")
    # component spec starts at sof+4(len+marker)+6: [id, sampling, tq]
    good[sof + 10 + 1] = 0x22  # sampling 2x2
    with pytest.raises(NotImplementedError, match="sampling"):
        jpeg.decode_jpeg(bytes(good))


def test_scan_component_mismatch_is_value_error():
    img = _smooth(8, 8)
    buf = bytearray(jpeg.encode_jpeg(img, 90))
    sos = buf.index(b"\xff\xda")
    buf[sos + 5] = 9  # scan component id 9: absent from the frame header
    with pytest.raises(ValueError, match="not in frame header"):
        jpeg.decode_jpeg(bytes(buf))


def test_permuted_scan_order_is_detected():
    """A legal baseline JPEG may list SOS components in a different
    order than SOF; the decoder assumes positional (Y,Cb,Cr) order, so
    it must REFUSE rather than silently permute channels."""
    h, w = 16, 16
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x + y) % 256, (2 * x) % 256, (3 * y) % 256],
                   axis=2).astype(np.uint8)
    buf = bytearray(jpeg.encode_jpeg(img, 90))
    sos = buf.index(b"\xff\xda")
    # per-component entries are (cid, tables) pairs starting at sos+5
    c0 = bytes(buf[sos + 5:sos + 7])
    c1 = bytes(buf[sos + 7:sos + 9])
    buf[sos + 5:sos + 7] = c1
    buf[sos + 7:sos + 9] = c0
    with pytest.raises(NotImplementedError, match="SOS component order"):
        jpeg.decode_jpeg(bytes(buf))
    # duplicated known ids ([1,1,3]) must be refused too — set equality
    # would let them through to a silently garbled decode
    buf2 = bytearray(jpeg.encode_jpeg(img, 90))
    sos = buf2.index(b"\xff\xda")
    buf2[sos + 7:sos + 9] = buf2[sos + 5:sos + 7]
    with pytest.raises(NotImplementedError, match="SOS component order"):
        jpeg.decode_jpeg(bytes(buf2))


def test_decode_is_linear_not_quadratic():
    """The bit accumulators must stay bounded: a 256x256 noise image
    (the entropy-heaviest case) decodes in well under a second — the
    unbounded-int version took minutes at this size."""
    import time

    img = np.random.default_rng(3).integers(0, 255, (256, 256), dtype=np.int64).astype(np.uint8)
    buf = jpeg.encode_jpeg(img, 90)
    t0 = time.perf_counter()
    out = jpeg.decode_jpeg(buf)
    assert time.perf_counter() - t0 < 5.0  # generous for loaded hosts
    assert out.shape == img.shape


def test_oversize_dimensions_raise_value_error():
    with pytest.raises(ValueError, match="16-bit"):
        jpeg.encode_jpeg(np.zeros((70000, 4), dtype=np.uint8))


def test_trailing_fill_byte_runs_raise_value_error():
    """A stream ending in a 0xFF run must fail with the contractual
    ValueError, not IndexError/struct.error (fill-skip bounds)."""
    for bad in (b"\xff\xd8\xff\xff\xff\xff", b"\xff\xd8\xff\xff\xc4\x00"):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bad)


def test_corrupt_dht_dc_size_category_bounded():
    """A corrupted DHT can declare arbitrary bytes as DC 'symbols'; a
    size category past 15 would read a >2^63 magnitude and overflow the
    int64 coefficient store (found by mutation fuzzing) — must be the
    contractual ValueError instead."""
    img = _smooth(16, 16)
    buf = bytearray(jpeg.encode_jpeg(img, 90))
    dht = buf.index(b"\xff\xc4")
    # DC table values start after marker(2)+len(2)+class(1)+bits(16)
    vals = dht + 21
    buf[vals:vals + 12] = bytes([200] * 12)  # absurd size categories
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(buf))
