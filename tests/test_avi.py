"""Uncompressed-AVI codec (sources/avi.py): lossless round-trip,
sampled-frame parity with full decode, corrupt-byte detection, and the
container-real frame sampling + first-frame decode in multimodal."""

import struct

import numpy as np
import pytest

from tiff_to_geojson_csv_json_format_converter_spark.operators import multimodal
from tiff_to_geojson_csv_json_format_converter_spark.sources import avi, png


def _clip(n, h, w, seed=0, gray=False):
    shape = (n, h, w) if gray else (n, h, w, 3)
    return np.random.default_rng(seed).integers(0, 255, shape, dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (7, 5), (6, 10), (3, 3)])
def test_roundtrip_exact_incl_padded_strides(h, w):
    """BMP rows pad to 4-byte boundaries: widths where w*3 % 4 != 0
    exercise the padding on both encode and decode."""
    f = _clip(4, h, w, seed=h * w)
    out = avi.decode_avi(avi.encode_avi(f, fps=10))
    assert out.shape == f.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out, f)


def test_gray_input_stored_as_equal_channels():
    f = _clip(2, 6, 6, seed=2, gray=True)
    out = avi.decode_avi(avi.encode_avi(f))
    np.testing.assert_array_equal(out, np.repeat(f[:, :, :, None], 3, axis=3))


def test_sampled_frames_equal_full_decode_stride():
    f = _clip(11, 5, 7, seed=3)
    buf = avi.encode_avi(f)
    full = avi.decode_avi(buf)
    samp = avi.sample_avi_frames(buf, 3)
    assert [i for i, _ in samp] == [0, 3, 6, 9]
    for i, fr in samp:
        np.testing.assert_array_equal(fr, full[i])


def test_corrupt_bytes_raise_value_error():
    f = _clip(3, 4, 4, seed=4)
    good = avi.encode_avi(f)
    with pytest.raises(ValueError, match="magic"):
        avi.decode_avi(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        avi.decode_avi(good[: len(good) - 20])


def test_unsupported_compression_raises_not_implemented():
    f = _clip(2, 4, 4, seed=5)
    buf = bytearray(avi.encode_avi(f))
    strf_pos = buf.index(b"strf") + 8
    # 'H264' fourcc: an inter-frame codec the engine cannot decode
    buf[strf_pos + 16:strf_pos + 20] = struct.pack("<I", 0x34363248)
    with pytest.raises(NotImplementedError, match="DIB or MJPG"):
        avi.decode_avi(bytes(buf))
    # MJPG header over raw DIB frame bytes = corrupt stream, DETECTED
    buf[strf_pos + 16:strf_pos + 20] = struct.pack("<I", 0x47504A4D)
    with pytest.raises(ValueError):
        avi.decode_avi(bytes(buf))


def test_decode_media_avi_first_frame_luma():
    f = _clip(5, 8, 8, seed=6)
    got = multimodal.decode_media(avi.encode_avi(f), "video", "avi")
    np.testing.assert_array_equal(got, png.luma_u8(f[0]))


def test_sample_frames_row_avi_parses_container():
    f = _clip(30, 8, 8, seed=7)
    buf = avi.encode_avi(f)
    out = multimodal._sample_frames_row(buf, "avi", 30, 10)
    assert [i for i, _ in out] == [0, 10, 20]
    for i, fb in out:
        np.testing.assert_array_equal(
            np.frombuffer(fb, dtype=np.uint8).reshape(8, 8, 3), f[i]
        )


def test_synth_media_rows_video_mixes_real_avi_and_stub():
    rows = multimodal.synth_media_rows(64)
    fmts = {fmt for (_m, mt, fmt, *_r) in rows if mt == "video"}
    assert fmts == {"avi", "mp4"}
    for (_m, mt, fmt, buf, w, h, nf, _sr) in rows:
        if fmt == "avi":
            clip = avi.decode_avi(bytes(buf))
            assert clip.shape == (nf, h, w, 3)


def test_topdown_negative_height_decodes_unflipped():
    """Negative biHeight (top-down DIB) means rows are stored first-row-
    first: the decoder must NOT flip them."""
    f = _clip(2, 4, 4, seed=8)
    buf = bytearray(avi.encode_avi(f))
    # rewrite biHeight in strf to negative and re-pack each frame top-down
    strf_pos = buf.index(b"strf") + 8
    (h,) = struct.unpack("<i", buf[strf_pos + 8:strf_pos + 12])
    buf[strf_pos + 8:strf_pos + 12] = struct.pack("<i", -h)
    # frames were written bottom-up BGR; flip each payload's rows so the
    # bytes are genuinely top-down
    pos = 0
    stride = 4 * 3
    while True:
        pos = buf.find(b"00db", pos)
        if pos < 0:
            break
        payload = np.frombuffer(bytes(buf[pos + 8:pos + 8 + stride * 4]),
                                dtype=np.uint8).reshape(4, stride)
        buf[pos + 8:pos + 8 + stride * 4] = payload[::-1].tobytes()
        pos += 8
    out = avi.decode_avi(bytes(buf))
    np.testing.assert_array_equal(out, f)


def test_first_frame_equals_full_decode_frame0():
    f = _clip(9, 6, 6, seed=9)
    buf = avi.encode_avi(f)
    np.testing.assert_array_equal(avi.first_frame(buf), f[0])


def test_single_rgb_frame_3d_input_rejected_not_misencoded():
    with pytest.raises(ValueError, match="ambiguous"):
        avi.encode_avi(np.zeros((16, 16, 3), dtype=np.uint8))


def test_sample_frames_row_poison_pill_sentinel():
    """Corrupt avi bytes must yield the (-1, b'') sentinel, never raise
    out of the sampler (task-kill in the Spark kernel)."""
    good = avi.encode_avi(_clip(3, 4, 4, seed=10))
    out = multimodal._sample_frames_row(good[:30], "avi", 3, 1)
    assert out == [(-1, b"")]


def test_sample_frames_row_stub_path_defensive():
    """The non-AVI fallback honors the same poison-pill contract as the
    AVI branch: every_n=0 must not raise (range step 0) and a NaN
    n_frames (NaN is truthy, int(nan) raises) yields the sentinel."""
    buf = b"x" * 40
    # every_n=0 clamps to 1: 4 frames of 10 bytes each
    out = multimodal._sample_frames_row(buf, "mp4", 4, 0)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    assert multimodal._sample_frames_row(buf, "mp4", float("nan"), 2) == [(-1, b"")]
    assert multimodal._sample_frames_row(buf, "mp4", None, 2) == [(-1, b"")]
    # negative frame counts are corrupt metadata, not zero-frame clips
    assert multimodal._sample_frames_row(buf, "mp4", -1, 2) == [(-1, b"")]
    # zero frames stays a legitimate empty clip
    assert multimodal._sample_frames_row(buf, "mp4", 0, 2) == []


def test_list_chunk_with_undersized_length_rejected():
    """A LIST chunk declaring length < 4 cannot hold its list type; the
    walk must fail cleanly instead of slicing past the payload."""
    from tiff_to_geojson_csv_json_format_converter_spark.sources import riff

    buf = b"LIST" + struct.pack("<I", 2) + b"zz"
    with pytest.raises(ValueError, match="LIST chunk"):
        list(riff.walk(buf, 0, len(buf)))


def test_mjpeg_roundtrip_psnr_and_sampling():
    """MJPG codec: JPEG frames in the AVI container — PSNR-gated
    round-trip on smooth content, index-only sampling, first_frame,
    and decode_media all flow through the same paths as DIB."""
    y, x = np.mgrid[0:16, 0:16]
    frames = np.stack([
        np.repeat((((x * 3 + y * 2 + t * 7) % 256).astype(np.uint8))[:, :, None], 3, axis=2)
        for t in range(6)
    ])
    buf = avi.encode_avi(frames, codec="MJPG", quality=95)
    out = avi.decode_avi(buf)
    assert out.shape == frames.shape
    mse = float(np.mean((out.astype(np.float64) - frames.astype(np.float64)) ** 2))
    assert 10 * np.log10(255.0**2 / mse) >= 40.0
    samp = avi.sample_avi_frames(buf, 3)
    assert [i for i, _ in samp] == [0, 3]
    np.testing.assert_array_equal(avi.first_frame(buf), out[0])
    got = multimodal.decode_media(buf, "video", "avi")
    assert got.shape == (16, 16)


def test_synth_media_rows_video_rotates_dib_mjpg_stub():
    rows = multimodal.synth_media_rows(64)
    kinds = set()
    for (_m, mt, fmt, buf, _w, _h, _nf, _sr) in rows:
        if mt != "video":
            continue
        if fmt == "mp4":
            kinds.add("stub")
        else:
            w_, h_, _td, codec, frames = avi._parse_avi(bytes(buf))
            kinds.add(codec)
            assert len(frames) == 30
    assert kinds == {"dib", "mjpg", "stub"}


def test_dhtless_mjpg_and_empty_clip_classified():
    """AVI1-convention MJPG frames (no DHT) are a clear
    NotImplementedError from the frame decode path, not a generic
    corrupt error; empty clips fail encode with a meaningful
    ValueError."""
    from tiff_to_geojson_csv_json_format_converter_spark.sources import jpeg as _jpeg

    y, x = np.mgrid[0:8, 0:8]
    img = ((x + y) % 256).astype(np.uint8)
    frame = bytearray(_jpeg.encode_jpeg(img, 90))
    # strip every DHT segment -> the AVI1 fixed-table frame shape
    while True:
        i = bytes(frame).find(b"\xff\xc4")
        if i < 0:
            break
        (ln,) = struct.unpack(">H", frame[i + 2:i + 4])
        del frame[i:i + 2 + ln]
    with pytest.raises(ValueError, match="missing Huffman table"):
        _jpeg.decode_jpeg(bytes(frame))
    with pytest.raises(NotImplementedError, match="AVI1"):
        avi._decode_frame(bytes(frame), 0, len(frame), 8, 8, False, "mjpg")
    for codec in ("MJPG", "DIB"):
        with pytest.raises(ValueError, match="empty clip"):
            avi.encode_avi(np.zeros((0, 8, 8, 3), dtype=np.uint8), codec=codec)
