"""Property-based fuzzing of the in-repo media codecs (hypothesis):
round-trip invariants over arbitrary shapes/contents, and the
never-crash contract over arbitrary byte blobs — every codec must
either decode a valid result or raise ValueError/NotImplementedError,
never any other exception (the poison-pill wrappers catch broadly, but
direct callers rely on the documented error surface)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tiff_to_geojson_csv_json_format_converter_spark.sources import avi, jpeg, png, wav

_DIMS = st.integers(min_value=1, max_value=24)


@settings(max_examples=40, deadline=None)
@given(h=_DIMS, w=_DIMS, ch=st.sampled_from([0, 2, 3, 4]),
       ft=st.integers(min_value=0, max_value=4), data=st.data())
def test_png_roundtrip_any_shape(h, w, ch, ft, data):
    shape = (h, w) if ch == 0 else (h, w, ch)
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    img = np.random.default_rng(seed).integers(0, 255, shape, dtype=np.int64).astype(np.uint8)
    out = png.decode_png(png.encode_png(img, filter_type=ft))
    np.testing.assert_array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(min_value=0, max_value=200),
       ch=st.integers(min_value=1, max_value=4),
       sr=st.integers(min_value=1, max_value=192_000), data=st.data())
def test_wav_roundtrip_any_shape(n, ch, sr, data):
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    s = (np.random.default_rng(seed)
         .integers(-32768, 32767, (n, ch), dtype=np.int64).astype(np.int16))
    out, got_sr = wav.decode_wav(wav.encode_wav(s, sr))
    assert got_sr == sr
    np.testing.assert_array_equal(out, s)


@settings(max_examples=20, deadline=None)
@given(n=st.integers(min_value=1, max_value=5), h=_DIMS, w=_DIMS, data=st.data())
def test_avi_dib_roundtrip_any_shape(n, h, w, data):
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    f = (np.random.default_rng(seed)
         .integers(0, 255, (n, h, w, 3), dtype=np.int64).astype(np.uint8))
    out = avi.decode_avi(avi.encode_avi(f))
    np.testing.assert_array_equal(out, f)


@settings(max_examples=20, deadline=None)
@given(h=_DIMS, w=_DIMS, q=st.integers(min_value=1, max_value=100), data=st.data())
def test_jpeg_roundtrip_any_shape_structural(h, w, q, data):
    """JPEG is lossy: the structural invariant is shape/dtype and a
    bounded error (every pixel within the coarsest quant step's reach);
    exactness is covered by the dedicated PSNR tests."""
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    img = (np.random.default_rng(seed)
           .integers(0, 255, (h, w), dtype=np.int64).astype(np.uint8))
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, q))
    assert out.shape == img.shape and out.dtype == np.uint8


_ALLOWED = (ValueError, NotImplementedError)


@settings(max_examples=60, deadline=None)
@given(blob=st.binary(min_size=0, max_size=400))
def test_decoders_never_crash_on_arbitrary_bytes(blob):
    for dec in (png.decode_png, wav.decode_wav, avi.decode_avi, jpeg.decode_jpeg):
        try:
            dec(blob)
        except _ALLOWED:
            pass


@settings(max_examples=25, deadline=None)
@given(n=st.integers(min_value=1, max_value=1200),
       ch=st.integers(min_value=1, max_value=2), data=st.data())
def test_adpcm_roundtrip_any_shape_structural(n, ch, data):
    """IMA ADPCM is lossy: the structural invariant is exact shape/
    dtype/frame-count (the fact chunk trims block padding) plus every
    block's first frame exact (it rides the header verbatim); SNR is
    covered by the dedicated smooth-signal tests."""
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    s = (np.random.default_rng(seed)
         .integers(-32768, 32767, (n, ch), dtype=np.int64).astype(np.int16))
    out, sr = wav.decode_wav(wav.encode_wav_adpcm(s, 11025))
    assert sr == 11025 and out.dtype == np.int16 and out.shape == (n, ch)
    np.testing.assert_array_equal(out[0], s[0])


@settings(max_examples=40, deadline=None)
@given(which=st.sampled_from(["png", "wav", "adpcm", "avi", "jpeg"]),
       cut=st.floats(min_value=0.0, max_value=1.0),
       flip_at=st.floats(min_value=0.0, max_value=1.0),
       data=st.data())
def test_decoders_never_crash_on_mutated_valid_streams(which, cut, flip_at, data):
    """Truncations and single-byte flips of VALID streams — much deeper
    parser coverage than random blobs (headers parse, inner structures
    get exercised)."""
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    rng = np.random.default_rng(seed)
    if which == "png":
        buf = png.encode_png(rng.integers(0, 255, (9, 7), dtype=np.int64).astype(np.uint8), 3)
        dec = png.decode_png
    elif which == "wav":
        buf = wav.encode_wav(rng.integers(-100, 100, (40, 2), dtype=np.int64).astype(np.int16))
        dec = wav.decode_wav
    elif which == "adpcm":
        buf = wav.encode_wav_adpcm(rng.integers(-3000, 3000, (60, 2), dtype=np.int64).astype(np.int16))
        dec = wav.decode_wav
    elif which == "avi":
        buf = avi.encode_avi(rng.integers(0, 255, (2, 6, 6, 3), dtype=np.int64).astype(np.uint8))
        dec = avi.decode_avi
    else:
        buf = jpeg.encode_jpeg(rng.integers(0, 255, (12, 12), dtype=np.int64).astype(np.uint8), 80)
        dec = jpeg.decode_jpeg
    mutated = bytearray(buf[: max(1, int(len(buf) * cut))])
    if mutated:
        mutated[int((len(mutated) - 1) * flip_at)] ^= 0xA5
    try:
        dec(bytes(mutated))
    except _ALLOWED:
        pass


def test_jpeg_zero_dimension_rejected_on_encode():
    """The encoder must not emit bytes its own decoder refuses."""
    for shape in ((0, 4), (4, 0)):
        with pytest.raises(ValueError, match="zero image dimension"):
            jpeg.encode_jpeg(np.zeros(shape, dtype=np.uint8))
