"""WAV/PCM16 codec (sources/wav.py): lossless round-trip, chunk-walk
robustness, corrupt-byte detection, and the de-stubbed audio path in
decode_media."""

import struct

import numpy as np
import pytest

from tiff_to_geojson_csv_json_format_converter_spark.operators import multimodal
from tiff_to_geojson_csv_json_format_converter_spark.sources import wav


def _pcm(n, ch, seed=0):
    return (
        np.random.default_rng(seed)
        .integers(-32768, 32767, (n, ch), dtype=np.int64)
        .astype(np.int16)
    )


@pytest.mark.parametrize("ch", [1, 2, 4])
@pytest.mark.parametrize("n", [1, 7, 256])
def test_roundtrip_exact(n, ch):
    s = _pcm(n, ch, seed=n + ch)
    out, sr = wav.decode_wav(wav.encode_wav(s, 22050))
    assert sr == 22050 and out.dtype == np.int16 and out.shape == (n, ch)
    np.testing.assert_array_equal(out, s)


def test_mono_1d_input_roundtrips_as_one_channel():
    s = _pcm(64, 1, seed=3)[:, 0]
    out, _ = wav.decode_wav(wav.encode_wav(s))
    np.testing.assert_array_equal(out, s[:, None])


def test_extra_chunks_are_skipped_word_aligned():
    """Real WAV files carry LIST/INFO chunks (odd lengths are padded to
    word boundaries) before data — the chunk walk must skip them."""
    s = _pcm(16, 1, seed=4)
    good = wav.encode_wav(s, 8000)
    # splice an odd-length junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    spliced = good[:fmt_end] + junk + good[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, sr = wav.decode_wav(spliced)
    assert sr == 8000
    np.testing.assert_array_equal(out, s)


def test_corrupt_bytes_raise_value_error():
    s = _pcm(32, 2, seed=5)
    good = wav.encode_wav(s)
    with pytest.raises(ValueError, match="magic"):
        wav.decode_wav(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        wav.decode_wav(good[: len(good) // 2])
    # data not a whole number of frames
    bad = bytearray(good)
    (dlen,) = struct.unpack("<I", bad[40:44])
    bad[40:44] = struct.pack("<I", dlen - 1)
    bad2 = bad[:-1]
    bad2[4:8] = struct.pack("<I", len(bad2) - 8)
    with pytest.raises(ValueError, match="frames"):
        wav.decode_wav(bytes(bad2))


def test_non_pcm16_raises_not_implemented():
    s = _pcm(8, 1, seed=6)
    buf = bytearray(wav.encode_wav(s))
    buf[20:22] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(NotImplementedError, match="PCM16"):
        wav.decode_wav(bytes(buf))


def test_decode_media_wav_real_bytes():
    """decode_media('wav') is a real decode: the (frames, channels)
    high-byte envelope, deterministic."""
    s = _pcm(100, 2, seed=7)
    got = multimodal.decode_media(wav.encode_wav(s), "audio", "wav")
    want = ((s.astype(np.int64) >> 8) + 128).astype(np.uint8)
    assert got.shape == (100, 2)
    np.testing.assert_array_equal(got, want)


def test_synth_media_rows_audio_is_real_wav():
    rows = multimodal.synth_media_rows(64)
    n_audio = 0
    for (_m, mt, fmt, buf, _w, _h, _nf, sr) in rows:
        if mt == "audio":
            assert fmt == "wav"
            samples, srate = wav.decode_wav(bytes(buf))
            assert srate == 16000 == sr and samples.shape[1] in (1, 2)
            n_audio += 1
    assert n_audio > 0


def test_trailing_tagger_bytes_after_riff_payload_ignored():
    """ID3 tags / padding appended AFTER the declared RIFF payload are
    not chunks: the bounded walk must ignore them, not parse them."""
    s = _pcm(32, 2, seed=9)
    out, sr = wav.decode_wav(wav.encode_wav(s, 44100) + b"ID3\x04junkjunkjunk")
    assert sr == 44100
    np.testing.assert_array_equal(out, s)
