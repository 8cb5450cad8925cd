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


def _smooth(n, ch, seed=0):
    """ADPCM-friendly content: band-limited sum of sines (differential
    codecs are built for smooth signals; white noise is their worst
    case, like noise for JPEG)."""
    t = np.arange(n)
    base = (8000 * np.sin(t / 29.0) + 2500 * np.sin(t / 7.0 + seed)).astype(np.int16)
    cols = [base] + [(base // (2 + c)).astype(np.int16) for c in range(1, ch)]
    return np.stack(cols, axis=1)


class TestAdpcm:
    @pytest.mark.parametrize("ch", [1, 2])
    @pytest.mark.parametrize("n", [1, 504, 505, 506, 1700])
    def test_roundtrip_shape_and_snr(self, n, ch):
        """Lossy but bounded: smooth signals round-trip at >= 25 dB SNR
        (IMA ADPCM's design point is 30-40 dB); shape, dtype, and the
        fact-chunk frame trim are exact across block boundaries
        (505 frames/block)."""
        s = _smooth(n, ch, seed=n)
        buf = wav.encode_wav_adpcm(s, 8000)
        out, sr = wav.decode_wav(buf)
        assert sr == 8000 and out.dtype == np.int16 and out.shape == (n, ch)
        num = float((s.astype(np.float64) ** 2).mean())
        err = float(((out.astype(np.float64) - s) ** 2).mean())
        assert 10 * np.log10(max(num, 1.0) / max(err, 1e-9)) >= 25.0

    def test_first_frame_is_exact(self):
        """The block header carries sample 0 verbatim — every block's
        first frame decodes exactly."""
        s = _smooth(1100, 1, seed=4)
        out, _ = wav.decode_wav(wav.encode_wav_adpcm(s))
        spb = wav.IMA_BLOCK_FRAMES
        for b in range(-(-len(s) // spb)):
            np.testing.assert_array_equal(out[b * spb], s[b * spb])

    def test_compression_ratio_is_4x_ish(self):
        s = _smooth(wav.IMA_BLOCK_FRAMES * 4, 1, seed=2)
        buf = wav.encode_wav_adpcm(s)
        assert len(buf) < s.size * 2 / 3.5  # ~4x vs PCM16 minus headers

    def test_stereo_channels_are_independent(self):
        """The 4-byte-group interleave must not leak samples across
        channels: a silent right channel stays silent."""
        left = _smooth(600, 1, seed=5)[:, 0]
        s = np.stack([left, np.zeros(600, dtype=np.int16)], axis=1)
        out, _ = wav.decode_wav(wav.encode_wav_adpcm(s))
        np.testing.assert_array_equal(out[:, 1], np.zeros(600, dtype=np.int16))
        assert np.abs(out[:, 0].astype(np.int64) - left).mean() < 500

    def test_corrupt_adpcm_raises(self):
        s = _smooth(600, 1, seed=6)
        good = wav.encode_wav_adpcm(s)
        # byte-level truncation dies at the RIFF bound check
        with pytest.raises(ValueError, match="truncated"):
            wav.decode_wav(good[:-3])
        # consistent container, data chunk NOT whole ADPCM blocks
        cut = bytearray(good[:-3])
        data_len_pos = cut.index(b"data") + 4
        (dlen,) = struct.unpack("<I", cut[data_len_pos:data_len_pos + 4])
        cut[data_len_pos:data_len_pos + 4] = struct.pack("<I", dlen - 3)
        cut[4:8] = struct.pack("<I", len(cut) - 8)
        with pytest.raises(ValueError, match="whole blocks"):
            wav.decode_wav(bytes(cut))
        bad = bytearray(good)
        # step index byte of block 0 header -> 200 (> 88)
        data_pos = bad.index(b"data") + 8
        bad[data_pos + 2] = 200
        with pytest.raises(ValueError, match="step index"):
            wav.decode_wav(bytes(bad))

    def test_decode_media_handles_adpcm_rows(self):
        s = _smooth(700, 2, seed=7)
        got = multimodal.decode_media(wav.encode_wav_adpcm(s), "audio", "wav")
        assert got.shape == (700, 2) and got.dtype == np.uint8

    def test_synth_media_rotates_compressed_audio(self):
        rows = multimodal.synth_media_rows(64)
        tags = set()
        for (_m, mt, fmt, buf, _w, _h, _nf, _sr) in rows:
            if mt == "audio":
                tags.add(struct.unpack("<H", bytes(buf[20:22]))[0])
                samples, _ = wav.decode_wav(bytes(buf))
                assert samples.dtype == np.int16
        assert tags == {1, 6, 7, 17}  # PCM16, A-law, mu-law, ADPCM all present

    def test_stereo_group_misaligned_block_align_raises(self):
        """Channel-even but non-4-byte-group block_align (e.g. 20) must
        be a descriptive ValueError, not a numpy broadcast error."""
        s = _smooth(600, 2, seed=8)
        buf = bytearray(wav.encode_wav_adpcm(s))
        fmt_pos = buf.index(b"fmt ") + 8
        # block_align field (offset 12 into fmt) -> 20; shrink data to
        # whole 20-byte blocks so the size check passes first
        buf[fmt_pos + 12:fmt_pos + 14] = struct.pack("<H", 20)
        data_pos = buf.index(b"data")
        (dlen,) = struct.unpack("<I", buf[data_pos + 4:data_pos + 8])
        keep = (dlen // 20) * 20
        del buf[data_pos + 8 + keep:data_pos + 8 + dlen]
        buf[data_pos + 4:data_pos + 8] = struct.pack("<I", keep)
        buf[4:8] = struct.pack("<I", len(buf) - 8)
        with pytest.raises(ValueError, match="nibble group"):
            wav.decode_wav(bytes(buf))


class TestMulaw:
    def test_code_identity_all_256(self):
        """encode(decode(u)) == u for every code except 0x7F (negative
        zero), which decodes to 0 and re-encodes to the canonical
        positive-zero 0xFF — the standard G.711 degeneracy."""
        u = np.arange(256, dtype=np.uint8)
        re = wav.mulaw_encode_i16(wav.mulaw_decode_u8(u))
        assert (re != u).sum() == 1 and re[127] == 0xFF

    @pytest.mark.parametrize("ch", [1, 2])
    def test_roundtrip_snr_and_shape(self, ch):
        s = _smooth(3000, ch, seed=11)
        out, sr = wav.decode_wav(wav.encode_wav_mulaw(s, 8000))
        assert sr == 8000 and out.dtype == np.int16 and out.shape == s.shape
        num = float((s.astype(np.float64) ** 2).mean())
        err = float(((out.astype(np.float64) - s) ** 2).mean())
        # mu-law design point: ~38 dB SNR at near-full-scale signals
        assert 10 * np.log10(max(num, 1.0) / max(err, 1e-9)) >= 30.0

    def test_quantization_is_monotone_and_signed(self):
        vals = np.array([-32768, -12345, -1, 0, 1, 500, 32767], dtype=np.int16)
        dec = wav.mulaw_decode_u8(wav.mulaw_encode_i16(vals)).astype(np.int64)
        assert np.all(np.diff(dec) >= 0)
        assert dec[0] < 0 < dec[-1] and abs(dec[3]) <= 4

    def test_ragged_data_chunk_raises(self):
        s = _smooth(100, 2, seed=12)
        buf = bytearray(wav.encode_wav_mulaw(s))
        data_pos = buf.index(b"data")
        (dlen,) = struct.unpack("<I", buf[data_pos + 4:data_pos + 8])
        del buf[data_pos + 8 + dlen - 1]  # odd byte count, 2 channels
        buf[data_pos + 4:data_pos + 8] = struct.pack("<I", dlen - 1)
        buf[4:8] = struct.pack("<I", len(buf) - 8)
        with pytest.raises(ValueError, match="whole number of frames"):
            wav.decode_wav(bytes(buf))

    def test_decode_media_handles_mulaw_rows(self):
        s = _smooth(700, 2, seed=13)
        got = multimodal.decode_media(wav.encode_wav_mulaw(s), "audio", "wav")
        assert got.shape == (700, 2) and got.dtype == np.uint8


class TestAlaw:
    def test_code_identity_all_256(self):
        """A-law has no zero degeneracy: every one of the 256 codes
        decodes to its segment midpoint and re-encodes to itself."""
        u = np.arange(256, dtype=np.uint8)
        re = wav.alaw_encode_i16(wav.alaw_decode_u8(u))
        np.testing.assert_array_equal(re, u)

    @pytest.mark.parametrize("ch", [1, 2])
    def test_roundtrip_snr_and_shape(self, ch):
        s = _smooth(3000, ch, seed=14)
        out, sr = wav.decode_wav(wav.encode_wav_alaw(s, 8000))
        assert sr == 8000 and out.dtype == np.int16 and out.shape == s.shape
        num = float((s.astype(np.float64) ** 2).mean())
        err = float(((out.astype(np.float64) - s) ** 2).mean())
        # A-law: ~37-38 dB SNR at near-full-scale signals
        assert 10 * np.log10(max(num, 1.0) / max(err, 1e-9)) >= 30.0

    def test_sign_convention_and_monotone(self):
        vals = np.array([-32768, -4000, -8, 0, 8, 4000, 32767], dtype=np.int16)
        dec = wav.alaw_decode_u8(wav.alaw_encode_i16(vals)).astype(np.int64)
        assert np.all(np.diff(dec) >= 0)
        assert dec[0] < 0 < dec[-1]

    def test_decode_media_handles_alaw_rows(self):
        s = _smooth(700, 1, seed=15)
        got = multimodal.decode_media(wav.encode_wav_alaw(s), "audio", "wav")
        assert got.shape == (700, 1) and got.dtype == np.uint8


def test_trailing_tagger_bytes_after_riff_payload_ignored():
    """ID3 tags / padding appended AFTER the declared RIFF payload are
    not chunks: the bounded walk must ignore them, not parse them."""
    s = _pcm(32, 2, seed=9)
    out, sr = wav.decode_wav(wav.encode_wav(s, 44100) + b"ID3\x04junkjunkjunk")
    assert sr == 44100
    np.testing.assert_array_equal(out, s)
