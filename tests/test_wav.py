"""From-scratch WAV codec (functions/wav.py) + real audio features
(operators/multimodal.py::audio_features).

Round-trips pin the sample math per bit depth; the refusal tests pin the
ValueError contract (lying chunk sizes must never escape as IndexError);
the Spark test drives the real decode end to end through the Arrow stage.
"""

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions.wav import (
    audio_feature_row,
    decode_wav,
    encode_wav,
)


def _sine(n=500, rate=16000, freq=440.0, ch=1):
    t = np.arange(n, dtype=np.float64)
    mono = 0.6 * np.sin(2 * np.pi * freq * t / rate)
    return np.stack([mono] * ch, axis=1)


class TestRoundTrip:
    # tol per depth = quantizer step/2 + full-scale convention skew
    # (encode scales by 2^(b-1)-1, decode divides by 2^(b-1): adds |x|/2^(b-1))
    @pytest.mark.parametrize("bits,tol", [(8, 0.01), (16, 4e-5),
                                          (24, 2e-7), (32, 1e-9), (-32, 1e-7)])
    def test_bit_depths(self, bits, tol):
        x = _sine()
        got, rate = decode_wav(encode_wav(x, 16000, bits=bits))
        assert rate == 16000
        assert got.shape == x.shape
        assert np.abs(got - x).max() < tol

    def test_stereo_interleave(self):
        x = _sine(ch=2)
        x[:, 1] *= 0.5  # distinct channels prove interleave order survives
        got, _ = decode_wav(encode_wav(x, 8000, bits=16))
        assert got.shape == x.shape
        assert np.abs(got - x).max() < 1e-4

    def test_deterministic_bytes(self):
        x = _sine(123)
        assert encode_wav(x, 44100) == encode_wav(x, 44100)

    def test_odd_payload_word_alignment(self):
        # 8-bit mono with odd frame count → odd data chunk → pad byte
        x = _sine(333)
        data = encode_wav(x, 8000, bits=8)
        got, _ = decode_wav(data)
        assert got.shape == x.shape


class TestRefusals:
    def test_not_wav(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"\x89PNG\r\n\x1a\nnot audio")

    def test_missing_data_chunk(self):
        data = bytearray(encode_wav(_sine(64), 8000))
        i = data.find(b"data")
        data[i : i + 4] = b"junk"
        with pytest.raises(ValueError, match="missing fmt/data"):
            decode_wav(bytes(data))

    def test_compressed_tag_refused(self):
        data = bytearray(encode_wav(_sine(64), 8000))
        i = data.find(b"fmt ")
        data[i + 8] = 0x55  # MP3 format tag
        with pytest.raises(ValueError, match="unsupported WAV format"):
            decode_wav(bytes(data))

    def test_lying_fmt_size_raises_valueerror(self):
        data = bytearray(encode_wav(_sine(64), 8000))
        i = data.find(b"fmt ")
        data[i + 4 : i + 8] = (4).to_bytes(4, "little")  # fmt body cut to 4 bytes
        with pytest.raises(ValueError):
            decode_wav(bytes(data))

    def test_encode_bad_input(self):
        with pytest.raises(ValueError, match="bits"):
            encode_wav(_sine(16), 8000, bits=12)
        with pytest.raises(ValueError, match="sample_rate"):
            encode_wav(_sine(16), 0)


class TestG711:
    """ITU-T G.711 mu-law/A-law — values pinned to the published tables."""

    def test_published_table_anchors(self):
        from osm_data_3d_tiles_spark.functions.wav import alaw_decode, mulaw_decode

        all_mu = mulaw_decode(np.arange(256, dtype=np.uint8)) * 32768
        all_al = alaw_decode(np.arange(256, dtype=np.uint8)) * 32768
        # mu-law: peak +/-32124, two exact-zero codewords (0x7F and 0xFF)
        assert all_mu.max() == 32124 and all_mu.min() == -32124
        assert all_mu[0x7F] == 0 and all_mu[0xFF] == 0
        # A-law: peak +/-32256, no zero (smallest magnitude 8)
        assert all_al.max() == 32256 and all_al.min() == -32256
        assert np.abs(all_al).min() == 8

    @pytest.mark.parametrize("law", ["ulaw", "alaw"])
    def test_codeword_round_trip_exact(self, law):
        from osm_data_3d_tiles_spark.functions.wav import (
            alaw_decode, alaw_encode, mulaw_decode, mulaw_encode)

        dec = mulaw_decode if law == "ulaw" else alaw_decode
        enc = mulaw_encode if law == "ulaw" else alaw_encode
        v = dec(np.arange(256, dtype=np.uint8))
        # nearest-codeword encode of an exact table value must reproduce it
        assert np.array_equal(dec(enc(v)), v)

    @pytest.mark.parametrize("law", ["ulaw", "alaw"])
    def test_wav_round_trip(self, law):
        # top-segment step is 1024/32768, so worst-case error ~0.016
        x = _sine()
        got, rate = decode_wav(encode_wav(x, 16000, bits=law))
        assert rate == 16000 and got.shape == x.shape
        assert np.abs(got - x).max() < 0.02

    def test_stereo_interleave(self):
        x = _sine(ch=2)
        x[:, 1] *= 0.5
        got, _ = decode_wav(encode_wav(x, 8000, bits="ulaw"))
        assert np.abs(got - x).max() < 0.02

    def test_extensible_wrap(self):
        # rewrite the fmt chunk as WAVE_FORMAT_EXTENSIBLE with SubFormat 7
        x = _sine(64)
        data = bytearray(encode_wav(x, 8000, bits="ulaw"))
        i = data.find(b"fmt ")
        body = data[i + 8 : i + 8 + 16]
        ext = bytearray(body)
        ext[0:2] = (0xFFFE).to_bytes(2, "little")
        ext += (22).to_bytes(2, "little")           # cbSize
        ext += (8).to_bytes(2, "little")            # valid bits
        ext += (0).to_bytes(4, "little")            # channel mask
        ext += (7).to_bytes(2, "little") + b"\x00" * 14  # SubFormat GUID
        rebuilt = (
            bytes(data[:i]) + b"fmt " + len(ext).to_bytes(4, "little") + bytes(ext)
            + bytes(data[i + 8 + 16 :])
        )
        # fix the RIFF size for the 24 extra fmt bytes
        rebuilt = (
            rebuilt[:4]
            + (len(rebuilt) - 8).to_bytes(4, "little")
            + rebuilt[8:]
        )
        got, rate = decode_wav(rebuilt)
        assert rate == 8000
        assert np.abs(got - x).max() < 0.02


class TestImaAdpcm:
    """IMA/DVI ADPCM (tag 0x11): 4-bit delta coding, published step tables."""

    def test_sine_round_trip_snr(self):
        # typical IMA ADPCM fidelity is 30+ dB on a full-band sine
        t = np.arange(2000) / 16000.0
        x = (0.7 * np.sin(2 * np.pi * 440 * t))[:, None]
        got, rate = decode_wav(encode_wav(x, 16000, bits="adpcm"))
        assert rate == 16000 and got.shape == x.shape
        err = got - x
        snr = 10 * np.log10((x**2).mean() / (err**2).mean())
        assert snr > 30, snr
        assert np.abs(err).max() < 0.05

    def test_stereo_channels_independent(self):
        t = np.arange(1500) / 16000.0
        x = np.stack(
            [0.6 * np.sin(2 * np.pi * 300 * t), 0.3 * np.sin(2 * np.pi * 750 * t)],
            axis=1,
        )
        got, _ = decode_wav(encode_wav(x, 16000, bits="adpcm"))
        assert got.shape == x.shape
        assert np.abs(got - x).max() < 0.05

    @pytest.mark.parametrize("n", [1, 7, 504, 505, 506, 1011])
    def test_fact_chunk_preserves_frame_count(self, n):
        # spb=505 for mono/256-byte blocks: cover below/at/above boundaries
        x = (0.5 * np.sin(2 * np.pi * 5 * np.arange(n) / 100.0))[:, None]
        got, _ = decode_wav(encode_wav(x, 8000, bits="adpcm"))
        assert got.shape == (n, 1)

    def test_extensible_wrap_reads_samples_per_block(self):
        # EXTENSIBLE-wrapped IMA ADPCM: wSamplesPerBlock lives in the
        # extensible Samples union (offset 18), readable only AFTER the
        # SubFormat unwrap. Declare spb=500 (< the 505-sample nibble capacity
        # of a mono 256-byte block) with no fact chunk: each block must trim
        # to 500 frames (regression: round-5 review — before the fix the
        # extensible path left samples_per_block=None and emitted all 505)
        n = 1010  # exactly 2 full mono blocks at the encoder's spb=505
        x = (0.5 * np.sin(2 * np.pi * 5 * np.arange(n) / 100.0))[:, None]
        data = encode_wav(x, 8000, bits="adpcm")
        i = data.find(b"fmt ")
        body = data[i + 8 : i + 8 + 20]  # tag..bits(16) + cbSize(2) + spb(2)
        ext = (
            (0xFFFE).to_bytes(2, "little") + body[2:16]
            + (22).to_bytes(2, "little")       # cbSize
            + (500).to_bytes(2, "little")      # Samples union = wSamplesPerBlock
            + (0).to_bytes(4, "little")        # channel mask
            + (0x11).to_bytes(2, "little") + b"\x00" * 14  # SubFormat GUID
        )
        j = data.find(b"fact")
        k = data.find(b"data")
        assert 0 < j < k  # encoder emits fact before data; drop it
        rebuilt = (
            data[:i] + b"fmt " + len(ext).to_bytes(4, "little") + ext + data[k:]
        )
        rebuilt = rebuilt[:4] + (len(rebuilt) - 8).to_bytes(4, "little") + rebuilt[8:]
        got, rate = decode_wav(rebuilt)
        assert rate == 8000
        assert got.shape == (1000, 1)  # 2 blocks × declared spb, not 2 × 505
        # block 0 holds original frames 0..499, block 1 frames 505..1004
        assert np.abs(got[:500] - x[:500]).max() < 0.05
        assert np.abs(got[500:] - x[505:1005]).max() < 0.05

    def test_bad_step_index_refused(self):
        x = _sine(600)
        data = bytearray(encode_wav(x, 8000, bits="adpcm"))
        i = data.find(b"data")
        data[i + 8 + 2] = 89  # first block header's step index out of range
        with pytest.raises(ValueError, match="step index"):
            decode_wav(bytes(data))

    def test_random_walk_tracks_tightly(self):
        # smooth signals are ADPCM's sweet spot: error ~ one step
        rng = np.random.default_rng(7)
        x = np.clip(np.cumsum(rng.normal(0, 0.004, 5000)), -0.9, 0.9)[:, None]
        got, _ = decode_wav(encode_wav(x, 8000, bits="adpcm"))
        assert np.abs(got - x).max() < 0.02


class TestFeatures:
    def test_feature_row_values(self):
        x = _sine(1000, rate=1000, freq=10.0)
        row = audio_feature_row(x, 1000)
        assert row["n_frames"] == 1000 and row["duration_s"] == 1.0
        # RMS of a 0.6-amplitude sine = 0.6/sqrt(2)
        assert abs(row["rms"] - 0.6 / np.sqrt(2)) < 1e-3
        assert abs(row["peak"] - 0.6) < 1e-3
        # a 10 Hz sine over 1 s crosses zero 20 times / 999 transitions
        assert abs(row["zero_cross_rate"] - 20 / 999) < 2e-3

    def test_empty_clip(self):
        row = audio_feature_row(np.zeros((0, 1)), 8000)
        assert row["n_frames"] == 0 and row["rms"] == 0.0


class TestSparkAudioStage:
    def test_audio_features_real_wav(self, spark):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            audio_features,
            make_wav_media_fixture,
        )

        media = make_wav_media_fixture(spark, n=12)
        out = audio_features(media).toPandas().sort_values("media_id")
        assert len(out) == 12
        assert out["decoded"].all()
        assert (out["sample_rate"].isin([8000, 16000, 44100])).all()
        assert (out["n_frames"] >= 256).all()
        assert (out["rms"] > 0.1).all() and (out["peak"] <= 1.0).all()
        # recompute one row driver-side for parity with the Arrow stage
        pdf = media.filter("media_id = 0").toPandas()
        samples, rate = decode_wav(bytes(pdf["payload"][0]))
        want = audio_feature_row(samples, rate)
        got = out[out["media_id"] == 0].iloc[0]
        assert got["n_frames"] == want["n_frames"]
        assert abs(got["rms"] - want["rms"]) < 1e-12

    def test_non_wav_payload_degrades_not_fails(self, spark):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            audio_features,
            make_media_fixture,
        )

        media = make_media_fixture(spark, n=9)  # audio payloads are junk bytes
        out = audio_features(media).toPandas()
        assert len(out) == 3  # kinds cycle image/audio/video
        assert (~out["decoded"]).all()
        assert (out["n_frames"] == 0).all()
