"""MJPEG-AVI container codec (functions/avi.py) + real video frame sampling
(operators/multimodal.py::sample_video_frames)."""

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions.avi import encode_avi_mjpeg, read_avi_mjpeg
from osm_data_3d_tiles_spark.functions.jpeg import decode_jpeg


def _clip(n_frames=6, h=24, w=32):
    frames = []
    for t in range(n_frames):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.empty((h, w, 3), dtype=np.uint8)
        img[..., 0] = ((xx + 3 * t) * 255) // max(w - 1, 1) % 256
        img[..., 1] = (yy * 255) // max(h - 1, 1)
        img[..., 2] = (t * 40) % 256
        frames.append(img)
    return frames


class TestContainer:
    def test_round_trip_structure(self):
        frames = _clip()
        data = encode_avi_mjpeg(frames, fps=10.0)
        clip = read_avi_mjpeg(data)
        assert clip["n_frames"] == 6 and len(clip["frames"]) == 6
        assert clip["fps"] == pytest.approx(10.0)
        assert clip["width"] == 32 and clip["height"] == 24

    def test_frames_decode_as_jpeg(self):
        frames = _clip(n_frames=3)
        clip = read_avi_mjpeg(encode_avi_mjpeg(frames, fps=5.0, quality=95))
        for orig, payload in zip(frames, clip["frames"]):
            img = decode_jpeg(payload)
            assert img.shape == orig.shape
            # lossy codec: gradients should still land close
            assert np.abs(img.astype(int) - orig.astype(int)).mean() < 12

    def test_deterministic_bytes(self):
        frames = _clip(3)
        assert encode_avi_mjpeg(frames, 10.0) == encode_avi_mjpeg(frames, 10.0)

    def test_not_avi(self):
        with pytest.raises(ValueError, match="RIFF/AVI"):
            read_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")

    def test_truncated_chunk(self):
        data = bytearray(encode_avi_mjpeg(_clip(2), 10.0))
        with pytest.raises(ValueError, match="truncated|overruns|no video"):
            read_avi_mjpeg(bytes(data[: len(data) // 2]))

    def test_no_frames(self):
        with pytest.raises(ValueError, match="at least one frame"):
            encode_avi_mjpeg([], 10.0)

    def test_mismatched_dims(self):
        with pytest.raises(ValueError, match="share dimensions"):
            encode_avi_mjpeg([_clip(1)[0], _clip(1, h=8, w=8)[0]], 10.0)


class TestAudioTrack:
    """Interleaved `auds` stream: encode_avi_mjpeg(audio=...) ↔ read_avi_audio.
    The strf body IS a WAVEFORMATEX, so every WAV-family codec rides along."""

    def _tone(self, n=800, rate=8000, ch=1):
        t = np.arange(n, dtype=np.float64) / rate
        x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
        return np.stack([x * (1.0 - 0.3 * c) for c in range(ch)], axis=1)

    def test_pcm16_round_trip(self):
        from osm_data_3d_tiles_spark.functions.avi import read_avi_audio

        audio = self._tone(ch=2)
        data = encode_avi_mjpeg(_clip(3), fps=10.0, audio=audio, audio_rate=8000)
        got, rate = read_avi_audio(data)
        assert rate == 8000 and got.shape == audio.shape
        assert np.abs(got - audio).max() < 1.0 / 32768.0 + 1e-9

    @pytest.mark.parametrize("bits,tol", [("ulaw", 0.03), ("alaw", 0.03), ("adpcm", 0.05)])
    def test_compressed_codecs_round_trip(self, bits, tol):
        from osm_data_3d_tiles_spark.functions.avi import read_avi_audio

        audio = self._tone(n=700)  # deliberately not a multiple of ADPCM block
        data = encode_avi_mjpeg(
            _clip(2), fps=10.0, audio=audio, audio_rate=8000, audio_bits=bits
        )
        got, rate = read_avi_audio(data)
        # strh dwLength must trim block padding back to the exact frame count
        assert rate == 8000 and got.shape == audio.shape
        assert np.abs(got - audio).max() < tol

    def test_video_unaffected_by_audio_stream(self):
        frames = _clip(4)
        silent = encode_avi_mjpeg(frames, fps=10.0)
        with_audio = encode_avi_mjpeg(frames, fps=10.0, audio=self._tone())
        a, b = read_avi_mjpeg(silent), read_avi_mjpeg(with_audio)
        assert a["n_frames"] == b["n_frames"] == 4
        assert [bytes(f) for f in a["frames"]] == [bytes(f) for f in b["frames"]]

    def test_no_audio_track_raises(self):
        from osm_data_3d_tiles_spark.functions.avi import read_avi_audio

        with pytest.raises(ValueError, match="no audio track"):
            read_avi_audio(encode_avi_mjpeg(_clip(2), fps=10.0))

    def test_not_avi_raises(self):
        from osm_data_3d_tiles_spark.functions.avi import read_avi_audio

        with pytest.raises(ValueError, match="RIFF/AVI"):
            read_avi_audio(b"\x00" * 32)

    def test_soundtrack_extraction_spark_stage(self, spark):
        """audio_features(kinds=('video',)) scores AVI soundtracks for real —
        the same feature stage, dispatched by container magic."""
        from osm_data_3d_tiles_spark.operators.multimodal import (
            audio_features,
            make_avi_media_fixture,
        )

        media = make_avi_media_fixture(spark, n=6, frames_per_clip=8, with_audio=True)
        out = audio_features(media, kinds=("video",)).toPandas()
        assert len(out) == 6 and out["decoded"].all()
        assert (out["sample_rate"] == 8000).all()
        assert (out["rms"] > 0.1).all() and (out["peak"] <= 1.0).all()
        # fps 5/10/25 with 8 frames each → 1.6/0.8/0.32 s soundtracks
        assert sorted(round(d, 2) for d in out["duration_s"]) == [
            0.32, 0.32, 0.8, 0.8, 1.6, 1.6,
        ]

    def test_silent_video_degrades_not_fails(self, spark):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            audio_features,
            make_avi_media_fixture,
        )

        media = make_avi_media_fixture(spark, n=3, with_audio=False)
        out = audio_features(media, kinds=("audio", "video")).toPandas()
        assert len(out) == 3 and (~out["decoded"]).all()

    def test_deterministic_bytes_with_audio(self):
        frames, audio = _clip(2), self._tone(n=160)
        assert encode_avi_mjpeg(frames, 10.0, audio=audio) == encode_avi_mjpeg(
            frames, 10.0, audio=audio
        )


class TestSparkVideoStage:
    def test_sample_video_frames_real(self, spark):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            make_avi_media_fixture,
            sample_video_frames,
        )

        media = make_avi_media_fixture(spark, n=6, frames_per_clip=8)
        out = sample_video_frames(media, every_ms=400).toPandas()
        assert out["decoded"].all()
        # 5 fps clip @400 ms → step 2 → 4 frames; 10 fps → step 4 → 2;
        # 25 fps → step 10 → 1
        counts = out.groupby("media_id").size()
        assert set(counts.values) == {4, 2, 1}
        first = out[(out["media_id"] == 0) & (out["frame_index"] == 0)].iloc[0]
        assert first["width"] == 32 and first["height"] == 24
        assert 0.0 <= first["mean_r"] <= 255.0

    def test_decode_cost_proportional_to_samples(self, spark):
        """Sampling sparser must touch strictly fewer frames (the decode-only-
        what-you-sample property), verified through the row counts."""
        from osm_data_3d_tiles_spark.operators.multimodal import (
            make_avi_media_fixture,
            sample_video_frames,
        )

        media = make_avi_media_fixture(spark, n=3, frames_per_clip=12)
        dense = sample_video_frames(media, every_ms=100).count()
        sparse = sample_video_frames(media, every_ms=2000).count()
        assert sparse < dense

    def test_non_avi_payload_degrades_not_fails(self, spark):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            make_media_fixture,
            sample_video_frames,
        )

        media = make_media_fixture(spark, n=9)  # video payloads are junk bytes
        out = sample_video_frames(media, every_ms=500).toPandas()
        assert len(out) == 3 and (~out["decoded"]).all()

    def test_null_payload_degrades_not_fails(self, spark):
        """A NULL payload row must produce a stub row, not kill the stage —
        including inside the except handler (bytes(None) regression)."""
        from osm_data_3d_tiles_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            audio_features,
            sample_video_frames,
        )

        media = spark.createDataFrame(
            [(0, "video", None, (None, None, None, None)),
             (1, "audio", None, (None, None, None, None))],
            MEDIA_SCHEMA,
        )
        vf = sample_video_frames(media, every_ms=500).toPandas()
        af = audio_features(media).toPandas()
        assert len(vf) == 1 and not vf["decoded"].iloc[0]
        assert len(af) == 1 and not af["decoded"].iloc[0]

    def test_deeply_nested_lists_never_recursionerror(self):
        """A crafted AVI of thousands of nested LISTs must parse or raise
        ValueError — the walk is iterative, not recursive."""
        from osm_data_3d_tiles_spark.functions.avi import read_avi_mjpeg

        depth = 5000
        inner = b""
        for _ in range(depth):
            body = b"hdrl" + inner
            inner = b"LIST" + len(body).to_bytes(4, "little") + body
        blob = b"RIFF" + (4 + len(inner)).to_bytes(4, "little") + b"AVI " + inner
        with pytest.raises(ValueError, match="no video frame"):
            read_avi_mjpeg(blob)

    def test_frames_are_zero_copy_views(self):
        from osm_data_3d_tiles_spark.functions.avi import (
            encode_avi_mjpeg,
            read_avi_mjpeg,
        )

        clip = read_avi_mjpeg(encode_avi_mjpeg(_clip(3), fps=10.0))
        assert all(isinstance(f, memoryview) for f in clip["frames"])

    def test_frame_ts_matches_plan(self, spark):
        """The metadata-only plan and the real decoder agree on timestamps."""
        from osm_data_3d_tiles_spark.operators.multimodal import (
            frame_sample_plan,
            make_avi_media_fixture,
            sample_video_frames,
        )

        media = make_avi_media_fixture(spark, n=1, frames_per_clip=8)  # 5 fps
        real = sample_video_frames(media, every_ms=400).toPandas()
        plan = frame_sample_plan(media, every_ms=400).toPandas()
        real_ts = sorted(real["frame_ts_ms"])
        plan_ts = sorted(plan["frame_ts_ms"])
        # plan enumerates 0..duration inclusive; the real decoder stops at the
        # last actual frame — the sampled instants it covers must line up
        assert real_ts == plan_ts[: len(real_ts)]

    def test_frame_ts_joins_plan_at_awkward_fps(self):
        """Non-integral every_ms*fps/1000 (fps=8, 400 ms) must still emit the
        PLAN's instants — sampled timestamps are multiples of every_ms, with
        the nearest frame decoded for each (the review-found divergence)."""
        from osm_data_3d_tiles_spark.functions.avi import encode_avi_mjpeg, read_avi_mjpeg

        frames = _clip(n_frames=8)
        clip = read_avi_mjpeg(encode_avi_mjpeg(frames, fps=8.0))
        assert clip["fps"] == pytest.approx(8.0)
        # last frame at 875 ms → instants 0, 400, 800; nearest frames 0, 3, 6
        last_ms = int((8 - 1) * 1000.0 / 8.0)
        instants = list(range(0, last_ms + 1, 400))
        assert instants == [0, 400, 800]
        fis = [min(7, int(round(ts * 8.0 / 1000.0))) for ts in instants]
        assert fis == [0, 3, 6]
