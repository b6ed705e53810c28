"""From-scratch GIF codec (functions/gif.py): LZW round-trips, interlace,
transparency compositing, frame counting, and the refusal contract."""

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions.gif import (
    decode_gif,
    encode_gif,
    gif_frame_count,
)


def _pattern(h=24, w=32, colors=7):
    yy, xx = np.mgrid[0:h, 0:w]
    idx = (xx * 3 + yy * 5) % colors
    palette = np.stack(
        [(np.arange(colors) * 37) % 256,
         (np.arange(colors) * 91) % 256,
         (np.arange(colors) * 53) % 256], axis=1
    ).astype(np.uint8)
    return palette[idx]


class TestRoundTrip:
    @pytest.mark.parametrize("colors", [2, 7, 16, 100, 256])
    def test_lossless(self, colors):
        img = _pattern(colors=colors)
        got = decode_gif(encode_gif(img))
        assert got.shape == img.shape
        assert (got == img).all()

    def test_single_color(self):
        img = np.full((5, 9, 3), 200, dtype=np.uint8)
        assert (decode_gif(encode_gif(img)) == img).all()

    def test_large_enough_to_grow_code_width(self):
        # noisy deterministic 256-color image forces thousands of dictionary
        # entries, exercising width growth 9→10→11→12 bits and a dict reset
        idx = ((np.arange(160 * 120) * 2654435761) >> 7).astype(np.uint64) % 256
        palette = np.stack(
            [(np.arange(256) * 37) % 256,
             (np.arange(256) * 91) % 256,
             (np.arange(256) * 53) % 256], axis=1
        ).astype(np.uint8)
        img = palette[idx.astype(np.intp)].reshape(160, 120, 3)
        got = decode_gif(encode_gif(img))
        assert (got == img).all()

    def test_deterministic_bytes(self):
        img = _pattern()
        assert encode_gif(img) == encode_gif(img)

    def test_frame_count(self):
        assert gif_frame_count(encode_gif(_pattern())) == 1

    def test_encode_too_many_colors(self):
        yy, xx = np.mgrid[0:32, 0:32]
        img = np.stack([xx * 8 % 256, yy * 8 % 256, (xx + yy) % 256], axis=-1).astype(np.uint8)
        with pytest.raises(ValueError, match="distinct colors"):
            encode_gif(img)


class TestSpecFeatures:
    def test_interlaced_stream(self):
        """Hand-build an interlaced frame: rows permuted into pass order must
        come back in display order."""
        img = _pattern(h=16, w=8, colors=4)
        data = bytearray(encode_gif(img))
        # flip the interlace flag and re-permute pixel rows into pass order
        i = data.find(b"\x2c")
        assert data[i + 9] == 0
        from osm_data_3d_tiles_spark.functions import gif as g

        flat = img.reshape(-1, 3)
        palette, idx = np.unique(flat, axis=0, return_inverse=True)
        rows = idx.reshape(16, 8)
        order = [r for s, st in g._INTERLACE_PASSES for r in range(s, 16, st)]
        permuted = rows[order].reshape(-1).astype(np.uint8)

        size_field = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
        mcs = max(2, size_field)
        lzw = g._lzw_encode(permuted, mcs)
        body = bytearray()
        for k in range(0, len(lzw), 255):
            chunk = lzw[k : k + 255]
            body += bytes((len(chunk),)) + chunk
        body += b"\x00\x3b"
        rebuilt = bytes(data[: i + 9]) + bytes((0x40, mcs)) + bytes(body)
        got = decode_gif(rebuilt)
        assert (got == img).all()

    def test_transparency_composites_background(self):
        img = _pattern(h=6, w=6, colors=3)
        data = bytearray(encode_gif(img))
        # inject a GCE marking palette index 0 transparent; bg color is
        # palette slot 0 too, so pixels stay identical — but the masked
        # compositing path is exercised
        i = data.find(b"\x2c")
        gce = bytes((0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00))
        rebuilt = bytes(data[:i]) + gce + bytes(data[i:])
        got = decode_gif(rebuilt)
        assert (got == img).all()


class TestRefusals:
    def test_not_gif(self):
        with pytest.raises(ValueError, match="signature"):
            decode_gif(b"\x89PNG\r\n\x1a\n")

    def test_truncated_lzw(self):
        data = bytearray(encode_gif(_pattern()))
        with pytest.raises(ValueError):
            decode_gif(bytes(data[: len(data) // 2]))

    def test_no_frame(self):
        data = bytearray(encode_gif(_pattern(h=4, w=4, colors=2)))
        i = data.find(b"\x2c")
        with pytest.raises(ValueError, match="no image frame"):
            decode_gif(bytes(data[:i]) + b"\x3b")

    def test_lying_subblock_never_indexerror(self):
        data = bytearray(encode_gif(_pattern()))
        # turn the sub-block terminator into a length that runs off the end
        assert data[-2] == 0x00 and data[-1] == 0x3B
        data[-2] = 0xFF
        with pytest.raises(ValueError, match="sub-block|truncated"):
            decode_gif(bytes(data))


class TestDispatch:
    def test_decode_image_real_gif(self):
        from osm_data_3d_tiles_spark.operators.multimodal import decode_image_real

        img = _pattern()
        assert (decode_image_real(encode_gif(img)) == img).all()

    def test_decode_pixels_gif_and_corrupt_fallback(self):
        from osm_data_3d_tiles_spark.operators.multimodal import decode_pixels

        img = _pattern(h=10, w=10)
        payload = encode_gif(img)
        assert (decode_pixels(payload, 10, 10) == img).all()
        corrupt = payload[:20]  # valid magic, truncated body → stub, not raise
        out = decode_pixels(corrupt, 10, 10)
        assert out.shape == (10, 10, 3)
