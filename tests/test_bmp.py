"""From-scratch BMP codec (functions/bmp.py) + multimodal dispatch.

Round-trips are exact (BI_RGB is uncompressed); spec-feature tests cover
row padding, top-down rows, palettized images and V4/V5 headers; refusal
tests pin the ValueError contract; dispatch tests prove the BM magic routes
through decode_image_real / decode_pixels with stub fallback on corruption.
"""

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions.bmp import decode_bmp, encode_bmp


def _grad(h=13, w=17):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[..., 0] = (xx * 7 + 3) % 256
    img[..., 1] = (yy * 11 + 5) % 256
    img[..., 2] = ((xx + yy) * 13) % 256
    return img


class TestRoundTrip:
    @pytest.mark.parametrize("bpp", [24, 32])
    def test_lossless(self, bpp):
        img = _grad()
        assert (decode_bmp(encode_bmp(img, bpp=bpp)) == img).all()

    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5])
    def test_row_padding_every_width(self, w):
        # 24-bit rows of width 1..5 hit every 4-byte padding remainder
        img = _grad(h=3, w=w)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    def test_deterministic_bytes(self):
        img = _grad()
        assert encode_bmp(img) == encode_bmp(img)

    def test_single_pixel(self):
        img = np.array([[[200, 100, 50]]], dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()


class TestSpecFeatures:
    def test_top_down_rows(self):
        # negate biHeight: rows arrive top-down and must NOT be flipped
        img = _grad()
        data = bytearray(encode_bmp(img))
        h = img.shape[0]
        data[22:26] = ((1 << 32) - h).to_bytes(4, "little")  # height = -h
        flipped = bytes(data[: 14 + 40]) + bytes(data[14 + 40 :])
        got = decode_bmp(flipped)
        assert (got == img[::-1]).all()

    def test_palettized_8bit(self):
        # hand-build an 8-bit DIB: 5-entry BGRA palette, 6x4 indices
        pal = np.array(
            [(255, 0, 0, 0), (0, 255, 0, 0), (0, 0, 255, 0),
             (10, 20, 30, 0), (200, 150, 100, 0)],
            dtype=np.uint8,
        )
        w, h = 6, 4
        idx = (np.arange(h * w) % 5).astype(np.uint8).reshape(h, w)
        stride = ((8 * w + 31) // 32) * 4
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = idx[::-1]  # bottom-up

        def u16(v):
            return v.to_bytes(2, "little")

        def u32(v):
            return v.to_bytes(4, "little")

        pixel_offset = 14 + 40 + 4 * len(pal)
        info = (
            u32(40) + u32(w) + u32(h) + u16(1) + u16(8) + u32(0)
            + u32(rows.size) + u32(2835) + u32(2835) + u32(len(pal)) + u32(0)
        )
        data = (
            b"BM" + u32(pixel_offset + rows.size) + u16(0) + u16(0)
            + u32(pixel_offset) + info + pal.tobytes() + rows.tobytes()
        )
        got = decode_bmp(data)
        want = pal[idx][..., [2, 1, 0]]  # BGRA → RGB
        assert (got == want).all()

    def test_v5_header_respects_pixel_offset(self):
        # inflate the info header to 124 bytes (BITMAPV5HEADER) and shift the
        # pixel data accordingly — decode must follow the offset field
        img = _grad(h=5, w=7)
        data = bytearray(encode_bmp(img))
        payload = bytes(data[54:])
        extra = 124 - 40
        info = bytearray(data[14:54])
        info[0:4] = (124).to_bytes(4, "little")
        head = bytearray(data[:14])
        head[10:14] = (14 + 124).to_bytes(4, "little")
        head[2:6] = (14 + 124 + len(payload)).to_bytes(4, "little")
        got = decode_bmp(bytes(head) + bytes(info) + b"\x00" * extra + payload)
        assert (got == img).all()


class TestRefusals:
    def test_not_bmp(self):
        with pytest.raises(ValueError, match="not a BMP"):
            decode_bmp(b"\x89PNG\r\n\x1a\n" + b"x" * 60)

    def test_rle_compression_refused(self):
        data = bytearray(encode_bmp(_grad()))
        data[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
        with pytest.raises(ValueError, match="compression"):
            decode_bmp(bytes(data))

    def test_16bit_refused(self):
        data = bytearray(encode_bmp(_grad()))
        data[28:30] = (16).to_bytes(2, "little")
        with pytest.raises(ValueError, match="bit depth"):
            decode_bmp(bytes(data))

    def test_lying_offset_never_indexerror(self):
        data = bytearray(encode_bmp(_grad()))
        data[10:14] = (10**6).to_bytes(4, "little")
        with pytest.raises(ValueError, match="out of bounds"):
            decode_bmp(bytes(data))

    def test_truncated_pixels(self):
        data = encode_bmp(_grad())
        with pytest.raises(ValueError, match="out of bounds"):
            decode_bmp(data[: len(data) - 20])

    def test_encode_bad_input(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_bmp(np.zeros((4, 4, 3), dtype=np.float64))
        with pytest.raises(ValueError, match="bpp"):
            encode_bmp(_grad(), bpp=16)


class TestIco:
    def test_dib_entry_round_trip(self):
        from osm_data_3d_tiles_spark.functions.bmp import decode_ico, encode_ico

        img = _grad()
        assert (decode_ico(encode_ico(img)) == img).all()

    def test_png_entry_with_alpha_composites_black(self):
        from osm_data_3d_tiles_spark.functions.atlas import encode_png
        from osm_data_3d_tiles_spark.functions.bmp import decode_ico

        img = _grad(h=9, w=9)
        rgba = np.dstack([img, np.full((9, 9), 128, np.uint8)])
        png = encode_png(rgba)
        entry = (
            bytes((9, 9, 0, 0)) + (1).to_bytes(2, "little")
            + (32).to_bytes(2, "little") + len(png).to_bytes(4, "little")
            + (22).to_bytes(4, "little")
        )
        ico = b"\x00\x00\x01\x00" + (1).to_bytes(2, "little") + entry + png
        want = (img.astype(np.uint16) * 128 // 255).astype(np.uint8)
        assert (decode_ico(ico) == want).all()

    def test_and_mask_zeroes_transparent_pixels(self):
        from osm_data_3d_tiles_spark.functions.bmp import decode_ico, encode_ico

        img = _grad(h=5, w=9)
        data = bytearray(encode_ico(img))
        off = 6 + 16 + 40
        n_px = 5 * 9
        xor = np.frombuffer(bytes(data[off : off + n_px * 4]), dtype=np.uint8)
        xor = xor.reshape(-1, 4).copy()
        xor[:, 3] = 0  # zero alpha → decoder must honor the AND mask instead
        data[off : off + n_px * 4] = xor.tobytes()
        data[off + n_px * 4] = 0b10000000  # bottom-left pixel transparent
        got = decode_ico(bytes(data))
        assert (got[-1, 0] == 0).all()
        assert (got[0, 0] == img[0, 0]).all()

    def test_best_entry_selection(self):
        from osm_data_3d_tiles_spark.functions.bmp import decode_ico, encode_ico

        small = _grad(h=4, w=4)
        big = _grad(h=12, w=12)
        a, b = encode_ico(small), encode_ico(big)
        # splice both single-entry files into one two-entry directory
        ea, eb = bytearray(a[6:22]), bytearray(b[6:22])
        da, db = a[22:], b[22:]
        off_a = 6 + 32
        off_b = off_a + len(da)
        ea[12:16] = off_a.to_bytes(4, "little")
        eb[12:16] = off_b.to_bytes(4, "little")
        ico = (
            b"\x00\x00\x01\x00" + (2).to_bytes(2, "little")
            + bytes(ea) + bytes(eb) + da + db
        )
        assert decode_ico(ico).shape == (12, 12, 3)  # picks the larger

    def test_refusals(self):
        from osm_data_3d_tiles_spark.functions.bmp import decode_ico, encode_ico

        with pytest.raises(ValueError, match="not an ICO"):
            decode_ico(b"BM" + b"\x00" * 60)
        with pytest.raises(ValueError, match="empty"):
            decode_ico(b"\x00\x00\x01\x00\x00\x00")
        data = bytearray(encode_ico(_grad()))
        data[14:18] = (10**6).to_bytes(4, "little")  # lying entry size
        with pytest.raises(ValueError, match="out of bounds"):
            decode_ico(bytes(data))


class TestDispatch:
    def test_decode_image_real_bmp(self):
        from osm_data_3d_tiles_spark.operators.multimodal import decode_image_real

        img = _grad()
        assert (decode_image_real(encode_bmp(img)) == img).all()

    def test_decode_pixels_bmp_and_corrupt_fallback(self):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            decode_pixels,
            decode_pixels_stub,
        )

        img = _grad()
        data = encode_bmp(img)
        assert (decode_pixels(data, 99, 99) == img).all()  # bitstream dims win
        corrupt = bytearray(data)
        corrupt[30] = 1  # RLE flag → real decode raises → stub fallback
        got = decode_pixels(bytes(corrupt), 9, 7)
        assert (got == decode_pixels_stub(bytes(corrupt), 9, 7)).all()

    def test_decode_pixels_ico(self):
        from osm_data_3d_tiles_spark.functions.bmp import encode_ico
        from osm_data_3d_tiles_spark.operators.multimodal import decode_pixels

        img = _grad()
        assert (decode_pixels(encode_ico(img), 1, 1) == img).all()
