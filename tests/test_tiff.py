"""Baseline-TIFF codec (functions/tiff.py): strip round-trips across
compressions/endianness, the LZW early-change pinned by a hand-assembled
stream, palette decode from a hand-built IFD, and the refusal contract."""

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions.tiff import (
    _tiff_lzw_decode,
    decode_tiff,
    encode_tiff,
)


def _img(h=13, w=17, ch=3, seed=5):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, (h, w) if ch == 1 else (h, w, ch))
    return a.astype(np.uint8)


def _rgb(img):
    return img if img.ndim == 3 else np.repeat(img[..., None], 3, axis=-1)


class TestRoundTrip:
    CASES = [
        {"compression": "none"},
        {"compression": "packbits"},
        {"compression": "lzw"},
        {"compression": "lzw", "predictor": True},
        {"compression": "lzw", "big_endian": True, "rows_per_strip": 3},
        {"compression": "none", "big_endian": True},
        {"compression": "none", "rows_per_strip": 10_000},
    ]

    @pytest.mark.parametrize("kw", CASES)
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_lossless(self, kw, ch):
        img = _img(ch=ch)
        got = decode_tiff(encode_tiff(img, **kw))
        exp = _rgb(img)
        assert got.shape == exp.shape
        assert np.array_equal(got, exp)

    def test_wide_lzw_codes_and_dict_reset(self):
        """One big strip pushes the LZW dictionary past 9→10→11→12 bits and
        through at least one in-stream reset — the early-change sync gate."""
        img = np.tile(_img(16, 256, 3, seed=1), (8, 1, 1))
        data = encode_tiff(img, compression="lzw", rows_per_strip=4096)
        assert np.array_equal(decode_tiff(data), img)

    def test_deterministic_bytes(self):
        img = _img(6, 6)
        for comp in ("none", "lzw", "packbits"):
            assert encode_tiff(img, compression=comp) == encode_tiff(
                img, compression=comp
            )

    def test_packbits_long_runs(self):
        img = np.repeat(_img(4, 2, 3, seed=9), 200, axis=1)  # 400-px runs
        assert np.array_equal(
            decode_tiff(encode_tiff(img, compression="packbits")), img
        )


class TestHandAssembled:
    def test_lzw_early_change_pinned(self):
        """Spec fact, independent of the encoder: after CLEAR(256), codes are
        9-bit, and the decoder must widen to 10 bits once table entry 510
        exists — one entry EARLIER than the GIF-style 511/512 rule. Feed 254
        literal codes (table grows to 511 entries) packed by an inline
        MSB-first writer and check the decode."""
        codes = [256] + list(range(254)) + [257]  # CLEAR, literals, EOI
        # widths per the early-change rule: decoder table len after read m of
        # a literal is 257+m; it widens when that reaches 510 → reads #1-253
        # at 9 bits, read #254 (and EOI) at 10 bits
        widths = [9] + [9] * 253 + [10, 10]
        acc = 0
        nbits = 0
        out = bytearray()
        for code, wd in zip(codes, widths):
            acc = (acc << wd) | code
            nbits += wd
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        got = _tiff_lzw_decode(bytes(out), 254)
        assert got == bytes(range(254))

    def test_palette_color_decode(self):
        """Hand-built II TIFF with PhotometricInterpretation=3 + ColorMap
        (16-bit entries, high byte = the 8-bit channel)."""
        w = h = 4
        idx = np.arange(16, dtype=np.uint8).reshape(4, 4) % 5
        cmap = np.zeros((3, 256), dtype=np.uint16)
        for i in range(5):
            cmap[0, i] = (10 + 40 * i) << 8
            cmap[1, i] = (5 + 30 * i) << 8
            cmap[2, i] = (200 - 35 * i) << 8

        def u16(v):
            return int(v).to_bytes(2, "little")

        def u32(v):
            return int(v).to_bytes(4, "little")

        tags = []  # (tag, type, count, value_bytes_or_offset_int)
        strip = idx.tobytes()
        n = 9
        ifd_start = 8
        data_start = ifd_start + 2 + 12 * n + 4
        cmap_off = data_start
        strip_off = cmap_off + 2 * 3 * 256
        tags = [
            (256, 3, 1, u16(w) + b"\x00\x00"),
            (257, 3, 1, u16(h) + b"\x00\x00"),
            (258, 3, 1, u16(8) + b"\x00\x00"),
            (259, 3, 1, u16(1) + b"\x00\x00"),
            (262, 3, 1, u16(3) + b"\x00\x00"),
            (273, 4, 1, u32(strip_off)),
            (277, 3, 1, u16(1) + b"\x00\x00"),
            (279, 4, 1, u32(len(strip))),
            (320, 3, 3 * 256, u32(cmap_off)),
        ]
        out = bytearray(b"II*\x00" + u32(ifd_start) + u16(n))
        for tag, typ, count, val in tags:
            out += u16(tag) + u16(typ) + u32(count) + val
        out += u32(0)
        out += b"".join(u16(v) for v in cmap.reshape(-1))
        out += strip
        got = decode_tiff(bytes(out))
        exp = np.stack(
            [(cmap[c, idx.astype(int)] >> 8).astype(np.uint8) for c in range(3)],
            axis=-1,
        )
        assert np.array_equal(got, exp)


class TestRefusals:
    def test_not_tiff(self):
        with pytest.raises(ValueError, match="not a TIFF"):
            decode_tiff(b"PK\x03\x04 definitely a zip")

    def test_truncated(self):
        data = encode_tiff(_img(8, 8))
        with pytest.raises(ValueError):
            decode_tiff(data[: len(data) // 2])

    def test_16bit_refused(self):
        data = bytearray(encode_tiff(_img(4, 4)))
        # BitsPerSample tag (258) short value lives inline; flip 8 → 16
        i = data.find((258).to_bytes(2, "little"))
        data[i + 8 : i + 10] = (16).to_bytes(2, "little")
        with pytest.raises(ValueError, match="8-bit"):
            decode_tiff(bytes(data))

    def test_unknown_compression_refused(self):
        data = bytearray(encode_tiff(_img(4, 4)))
        i = data.find((259).to_bytes(2, "little"))
        data[i + 8 : i + 10] = (7).to_bytes(2, "little")  # JPEG-in-TIFF
        with pytest.raises(ValueError, match="compression 7"):
            decode_tiff(bytes(data))

    def test_bad_encoder_inputs(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_tiff(np.zeros((4, 4, 3), dtype=np.float32))
        with pytest.raises(ValueError, match="LZW feature"):
            encode_tiff(_img(4, 4), compression="none", predictor=True)


class TestDispatch:
    def test_decode_image_real_tiff(self):
        from osm_data_3d_tiles_spark.operators.multimodal import decode_image_real

        img = _img(10, 10)
        for kw in ({"compression": "lzw"}, {"big_endian": True}):
            assert np.array_equal(decode_image_real(encode_tiff(img, **kw)), img)

    def test_decode_pixels_tiff_and_corrupt_fallback(self):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            decode_pixels,
            decode_pixels_stub,
        )

        img = _img(9, 9)
        payload = encode_tiff(img, compression="packbits")
        assert np.array_equal(decode_pixels(payload, 9, 9), img)
        corrupt = payload[:24]
        assert np.array_equal(
            decode_pixels(corrupt, 9, 9), decode_pixels_stub(corrupt, 9, 9)
        )

    def test_resize_images_real_tiff_path(self, spark):
        from osm_data_3d_tiles_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            decode_image_real,
            resize_images,
            resize_nearest,
        )

        rows = []
        for i, kw in enumerate(
            [{"compression": "none"}, {"compression": "lzw"},
             {"compression": "packbits"}, {"compression": "lzw", "predictor": True}]
        ):
            img = _img(10 + i, 12, seed=i)
            rows.append(
                (i, "image", bytearray(encode_tiff(img, **kw)),
                 (12, 10 + i, "image/tiff", None))
            )
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r.media_id: r for r in resize_images(media, 6, 5).collect()}
        assert len(out) == 4
        for r in media.collect():
            want = resize_nearest(decode_image_real(bytes(r.payload)), 6, 5)
            got = np.frombuffer(
                bytes(out[r.media_id].payload), dtype=np.uint8
            ).reshape(5, 6, 3)
            assert np.array_equal(got, want), r.media_id
