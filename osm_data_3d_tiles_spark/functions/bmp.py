"""From-scratch BMP (Windows DIB) reader + writer in pure numpy.

Public-spec implementation (BITMAPFILEHEADER + BITMAPINFOHEADER layout):
uncompressed BI_RGB pixel data at the stated file offset, rows padded to
4 bytes, bottom-up unless the height is negative. Supported:

- 24-bit BGR and 32-bit BGRX (alpha/padding byte dropped)
- 8-bit palettized (BGRA color table after the info header)
- BITMAPV4/V5 headers (any biSize >= 40 — the 40-byte core is read and the
  pixel offset field skips the rest)

RLE-compressed and bitfield variants raise ValueError — mirroring the
PNG/JPEG/GIF contract (common variants real, exotic ones refused; see
operators/multimodal.py).

Reference parity note: the reference repo has no raster-image path; this
module exists for the LLM-data-pipeline multimodal family alongside
functions/atlas.py (PNG), jpeg.py and gif.py.

Everything is one `np.frombuffer` + slicing per image; no per-pixel Python.
"""

from __future__ import annotations

import numpy as np

BMP_MAGIC = b"BM"

_BI_RGB = 0


def _u16(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8)


def _u32(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8) | (b[o + 2] << 16) | (b[o + 3] << 24)


def _i32(b: bytes, o: int) -> int:
    v = _u32(b, o)
    return v - (1 << 32) if v >= 1 << 31 else v


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) uint8 RGB. Raises ValueError on non-BMP,
    compressed, or malformed input (lying sizes surface as ValueError)."""
    try:
        return _decode_bmp_impl(bytes(data))
    except (IndexError, KeyError) as exc:
        raise ValueError(f"malformed BMP stream: {type(exc).__name__}: {exc}") from exc


def _decode_bmp_impl(data: bytes) -> np.ndarray:
    if len(data) < 54 or data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP stream")
    pixel_offset = _u32(data, 10)
    hdr_size = _u32(data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (BITMAPCOREHEADER)")
    width = _i32(data, 18)
    height = _i32(data, 22)
    bpp = _u16(data, 28)
    compression = _u32(data, 30)
    colors_used = _u32(data, 46)

    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    if compression != _BI_RGB:
        raise ValueError(
            f"unsupported BMP compression {compression} "
            "(only uncompressed BI_RGB decodes in-sandbox)"
        )
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp} (8/24/32 supported)")

    stride = ((bpp * width + 31) // 32) * 4
    need = pixel_offset + stride * height
    if pixel_offset < 14 + hdr_size or need > len(data):
        raise ValueError(
            f"BMP pixel data out of bounds (offset {pixel_offset}, "
            f"need {need}, have {len(data)})"
        )
    rows = np.frombuffer(
        data[pixel_offset : pixel_offset + stride * height], dtype=np.uint8
    ).reshape(height, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp == 8:
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > pixel_offset:
            raise ValueError("BMP palette overlaps pixel data")
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(n_colors, 4)
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP palette index out of range")
        return pal[idx][..., [2, 1, 0]].copy()  # BGRA quads → RGB

    n_bytes = bpp // 8
    px = rows[:, : width * n_bytes].reshape(height, width, n_bytes)
    return px[..., [2, 1, 0]].copy()  # BGR(X) → RGB


def encode_bmp(img: np.ndarray, bpp: int = 24) -> bytes:
    """(H, W, 3) uint8 RGB → BMP bytes (bottom-up BI_RGB; 24 or 32 bpp).
    Deterministic — builds fixtures the same way encode_png/encode_gif do."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp wants (H, W, 3) uint8")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported bpp {bpp} (24 or 32)")
    h, w = img.shape[:2]
    n_bytes = bpp // 8
    stride = ((bpp * w + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    px = rows[:, : w * n_bytes].reshape(h, w, n_bytes)
    px[..., 0] = img[..., 2]
    px[..., 1] = img[..., 1]
    px[..., 2] = img[..., 0]
    rows = rows[::-1]  # bottom-up

    def u16(v: int) -> bytes:
        return bytes((v & 0xFF, (v >> 8) & 0xFF))

    def u32(v: int) -> bytes:
        return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF))

    payload = rows.tobytes()
    pixel_offset = 14 + 40
    info = (
        u32(40) + u32(w) + u32(h) + u16(1) + u16(bpp) + u32(_BI_RGB)
        + u32(len(payload)) + u32(2835) + u32(2835) + u32(0) + u32(0)
    )
    head = (
        BMP_MAGIC + u32(pixel_offset + len(payload)) + u16(0) + u16(0)
        + u32(pixel_offset)
    )
    return head + info + payload
