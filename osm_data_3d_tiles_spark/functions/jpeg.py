"""Baseline JFIF (JPEG) codec — pure numpy, written from the public ITU-T T.81
spec (baseline sequential DCT, Annex K reference tables). No imaging library.

Why it exists: JPEG is the dominant image format of a real web crawl, and the
multimodal operators (operators/multimodal.py) should decode it for real
in-sandbox rather than stubbing (round-4 VERDICT "What's missing" #4). The
reference repo has no image codec at all — its textures arrive via the GPU
loader (src/textureArrayLoader.ts) — so this module is graft-side scope, like
the PNG reader in functions/atlas.py.

Scope (documented, deliberately baseline):
- encode: 8-bit RGB or grayscale → baseline sequential, Annex K quant tables
  scaled by the IJG quality formula, Annex K Huffman tables, 4:4:4 or 4:2:0
  chroma subsampling, no restart markers. Output bytes are fully
  deterministic → golden-able (md5).
- decode: baseline sequential (SOF0) only, 8-bit, 1- or 3-component, any
  sampling factors h,v ∈ {1,2}, DRI/RSTn handled, progressive (SOF2) and
  arithmetic coding refused with ValueError.
- chroma upsampling is sample replication (nearest): the round-trip partner
  is this encoder, not libjpeg, so fancy (centered) upsampling would add
  nothing testable in-sandbox.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Annex K reference tables
# --------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient
_zz = []
for s in range(15):
    ks = range(max(0, s - 7), min(s, 7) + 1)
    for k in ks if s % 2 else reversed(ks):
        _zz.append((k, s - k))
ZIGZAG = np.array(_zz, dtype=np.int64)  # (64, 2)
ZZ_ROWS, ZZ_COLS = ZIGZAG[:, 0], ZIGZAG[:, 1]

# Huffman table specs: (BITS[1..16], HUFFVAL) exactly as Annex K.3.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: forward coeffs = C @ block @ C.T (already
# includes the T.81 normalization; the spec's 1D formula per A.3.3)
_k = np.arange(8)
DCT_MAT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
DCT_MAT[0, :] *= 1 / np.sqrt(2)


def _quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = Annex K table as-is, 1 coarsest, 100 finest."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = (table * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


# --------------------------------------------------------------------------
# Huffman code construction (canonical, per T.81 C.2)
# --------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(l, c): s for s, (c, l) in _build_codes(bits, vals).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a DC-diff / AC value per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _extend(raw: int, s: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    return raw if raw >= (1 << (s - 1)) else raw - (1 << s) + 1


# --------------------------------------------------------------------------
# Bit I/O (entropy segment level; 0xFF byte stuffing)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per F.1.2.3


class _BitReader:
    """Reads an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def get(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.get(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


# --------------------------------------------------------------------------
# Color transforms (JFIF / BT.601 full-range)
# --------------------------------------------------------------------------

def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Block helpers — all plane-level math is vectorized numpy
# --------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 → (n_blocks_y, n_blocks_x, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _from_blocks(blocks: np.ndarray) -> np.ndarray:
    by, bx = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shift, batched 8x8 DCT, quantize → int32 (by, bx, 8, 8)."""
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,byjk,lk->byil", DCT_MAT, blocks, DCT_MAT)
    return np.rint(coef / qtab).astype(np.int32)


def _dequant_idct(coefs: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    coef = coefs.astype(np.float64) * qtab
    blocks = np.einsum("ji,byjk,kl->byil", DCT_MAT, coef, DCT_MAT)
    return _from_blocks(blocks) + 128.0


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean (plane pre-padded to even dims)."""
    h, w = plane.shape
    return plane.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def _encode_block(
    w: _BitWriter,
    coefs: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = coefs[ZZ_ROWS, ZZ_COLS]
    dc = int(zz[0])
    s, raw = _magnitude(dc - pred)
    code, length = dc_codes[s]
    w.put(code, length)
    if s:
        w.put(raw, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.put(code, length)
            run -= 16
        s, raw = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        w.put(code, length)
        w.put(raw, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        w.put(code, length)
    return dc


def _u16(v: int) -> bytes:
    return bytes([(v >> 8) & 0xFF, v & 0xFF])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """8-bit image → baseline JFIF bytes. img: (H, W, 3) RGB or (H, W)
    grayscale, uint8. subsample: '444' or '420' (ignored for grayscale).
    restart_interval > 0 emits DRI + RSTn markers every that-many MCUs
    (identical pixels, resynchronizable stream — and exercises the decoder's
    restart path). Deterministic for a given input — safe to pin by md5."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg wants uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg wants (H,W,3) RGB or (H,W) grayscale")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    if not (0 <= restart_interval <= 0xFFFF):
        raise ValueError(
            f"restart_interval must be in [0, 65535] (DRI is 16-bit), got {restart_interval}"
        )
    h, w = img.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError(
            f"image {h}x{w} exceeds the 16-bit SOF dimension limit (65535)"
        )

    qy = _quality_scaled(QUANT_LUMA, quality)
    qc = _quality_scaled(QUANT_CHROMA, quality)

    if gray:
        planes = [_pad_to(img.astype(np.float64), 8, 8)]
        sampling = [(1, 1)]
        qtabs = [qy]
        qids = [0]
    else:
        ycc = rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample == "420":
            y = _pad_to(y, 16, 16)
            cb = _downsample2(_pad_to(cb, 16, 16))
            cr = _downsample2(_pad_to(cr, 16, 16))
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            y = _pad_to(y, 8, 8)
            cb = _pad_to(cb, 8, 8)
            cr = _pad_to(cr, 8, 8)
            sampling = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtabs = [qy, qc, qc]
        qids = [0, 1, 1]

    coef_planes = [_fdct_quant(p, q) for p, q in zip(planes, qtabs)]

    dc_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    huff = [(dc_y, ac_y)] + [(dc_c, ac_c)] * (len(planes) - 1)

    # interleaved MCU scan
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                # close the entropy segment on a byte boundary, emit RSTn,
                # reset the DC predictors (T.81 E.1.4)
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        blk = coef_planes[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            bw, blk, preds[ci], huff[ci][0], huff[ci][1]
                        )
            mcu_index += 1
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + _u16(16) + b"JFIF\x00\x01\x01\x00" + _u16(1) + _u16(1) + b"\x00\x00"
    # DQT
    for tid, tab in ((0, qy),) if gray else ((0, qy), (1, qc)):
        out += b"\xff\xdb" + _u16(67) + bytes([tid])
        out += bytes(int(tab[r, c]) for r, c in ZIGZAG)
    # SOF0
    ncomp = len(planes)
    out += b"\xff\xc0" + _u16(8 + 3 * ncomp) + b"\x08" + _u16(h) + _u16(w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        out += bytes([ci + 1, (sh << 4) | sv, qids[ci]])
    # DHT
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tclass, bits, vals in tables:
        out += b"\xff\xc4" + _u16(3 + 16 + len(vals)) + bytes([tclass]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + _u16(4) + _u16(restart_interval)  # DRI
    # SOS
    out += b"\xff\xda" + _u16(6 + 2 * ncomp) + bytes([ncomp])
    for ci in range(ncomp):
        td = 0x00 if ci == 0 else 0x11
        out += bytes([ci + 1, td])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def _parse_segments(data: bytes):
    """Yield (marker, payload) for header segments; returns at SOS with the
    scan header + index where entropy data begins."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF fill
        # bytes — real-world encoders pad with them
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= len(data):
            raise ValueError("truncated JPEG (fill bytes to EOF)")
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue
        ln = (data[i] << 8) | data[i + 1]
        payload = data[i + 2 : i + ln]
        i += ln
        yield marker, payload
        if marker == 0xDA:
            yield 0x100, data[i:]  # entropy-coded remainder (sentinel)
            return
    raise ValueError("no SOS marker")


def _split_entropy(tail: bytes) -> list[bytes]:
    """Entropy remainder → unstuffed segments split on RSTn; stops at EOI/any
    other marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(tail)
    while i < n:
        b = tail[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = tail[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RST
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next header marker: scan over
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) RGB uint8 (grayscale replicated to 3
    channels). Raises ValueError on progressive/arithmetic/12-bit streams and
    on truncated or malformed streams (never IndexError/KeyError: segment
    length fields can lie, so byte-index slips inside a parser are part of
    the malformed-input contract, not internal errors)."""
    try:
        return _decode_jpeg_impl(bytes(data))
    except (IndexError, KeyError) as exc:
        raise ValueError(f"malformed JPEG stream: {type(exc).__name__}: {exc}") from exc


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    scan_comps = None
    restart_interval = 0
    entropy = b""

    for marker, payload in _parse_segments(data):
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                tab = np.zeros((8, 8), dtype=np.int32)
                vals = payload[p : p + 64]
                tab[ZZ_ROWS, ZZ_COLS] = np.frombuffer(vals, dtype=np.uint8)
                qtabs[tq] = tab
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                huff[tc_th] = _build_decode_map(bits, vals)
                p += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both baseline-decodable)
            if payload[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = (payload[1] << 8) | payload[2]
            w = (payload[3] << 8) | payload[4]
            ncomp = payload[5]
            comps = []
            for ci in range(ncomp):
                cid = payload[6 + 3 * ci]
                hv = payload[7 + 3 * ci]
                tq = payload[8 + 3 * ci]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(f"invalid sampling factors {ch}x{cv}")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0/SOF1) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = (payload[0] << 8) | payload[1]
        elif marker == 0xDA:  # SOS header
            ns = payload[0]
            scan_comps = []
            for ci in range(ns):
                cid = payload[1 + 2 * ci]
                td_ta = payload[2 + 2 * ci]
                scan_comps.append({"id": cid, "dc": td_ta >> 4, "ac": td_ta & 0x0F})
        elif marker == 0x100:
            entropy = payload

    if sof is None or scan_comps is None:
        raise ValueError("truncated JPEG (missing SOF/SOS)")
    h, w, comps = sof["h"], sof["w"], sof["comps"]
    if len(scan_comps) != len(comps):
        raise ValueError("non-interleaved scans unsupported (baseline profile)")
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        if sc["id"] not in by_id:
            raise ValueError(f"SOS component {sc['id']} not declared in SOF")
        c = by_id[sc["id"]]
        c["dc_tab"] = huff.get(sc["dc"])
        c["ac_tab"] = huff.get(0x10 | sc["ac"])
        if c["dc_tab"] is None or c["ac_tab"] is None:
            raise ValueError("missing Huffman table")
        if c["tq"] not in qtabs:
            raise ValueError("missing quant table")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    coef = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.int32)
        for c in comps
    }

    segments = _split_entropy(entropy)
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = {c["id"]: 0 for c in comps}
    mcu_in_seg = 0
    total_mcus = mcux * mcuy

    for m in range(total_mcus):
        if restart_interval and mcu_in_seg == restart_interval and seg_idx + 1 < len(segments):
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            preds = {c["id"]: 0 for c in comps}
            mcu_in_seg = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int32)
                    s = reader.decode_symbol(c["dc_tab"])
                    diff = _extend(reader.get(s), s) if s else 0
                    preds[c["id"]] += diff
                    blk[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(c["ac_tab"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(reader.get(s), s)
                        k += 1
                    dst = coef[c["id"]][my * c["v"] + by, mx * c["h"] + bx]
                    dst[ZZ_ROWS, ZZ_COLS] = blk
        mcu_in_seg += 1

    planes = []
    for c in comps:
        plane = _dequant_idct(coef[c["id"]], qtabs[c["tq"]])
        # upsample by replication to full MCU-grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        g = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    return ycbcr_to_rgb(np.stack(planes, axis=-1))
