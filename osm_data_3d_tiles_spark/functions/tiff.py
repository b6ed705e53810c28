"""From-scratch baseline-TIFF codec, pure Python/numpy.

Public-spec implementation (TIFF 6.0): II/MM byte orders, IFD tag walk,
strip-organized 8-bit images in grayscale / palette-color / RGB / RGBA
(contiguous planar config), three compressions — none (1), LZW (5: MSB-first
variable-width codes with the early-change quirk, horizontal-differencing
predictor 2) and PackBits (32773) — and the tags a real scanned-document
crawl hits (BitsPerSample, RowsPerStrip, StripOffsets/ByteCounts, ColorMap,
Predictor). Tiled TIFFs, 16-bit channels and the exotic compressions
(CCITT fax, JPEG-in-TIFF) raise ValueError — same refusal contract as the
other codecs in this package.

The encoder emits deterministic strip-organized RGB(A)/gray TIFFs in any of
the three compressions, so every decoder path round-trips against the repo's
own writer; the LZW bitstream (MSB-first, early change) is additionally
pinned by hand-assembled streams in the tests.

Reference parity note: the reference repo (TypeScript) delegates image decode
to browser loaders; this module serves the graft's multimodal family
(operators/multimodal.py). Malformed streams raise ValueError.
"""

from __future__ import annotations

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_PACKBITS = 32773


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → (h, w, 3|4) uint8 RGB(A) (gray/palette expanded), first
    IFD only."""
    try:
        return _decode_impl(bytes(data))
    except (IndexError, KeyError) as exc:
        raise ValueError(f"malformed TIFF stream: {type(exc).__name__}: {exc}") from exc


def _decode_impl(data: bytes) -> np.ndarray:
    if len(data) < 8 or data[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF stream")
    bo = "<" if data[:2] == b"II" else ">"

    def u16(o: int) -> int:
        if o + 2 > len(data):
            raise ValueError("TIFF stream truncated")
        return int.from_bytes(data[o : o + 2], "little" if bo == "<" else "big")

    def u32(o: int) -> int:
        if o + 4 > len(data):
            raise ValueError("TIFF stream truncated")
        return int.from_bytes(data[o : o + 4], "little" if bo == "<" else "big")

    ifd = u32(4)
    if ifd + 2 > len(data):
        raise ValueError("TIFF IFD offset out of range")
    n_tags = u16(ifd)
    tags: dict[int, list[int]] = {}
    _SZ = {1: 1, 2: 1, 3: 2, 4: 4}
    for i in range(n_tags):
        e = ifd + 2 + 12 * i
        tag, typ, count = u16(e), u16(e + 2), u32(e + 4)
        if typ not in _SZ or count == 0:
            continue  # rational/undefined tags are irrelevant here
        nbytes = _SZ[typ] * count
        off = e + 8 if nbytes <= 4 else u32(e + 8)
        vals = []
        for k in range(count):
            o = off + _SZ[typ] * k
            if typ in (1, 2):
                if o >= len(data):
                    raise ValueError("TIFF tag value out of range")
                vals.append(data[o])
            elif typ == 3:
                vals.append(u16(o))
            else:
                vals.append(u32(o))
        tags[tag] = vals

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    if not (1 <= w <= 1 << 20 and 1 <= h <= 1 << 20):
        raise ValueError(f"bad TIFF dimensions {w}x{h}")
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError("only 8-bit TIFF channels decode in-sandbox")
    comp = one(259, _COMP_NONE)
    photo = one(262, 1)
    planar = one(284, 1)
    if planar != 1:
        raise ValueError("planar TIFF (PlanarConfiguration=2) unsupported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (strip-organized only)")
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")

    row_bytes = w * spp
    out = bytearray()
    row0 = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise ValueError("TIFF strip overruns the file")
        strip = data[off : off + cnt]
        n_rows = min(rows_per_strip, h - row0)
        want = n_rows * row_bytes
        if comp == _COMP_NONE:
            raw = strip
        elif comp == _COMP_PACKBITS:
            raw = _packbits_decode(strip, want)
        elif comp == _COMP_LZW:
            raw = _tiff_lzw_decode(strip, want)
        else:
            raise ValueError(
                f"TIFF compression {comp} unsupported (none/LZW/PackBits only)"
            )
        if len(raw) < want:
            raise ValueError("TIFF strip decodes short")
        raw = raw[:want]
        if predictor == 2:
            arr = np.frombuffer(raw, dtype=np.uint8).reshape(n_rows, w, spp)
            raw = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8).tobytes()
        elif predictor != 1:
            raise ValueError(f"TIFF predictor {predictor} unsupported")
        out += raw
        row0 += n_rows
    if row0 < h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")

    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, spp)
    if photo == 3:  # palette-color: ColorMap is 3*2^bits 16-bit values
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        lut = (np.array(cmap[: 3 * 256], dtype=np.uint32).reshape(3, 256) >> 8).astype(
            np.uint8
        )
        return np.stack([lut[c][px[..., 0]] for c in range(3)], axis=-1)
    if photo == 0 and spp == 1:  # WhiteIsZero
        return np.repeat(255 - px, 3, axis=-1)
    if photo == 1 and spp == 1:  # BlackIsZero
        return np.repeat(px, 3, axis=-1)
    if photo == 2 and spp in (3, 4):
        return px.copy()
    raise ValueError(f"TIFF photometric {photo} with {spp} samples unsupported")


def _packbits_decode(src: bytes, want: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < want:
        n = src[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            if i + n + 1 > len(src):
                raise ValueError("PackBits literal overruns the strip")
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(src):
                raise ValueError("PackBits repeat overruns the strip")
            out += bytes((src[i],)) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(src: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and src[i + run] == src[i]:
            run += 1
        if run >= 2:
            out += bytes((257 - run, src[i]))
            i += run
            continue
        # literal: until the next >=3 run or 128 bytes
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 2 < n and src[j] == src[j + 1] == src[j + 2])
        ):
            j += 1
        out += bytes((j - i - 1,)) + src[i:j]
        i = j
    return bytes(out)


# TIFF LZW: MSB-first bit packing, codes grow at 511/1023/2047 minus one
# (the "early change" quirk), dictionary reset via ClearCode 256, EOI 257.


def _tiff_lzw_decode(src: bytes, want: int) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes((i,)) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    i = 0
    while len(out) < want:
        while nbits < width:
            if i >= len(src):
                return bytes(out)  # truncated tail tolerated like libtiff
            acc = (acc << 8) | src[i]
            nbits += 8
            i += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = [bytes((k,)) for k in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # early change, seen from the decoder: the decoder's table lags the
        # encoder's by one entry at the same stream position, so it must
        # widen at (1<<width)-2 where the encoder widens at next_code ==
        # (1<<width)-1 — the libtiff-compatible pairing
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _tiff_lzw_encode(src: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code = 258
    put(CLEAR)
    run = b""
    for v in src:
        cand = run + bytes((v,))
        if cand in table:
            run = cand
            continue
        put(table[run])
        table[cand] = next_code
        next_code += 1
        # encoder widens when the NEXT code would not fit — one early,
        # mirroring the decoder's early-change rule
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            put(CLEAR)
            table = {bytes((k,)): k for k in range(256)}
            next_code = 258
            width = 9
        run = bytes((v,))
    if run:
        put(table[run])
    put(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    rows_per_strip: int = 8,
    predictor: bool = False,
    big_endian: bool = False,
) -> bytes:
    """(h, w) gray or (h, w, 3|4) uint8 → strip-organized TIFF bytes.
    compression: "none" | "lzw" | "packbits"; predictor=True applies
    horizontal differencing (LZW only, tag 317=2). Deterministic fixture
    generator, same pattern as the other encode_* writers."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_tiff wants (h,w) or (h,w,3|4) uint8")
    if img.ndim == 2:
        img = img[..., None]
    h, w, spp = img.shape
    if spp not in (1, 3, 4):
        raise ValueError("1, 3 or 4 samples per pixel only")
    comp = {"none": _COMP_NONE, "lzw": _COMP_LZW, "packbits": _COMP_PACKBITS}.get(
        compression
    )
    if comp is None:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and comp != _COMP_LZW:
        raise ValueError("predictor=True is an LZW feature (tag 317)")

    bo = ">" if big_endian else "<"
    endian = "big" if big_endian else "little"

    def u16(v: int) -> bytes:
        return v.to_bytes(2, endian)

    def u32(v: int) -> bytes:
        return v.to_bytes(4, endian)

    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = img[r0 : r0 + rows_per_strip]
        if predictor:
            d = rows.astype(np.int16)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            raw = (d & 0xFF).astype(np.uint8).tobytes()
        else:
            raw = rows.tobytes()
        if comp == _COMP_LZW:
            strips.append(_tiff_lzw_encode(raw))
        elif comp == _COMP_PACKBITS:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)

    n_strips = len(strips)
    entries: list[tuple[int, int, int, bytes | int]] = []  # tag, type, count, value

    extra = bytearray()  # out-of-line values, laid out after the IFD
    header_len = 8
    # IFD layout: count(2) + 12*n + next(4); compute tag count first
    tag_list = [256, 257, 258, 259, 262, 273, 277, 278, 279, 284]
    if predictor:
        tag_list.append(317)
    tag_list.sort()
    ifd_len = 2 + 12 * len(tag_list) + 4
    data_base = header_len + ifd_len

    def add_extra(b: bytes) -> int:
        off = data_base + len(extra)
        extra.extend(b)
        if len(extra) & 1:
            extra.append(0)
        return off

    bps_val: bytes | int
    if spp == 1:
        bps_val = 8
        bps_count = 1
    else:
        bps_count = spp
        packed = b"".join(u16(8) for _ in range(spp))
        bps_val = packed if len(packed) <= 4 else add_extra(packed)

    if n_strips == 1:
        off_val: bytes | int = 0  # patched below
        cnt_val: bytes | int = len(strips[0])
    else:
        off_val = add_extra(b"\x00" * 4 * n_strips)  # patched below
        cnt_val = add_extra(b"".join(u32(len(s)) for s in strips))

    strip_data_base = data_base + len(extra)
    offs = []
    pos = strip_data_base
    for s in strips:
        offs.append(pos)
        pos += len(s) + (len(s) & 1)
    if n_strips == 1:
        off_val = offs[0]
    else:
        o = off_val - data_base
        extra[o : o + 4 * n_strips] = b"".join(u32(v) for v in offs)

    vals = {
        256: (4, 1, w), 257: (4, 1, h),
        258: (3, bps_count, bps_val),
        259: (3, 1, comp),
        262: (3, 1, 1 if spp == 1 else 2),
        273: (4, n_strips, off_val),
        277: (3, 1, spp),
        278: (4, 1, rows_per_strip),
        279: (4, n_strips, cnt_val),
        284: (3, 1, 1),
    }
    if predictor:
        vals[317] = (3, 1, 2)

    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00") + u32(8)
    out += u16(len(tag_list))
    for tag in tag_list:
        typ, count, v = vals[tag]
        out += u16(tag) + u16(typ) + u32(count)
        if isinstance(v, bytes):
            out += v.ljust(4, b"\x00")
        elif typ == 3 and count == 1:
            out += u16(v) + b"\x00\x00"
        else:
            out += u32(v)
    out += u32(0)  # no next IFD
    out += extra
    for s in strips:
        out += s
        if len(s) & 1:
            out += b"\x00"
    return bytes(out)
