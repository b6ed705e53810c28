"""From-scratch AVI (RIFF) container reader + MJPEG writer, pure Python/numpy.

Public-spec implementation (Microsoft AVI RIFF form): `LIST hdrl` carries the
main header (`avih`: frame period, total frames, dimensions) and per-stream
headers (`strh`/`strf`); `LIST movi` carries the frame chunks (`##dc`/`##db`).
For MJPEG (`fccHandler 'MJPG'`) every video chunk is a standalone baseline
JPEG — which the repo already decodes from scratch (functions/jpeg.py), so
the whole video path is real in-sandbox: container parse here, per-frame
pixel decode there.

The scale-relevant property this module preserves: `read_avi_mjpeg` returns
frame BYTES lazily indexable by frame number, so a sampling stage decodes
ONLY the frames it needs (decode cost ∝ sampled frames, not clip length).

Malformed streams raise ValueError (never IndexError) — the same contract as
functions/jpeg.py / functions/gif.py / functions/wav.py.
"""

from __future__ import annotations

import numpy as np

AVI_MAGIC = b"RIFF"


def _u32(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8) | (b[o + 2] << 16) | (b[o + 3] << 24)


def _u16(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8)


def read_avi_mjpeg(data: bytes) -> dict:
    """AVI bytes → {"width", "height", "fps", "n_frames", "frames": [...]}
    for the FIRST video stream. Frames are zero-copy memoryview slices over
    the raw per-chunk payloads (JPEG bitstreams under MJPEG) — not decoded
    and not copied here, so a sampler touching one frame of a long clip
    pays for one frame."""
    try:
        return _read_impl(bytes(data))
    except (IndexError, KeyError) as exc:
        raise ValueError(f"malformed AVI stream: {type(exc).__name__}: {exc}") from exc


def _read_impl(data: bytes) -> dict:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")

    info = {"width": 0, "height": 0, "fps": 0.0, "n_frames": 0}
    frames: list[memoryview] = []
    vids_stream: int | None = None
    stream_idx = -1
    view = memoryview(data)  # frames stay zero-copy slices of the input

    # iterative in-order LIST walk (explicit resume stack): visits chunks in
    # exact file order — hdrl's strh is seen before movi's frames — and a
    # crafted file with thousands of nested LISTs parses (or fails with
    # ValueError), never RecursionError
    stack: list[tuple[int, int]] = []
    pos, end = 12, len(data)
    while True:
        if pos + 8 > end:
            if not stack:
                break
            pos, end = stack.pop()
            continue
        cc = data[pos : pos + 4]
        size = _u32(data, pos + 4)
        body = pos + 8
        if body + size > len(data):
            raise ValueError(f"truncated AVI: chunk {cc!r} overruns the file")
        nxt = body + size + (size & 1)  # word-aligned
        if cc == b"LIST":
            stack.append((nxt, end))
            pos, end = body + 4, body + size
            continue
        if cc == b"avih":
            if size < 40:
                raise ValueError("avih header truncated")
            usec = _u32(data, body)
            info["fps"] = 1e6 / usec if usec else 0.0
            info["n_frames"] = _u32(data, body + 16)
            info["width"] = _u32(data, body + 32)
            info["height"] = _u32(data, body + 36)
        elif cc == b"strh":
            stream_idx += 1
            if size >= 8 and data[body : body + 4] == b"vids" and vids_stream is None:
                vids_stream = stream_idx
                # dwScale/dwRate give the authoritative frame rate
                if size >= 28:
                    scale, rate = _u32(data, body + 20), _u32(data, body + 24)
                    if scale and rate:
                        info["fps"] = rate / scale
        elif len(cc) == 4 and cc[2:4] in (b"dc", b"db"):
            # two-char stream id; hex parse covers both the universal
            # single-digit case and >= 10 streams ('0A'-style ids)
            try:
                sid = int(cc[:2], 16)
            except ValueError:
                sid = -1
            if vids_stream is None or sid == vids_stream:
                frames.append(view[body : body + size])
        pos = nxt
    if not frames:
        raise ValueError("AVI stream has no video frame chunks")
    info["frames"] = frames
    if not info["n_frames"]:
        info["n_frames"] = len(frames)
    return info


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 10.0, quality: int = 85
) -> bytes:
    """List of (H, W, 3) uint8 frames → MJPEG AVI bytes (each frame encoded
    by the repo's own baseline-JPEG writer). Deterministic fixture generator,
    same pattern as encode_png/encode_jpeg/encode_wav/encode_gif."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    if not (fps > 0):
        raise ValueError(f"bad fps {fps}")
    payloads = [encode_jpeg(f, quality=quality, subsample="420") for f in frames]

    def u32(v: int) -> bytes:
        return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF))

    def u16(v: int) -> bytes:
        return bytes((v & 0xFF, (v >> 8) & 0xFF))

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + u32(len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec = int(round(1e6 / fps))
    max_bytes = max(len(p) for p in payloads)
    avih = (
        u32(usec) + u32(int(max_bytes * fps)) + u32(0) + u32(0)  # no idx1 → no AVIF_HASINDEX
        + u32(len(payloads)) + u32(0) + u32(1) + u32(max_bytes)
        + u32(w) + u32(h) + u32(0) * 4
    )
    strh = (
        b"vids" + b"MJPG" + u32(0) + u16(0) + u16(0) + u32(0)
        + u32(1000) + u32(int(round(fps * 1000)))  # dwScale / dwRate
        + u32(0) + u32(len(payloads)) + u32(max_bytes) + u32(0xFFFFFFFF) + u32(0)
        + u16(0) + u16(0) + u16(w) + u16(h)
    )
    strf = (
        u32(40) + u32(w) + u32(h) + u16(1) + u16(24) + b"MJPG"
        + u32(w * h * 3) + u32(0) + u32(0) + u32(0) + u32(0)
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + u32(len(riff_body)) + riff_body
