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

from ._binary import p16le as _p16
from ._binary import p32le as _p32
from ._binary import u16le as _u16
from ._binary import u32le as _u32

AVI_MAGIC = b"RIFF"


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


def read_avi_audio(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → (samples, sample_rate) of the FIRST audio (`auds`) stream.

    The stream's `strf` IS a WAVEFORMATEX — byte-identical to a WAV `fmt `
    chunk body — so this re-wraps it plus the concatenated `##wb` payloads
    as a RIFF/WAVE stream and hands it to functions/wav.py::decode_wav.
    Every WAV-family codec (PCM 8/16/24/32, float, G.711 mu-law/A-law,
    IMA ADPCM) therefore works inside an AVI container for free."""
    try:
        return _read_audio_impl(bytes(data))
    except (IndexError, KeyError) as exc:
        raise ValueError(f"malformed AVI stream: {type(exc).__name__}: {exc}") from exc


def _read_audio_impl(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")

    auds_stream: int | None = None
    auds_frames = 0  # strh dwLength: total sample frames (trims ADPCM padding)
    stream_idx = -1
    last_strh_is_auds = False
    fmt_body: bytes | None = None
    payloads: list[bytes] = []

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
        nxt = body + size + (size & 1)
        if cc == b"LIST":
            stack.append((nxt, end))
            pos, end = body + 4, body + size
            continue
        if cc == b"strh":
            stream_idx += 1
            last_strh_is_auds = (
                size >= 4 and data[body : body + 4] == b"auds" and auds_stream is None
            )
            if last_strh_is_auds:
                auds_stream = stream_idx
                if size >= 36:
                    auds_frames = _u32(data, body + 32)
        elif cc == b"strf":
            if last_strh_is_auds and fmt_body is None:
                fmt_body = data[body : body + size]
            last_strh_is_auds = False
        elif len(cc) == 4 and cc[2:4] == b"wb":
            try:
                sid = int(cc[:2], 16)
            except ValueError:
                sid = -1
            if auds_stream is not None and sid == auds_stream:
                payloads.append(data[body : body + size])
        pos = nxt

    if fmt_body is None or not payloads:
        raise ValueError("AVI stream has no audio track")
    from .wav import decode_wav

    u32 = _p32

    pcm = b"".join(payloads)
    fmt_chunk = b"fmt " + u32(len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        fmt_chunk += b"\x00"
    wav_body = b"WAVE" + fmt_chunk + b"data" + u32(len(pcm)) + pcm
    samples, rate = decode_wav(b"RIFF" + u32(len(wav_body)) + wav_body)
    if 0 < auds_frames < len(samples):
        samples = samples[:auds_frames]  # compressed fmts pad to block size
    return samples, rate


def _split_wav(wav: bytes) -> tuple[bytes, bytes]:
    """RIFF/WAVE bytes → (fmt chunk body, data chunk payload) — used to embed
    an encode_wav result into an AVI auds stream."""
    fmt_body = payload = None
    pos = 12
    while pos + 8 <= len(wav):
        cid = wav[pos : pos + 4]
        size = _u32(wav, pos + 4)
        if cid == b"fmt ":
            fmt_body = wav[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            payload = wav[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt_body is None or payload is None:
        raise ValueError("malformed WAV from encode_wav")
    return fmt_body, payload


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    fps: float = 10.0,
    quality: int = 85,
    audio: np.ndarray | None = None,
    audio_rate: int = 8000,
    audio_bits: int | str = 16,
) -> bytes:
    """List of (H, W, 3) uint8 frames → MJPEG AVI bytes (each frame encoded
    by the repo's own baseline-JPEG writer). Pass `audio` (n_frames, n_ch)
    float in [-1, 1] to add an auds stream (encoded by encode_wav with
    `audio_bits` — any WAV-family codec incl. "ulaw"/"adpcm"). Deterministic
    fixture generator, same pattern as encode_png/encode_jpeg/encode_wav."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    if not (fps > 0):
        raise ValueError(f"bad fps {fps}")
    payloads = [encode_jpeg(f, quality=quality, subsample="420") for f in frames]

    u16, u32 = _p16, _p32

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + u32(len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec = int(round(1e6 / fps))
    max_bytes = max(len(p) for p in payloads)
    n_streams = 1 if audio is None else 2
    avih = (
        u32(usec) + u32(int(max_bytes * fps)) + u32(0) + u32(0)  # no idx1 → no AVIF_HASINDEX
        + u32(len(payloads)) + u32(0) + u32(n_streams) + u32(max_bytes)
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
    strls = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    movi_chunks = b"".join(chunk(b"00dc", p) for p in payloads)
    if audio is not None:
        from .wav import encode_wav

        fmt_body, audio_payload = _split_wav(
            encode_wav(audio, audio_rate, bits=audio_bits)
        )
        n_audio_frames = int(np.asarray(audio).shape[0])
        strh_a = (
            b"auds" + b"\x00" * 4 + u32(0) + u16(0) + u16(0) + u32(0)
            + u32(1) + u32(audio_rate)  # dwScale / dwRate
            + u32(0) + u32(n_audio_frames)  # dwStart / dwLength (sample frames)
            + u32(len(audio_payload)) + u32(0xFFFFFFFF) + u32(0) + u16(0) * 4
        )
        strls += lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", fmt_body))
        movi_chunks += chunk(b"01wb", audio_payload)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)
    movi = lst(b"movi", movi_chunks)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + u32(len(riff_body)) + riff_body
