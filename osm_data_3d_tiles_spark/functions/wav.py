"""From-scratch RIFF/WAVE (WAV) reader + writer in pure numpy.

Public-spec implementation (RIFF-1991 / Microsoft WAVEFORMATEX layout): the
`fmt ` chunk carries format tag, channel count, sample rate and bit depth;
the `data` chunk carries interleaved little-endian frames. Supported sample
formats — the ones that appear in practice for uncompressed audio:

- PCM (format tag 1): unsigned 8-bit, signed 16/24/32-bit
- IEEE float (format tag 3): float32, float64
- G.711 A-law (tag 6) and mu-law (tag 7): the ITU-T G.711 companded 8-bit
  telephony codecs, expanded with the published segment tables
- IMA/DVI ADPCM (tag 0x11): 4-bit delta coding over the published 89-entry
  step table, block headers + round-robin nibble groups, honoring the
  `fact` chunk frame count
- WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping any of the above
  (SubFormat GUID prefix 1, 3, 6, 7 or 0x11)

The companded/delta formats are pure table math, so they decode honestly
in-sandbox — no codec library involved.

Other compressed tags (MP3/ADPCM/…) raise ValueError — mirroring the
image-side contract (PNG/JPEG/GIF real, other codecs refused; see
operators/multimodal.py).

Reference parity note: the reference repo has no audio path at all — this
module exists for the LLM-data-pipeline multimodal family (brief: treat
audio as opaque binary + typed metadata, decode behind a real-or-stub seam).

Everything is numpy over one `np.frombuffer` per file; no per-sample Python.
"""

from __future__ import annotations

import numpy as np

from ._binary import p16le as _p16
from ._binary import p32le as _p32
from ._binary import u16le as _u16
from ._binary import u32le as _u32

_PCM = 1
_IEEE_FLOAT = 3
_ALAW = 6
_MULAW = 7
_IMA_ADPCM = 0x11
_EXTENSIBLE = 0xFFFE

# first two bytes of the SubFormat GUID hold the wrapped format tag
_KSDATAFORMAT_PREFIX = {
    1: _PCM, 3: _IEEE_FLOAT, 6: _ALAW, 7: _MULAW, 0x11: _IMA_ADPCM,
}

WAV_MAGIC = b"RIFF"


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law expand: uint8 codewords → float64 in [-1, 1].

    The published expansion (complement, 4-bit mantissa + 3-bit segment with
    bias 0x84) on the 16-bit scale; peak magnitude is 32124/32768."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    lin = np.where(u & 0x80, 0x84 - t, t - 0x84)
    return lin.astype(np.float64) / 32768.0


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law expand: uint8 codewords → float64 in [-1, 1].

    Even bits are inverted on the wire (XOR 0x55); segment 0/1 are linear,
    higher segments shift. Peak magnitude is 32256/32768; A-law has no exact
    zero codeword (smallest magnitude is ±8/32768)."""
    a = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(
        seg == 0,
        t + 8,
        (t + 0x108) << np.maximum(seg - 1, 0),
    )
    lin = np.where(a & 0x80, t, -t)
    return lin.astype(np.float64) / 32768.0


def _nearest_codeword_encoder(decode_fn):
    """Optimal quantizer for an 8-bit companding law: encode each sample to
    the codeword whose expansion is nearest. Built once from the 256-entry
    decode table; encoding is two vectorized searchsorted/compare passes."""
    codes = np.arange(256, dtype=np.uint8)
    values = decode_fn(codes)
    order = np.argsort(values, kind="stable")
    sorted_vals = values[order]
    sorted_codes = codes[order]

    def encode(x: np.ndarray) -> np.ndarray:
        x = np.clip(np.asarray(x, dtype=np.float64), -1.0, 1.0)
        idx = np.clip(np.searchsorted(sorted_vals, x), 1, 255)
        left, right = sorted_vals[idx - 1], sorted_vals[idx]
        pick = np.where((x - left) <= (right - x), idx - 1, idx)
        return sorted_codes[pick]

    return encode


mulaw_encode = _nearest_codeword_encoder(mulaw_decode)
alaw_encode = _nearest_codeword_encoder(alaw_decode)


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11): 4-bit delta coding with the published
# 89-entry step table. The recurrence is sequential BY SPEC (each nibble's
# predictor feeds the next), so vectorization runs ACROSS blocks×channels —
# the per-iteration loop is over sample position within a block only.
# ---------------------------------------------------------------------------

_IMA_STEP = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
     7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
     18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)


def _ima_expand(pred, idx, nib):
    """One decode step for a vector of streams: (pred, idx, nibble) → new
    (pred, idx). Arithmetic exactly as published: diff = step/8 (+step/4)
    (+step/2) (+step) per mantissa bit, sign in bit 3."""
    step = _IMA_STEP[idx]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    pred = np.clip(np.where(nib & 8, pred - diff, pred + diff), -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX[nib], 0, 88)
    return pred, idx


def _ima_adpcm_decode(
    pcm: bytes, n_ch: int, block_align: int, samples_per_block: int | None
) -> np.ndarray:
    """IMA ADPCM data chunk → (n_frames, n_ch) float64 in [-1, 1].

    Block layout per spec: one 4-byte header per channel (initial int16
    predictor = the block's first sample, step index, reserved), then the
    nibble data in 4-byte groups round-robin across channels, low nibble
    first."""
    header_bytes = 4 * n_ch
    if block_align <= header_bytes or block_align % 4:
        raise ValueError(f"invalid ADPCM block_align {block_align} for {n_ch} ch")
    n_blocks = len(pcm) // block_align
    if n_blocks == 0:
        raise ValueError("ADPCM data shorter than one block")
    raw = np.frombuffer(
        bytes(pcm)[: n_blocks * block_align], dtype=np.uint8
    ).reshape(n_blocks, block_align)

    headers = raw[:, :header_bytes].reshape(n_blocks, n_ch, 4)
    pred0 = headers[:, :, 0].astype(np.int32) | (
        headers[:, :, 1].astype(np.int32) << 8
    )
    pred0 = np.where(pred0 >= 32768, pred0 - 65536, pred0)
    idx0 = headers[:, :, 2].astype(np.int32)
    if (idx0 > 88).any():
        raise ValueError("ADPCM step index out of range")

    n_groups = (block_align - header_bytes) // (4 * n_ch)
    body = raw[:, header_bytes : header_bytes + n_groups * 4 * n_ch]
    body = body.reshape(n_blocks, n_groups, n_ch, 4).transpose(0, 2, 1, 3)
    chbytes = body.reshape(n_blocks * n_ch, n_groups * 4)
    nibbles = np.empty((n_blocks * n_ch, n_groups * 8), dtype=np.uint8)
    nibbles[:, 0::2] = chbytes & 0x0F
    nibbles[:, 1::2] = chbytes >> 4

    pred = pred0.reshape(-1)
    idx = np.clip(idx0.reshape(-1), 0, 88)
    out = np.empty_like(nibbles, dtype=np.int32)
    for j in range(nibbles.shape[1]):
        pred, idx = _ima_expand(pred, idx, nibbles[:, j].astype(np.int32))
        out[:, j] = pred

    # header predictor is the block's first sample
    full = np.concatenate(
        [pred0.reshape(n_blocks, n_ch, 1), out.reshape(n_blocks, n_ch, -1)],
        axis=2,
    )
    if samples_per_block:
        full = full[:, :, :samples_per_block]
    frames = full.transpose(0, 2, 1).reshape(-1, n_ch)
    return frames.astype(np.float64) / 32768.0


def _ima_adpcm_encode(
    samples16: np.ndarray, block_align: int
) -> tuple[bytes, int, int]:
    """(n_frames, n_ch) int16 → (data bytes, samples_per_block, n_frames).

    Standard greedy encoder: quantize diff against the current step with the
    same bit tests the decoder inverts, tracking the decoder's predictor so
    error never accumulates past one step. Vectorized across blocks×channels."""
    n_frames, n_ch = samples16.shape
    header_bytes = 4 * n_ch
    spb = (block_align - header_bytes) * 2 // n_ch + 1
    n_blocks = -(-n_frames // spb)
    padded = np.zeros((n_blocks * spb, n_ch), dtype=np.int32)
    padded[:n_frames] = samples16.astype(np.int32)
    if n_frames:
        padded[n_frames:] = padded[n_frames - 1]  # hold last frame in the pad

    # (blocks*ch, spb) streams
    blocks = padded.reshape(n_blocks, spb, n_ch).transpose(0, 2, 1).reshape(
        n_blocks * n_ch, spb
    )
    pred = blocks[:, 0].copy()
    # header index per block: the step nearest the block's own mean |delta|
    # (any 0-88 is legal in the header; this kills the step-ramp transient a
    # fixed 0 would re-pay at every block start, with no cross-block coupling)
    mean_delta = (
        np.abs(np.diff(blocks, axis=1)).mean(axis=1) if spb > 1
        else np.zeros(len(blocks))
    )
    idx = np.clip(
        np.searchsorted(_IMA_STEP, mean_delta).astype(np.int32), 0, 88
    )
    idx0 = idx.copy()
    nibbles = np.empty((len(blocks), spb - 1), dtype=np.uint8)
    for j in range(1, spb):
        step = _IMA_STEP[idx]
        diff = blocks[:, j] - pred
        nib = np.where(diff < 0, 8, 0).astype(np.int32)
        diff = np.abs(diff)
        b4 = diff >= step
        diff = diff - np.where(b4, step, 0)
        half = step >> 1
        b2 = diff >= half
        diff = diff - np.where(b2, half, 0)
        b1 = diff >= (step >> 2)
        nib = nib | np.where(b4, 4, 0) | np.where(b2, 2, 0) | np.where(b1, 1, 0)
        pred, idx = _ima_expand(pred, idx, nib)
        nibbles[:, j - 1] = nib.astype(np.uint8)

    # pack: per block, per channel header then 4-byte groups round-robin
    lo = nibbles[:, 0::2]
    hi = nibbles[:, 1::2]
    chbytes = (lo | (hi << 4)).astype(np.uint8)  # (blocks*ch, (spb-1)/2)
    n_groups = chbytes.shape[1] // 4
    grouped = chbytes.reshape(n_blocks, n_ch, n_groups, 4).transpose(0, 2, 1, 3)

    first = blocks[:, 0].reshape(n_blocks, n_ch)
    headers = np.zeros((n_blocks, n_ch, 4), dtype=np.uint8)
    headers[:, :, 0] = first & 0xFF
    headers[:, :, 1] = (first >> 8) & 0xFF
    headers[:, :, 2] = idx0.reshape(n_blocks, n_ch).astype(np.uint8)

    data = np.concatenate(
        [headers.reshape(n_blocks, -1), grouped.reshape(n_blocks, -1)], axis=1
    )
    return data.tobytes(), spb, n_frames


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float64 in [-1, 1] shaped (n_frames, n_channels),
    sample_rate). Raises ValueError on non-WAV, compressed, or malformed
    input (lying chunk sizes surface as ValueError, never IndexError)."""
    try:
        return _decode_wav_impl(bytes(data))
    except (IndexError, KeyError) as exc:
        raise ValueError(f"malformed WAV stream: {type(exc).__name__}: {exc}") from exc


def _decode_wav_impl(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")

    fmt = None
    pcm = None
    fact_frames = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = _u32(data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk truncated")
            tag = _u16(body, 0)
            n_ch = _u16(body, 2)
            rate = _u32(body, 4)
            block_align = _u16(body, 12)
            bits = _u16(body, 14)
            samples_per_block = None
            if tag == _EXTENSIBLE:
                # cbSize >= 22: validBits(2) + channelMask(4) + SubFormat GUID(16)
                if len(body) < 26:
                    raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk truncated")
                sub = _u16(body, 24)
                tag = _KSDATAFORMAT_PREFIX.get(sub)
                if tag is None:
                    raise ValueError(f"unsupported EXTENSIBLE SubFormat {sub}")
            # AFTER the EXTENSIBLE unwrap: in both the plain-IMA layout
            # (cbSize >= 2 union) and the extensible layout (Samples union)
            # wSamplesPerBlock sits at offset 18, but the tag is only known
            # once the SubFormat GUID has been resolved.
            if tag == _IMA_ADPCM and len(body) >= 20:
                samples_per_block = _u16(body, 18)
            fmt = {
                "tag": tag, "n_ch": n_ch, "rate": rate, "bits": bits,
                "block_align": block_align,
                "samples_per_block": samples_per_block,
            }
        elif cid == b"data":
            pcm = body
        elif cid == b"fact" and len(body) >= 4:
            fact_frames = _u32(body, 0)  # total sample frames (compressed fmts)
        pos += 8 + size + (size & 1)  # chunks are word-aligned

    if fmt is None or pcm is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    if fmt["n_ch"] < 1 or fmt["rate"] < 1:
        raise ValueError(f"invalid fmt: channels={fmt['n_ch']} rate={fmt['rate']}")

    tag, bits, n_ch = fmt["tag"], fmt["bits"], fmt["n_ch"]
    if tag == _PCM and bits == 8:
        x = np.frombuffer(pcm, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif tag == _PCM and bits == 16:
        x = np.frombuffer(pcm[: len(pcm) & ~1], dtype="<i2").astype(np.float64) / 32768.0
    elif tag == _PCM and bits == 24:
        raw = np.frombuffer(pcm[: len(pcm) - len(pcm) % 3], dtype=np.uint8)
        raw = raw.reshape(-1, 3)
        # little-endian 24-bit → sign-extended int32
        val = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        x = val.astype(np.float64) / float(1 << 23)
    elif tag == _PCM and bits == 32:
        x = np.frombuffer(pcm[: len(pcm) & ~3], dtype="<i4").astype(np.float64) / float(
            1 << 31
        )
    elif tag == _IEEE_FLOAT and bits == 32:
        x = np.frombuffer(pcm[: len(pcm) & ~3], dtype="<f4").astype(np.float64)
    elif tag == _IEEE_FLOAT and bits == 64:
        x = np.frombuffer(pcm[: len(pcm) & ~7], dtype="<f8").astype(np.float64)
    elif tag == _MULAW and bits == 8:
        x = mulaw_decode(np.frombuffer(pcm, dtype=np.uint8))
    elif tag == _ALAW and bits == 8:
        x = alaw_decode(np.frombuffer(pcm, dtype=np.uint8))
    elif tag == _IMA_ADPCM and bits == 4:
        frames = _ima_adpcm_decode(
            pcm, n_ch, fmt["block_align"], fmt["samples_per_block"]
        )
        if fact_frames is not None:
            frames = frames[:fact_frames]
        return frames, fmt["rate"]
    else:
        raise ValueError(
            f"unsupported WAV format tag={tag} bits={bits} "
            "(PCM 8/16/24/32, float32/64, G.711 mu-law/A-law and IMA ADPCM "
            "decode in-sandbox; other compressed audio needs a codec library)"
        )

    n_frames = len(x) // n_ch
    return x[: n_frames * n_ch].reshape(n_frames, n_ch), fmt["rate"]


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """(n_frames, n_channels) float in [-1, 1] → WAV bytes (PCM 16-bit by
    default; 8/24/32 PCM, 32-bit float via bits=-32, G.711 via
    bits="ulaw"/"alaw", IMA ADPCM via bits="adpcm"). Deterministic — used to
    build checked-in test fixtures the same way encode_jpeg/encode_mvt do."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.shape[1] < 1:
        raise ValueError("encode_wav wants (n_frames, n_channels)")
    if not (1 <= sample_rate <= 0xFFFFFFFF):
        raise ValueError(f"bad sample_rate {sample_rate}")
    clipped = np.clip(samples, -1.0, 1.0)

    if bits == 8:
        tag, payload = _PCM, (np.round(clipped * 127.0) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        tag = _PCM
        payload = np.round(clipped * 32767.0).astype("<i2").tobytes()
    elif bits == 24:
        tag = _PCM
        val = np.round(clipped * float((1 << 23) - 1)).astype(np.int32)
        val = np.where(val < 0, val + (1 << 24), val).astype(np.uint32)
        raw = np.empty((val.size, 3), dtype=np.uint8)
        flat = val.reshape(-1)
        raw[:, 0] = flat & 0xFF
        raw[:, 1] = (flat >> 8) & 0xFF
        raw[:, 2] = (flat >> 16) & 0xFF
        payload = raw.tobytes()
    elif bits == 32:
        tag = _PCM
        payload = np.round(clipped * float((1 << 31) - 1)).astype("<i4").tobytes()
    elif bits == -32:  # float32 convention: negative = IEEE float
        tag, payload = _IEEE_FLOAT, clipped.astype("<f4").tobytes()
    elif bits == "ulaw":
        tag, payload = _MULAW, mulaw_encode(clipped).tobytes()
    elif bits == "alaw":
        tag, payload = _ALAW, alaw_encode(clipped).tobytes()
    elif bits == "adpcm":
        tag = _IMA_ADPCM
        n_ch = samples.shape[1]
        block_align = 256 * n_ch  # the conventional IMA block size
        s16 = np.round(clipped * 32767.0).astype(np.int16)
        payload, spb, n_frames = _ima_adpcm_encode(s16, block_align)
    else:
        raise ValueError(
            f"unsupported bits {bits} "
            "(8/16/24/32 PCM, -32 float, 'ulaw', 'alaw' or 'adpcm')"
        )

    n_ch = samples.shape[1]

    u16, u32 = _p16, _p32

    if bits == "adpcm":
        abits = 4
        byte_rate = (sample_rate * block_align + spb - 1) // spb
        fmt_body = (
            u16(tag) + u16(n_ch) + u32(sample_rate) + u32(byte_rate)
            + u16(block_align) + u16(abits) + u16(2) + u16(spb)
        )
        fact_chunk = b"fact" + u32(4) + u32(n_frames)
    else:
        abits = 8 if isinstance(bits, str) else abs(bits)
        block_align = n_ch * abits // 8
        byte_rate = sample_rate * block_align
        fmt_body = (
            u16(tag) + u16(n_ch) + u32(sample_rate) + u32(byte_rate)
            + u16(block_align) + u16(abits)
        )
        fact_chunk = b""

    fmt_chunk = b"fmt " + u32(len(fmt_body)) + fmt_body
    data_chunk = b"data" + u32(len(payload)) + payload
    if len(payload) & 1:
        data_chunk += b"\x00"
    riff_body = b"WAVE" + fmt_chunk + fact_chunk + data_chunk
    return b"RIFF" + u32(len(riff_body)) + riff_body


def audio_feature_row(samples: np.ndarray, sample_rate: int) -> dict:
    """Per-clip scalar features over decoded frames: the audio analogue of the
    image channel-sum stats. All numpy reductions — no Python loops."""
    mono = samples.mean(axis=1) if samples.shape[1] > 1 else samples[:, 0]
    n = len(mono)
    if n == 0:
        return {
            "n_frames": 0, "n_channels": int(samples.shape[1]),
            "sample_rate": int(sample_rate), "duration_s": 0.0,
            "rms": 0.0, "peak": 0.0, "zero_cross_rate": 0.0,
        }
    return {
        "n_frames": int(n),
        "n_channels": int(samples.shape[1]),
        "sample_rate": int(sample_rate),
        "duration_s": float(n / sample_rate),
        "rms": float(np.sqrt(np.mean(mono * mono))),
        "peak": float(np.max(np.abs(mono))),
        "zero_cross_rate": float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if n > 1
        else 0.0,
    }
