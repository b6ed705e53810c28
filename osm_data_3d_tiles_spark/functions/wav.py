"""From-scratch RIFF/WAVE (WAV) reader + writer in pure numpy.

Public-spec implementation (RIFF-1991 / Microsoft WAVEFORMATEX layout): the
`fmt ` chunk carries format tag, channel count, sample rate and bit depth;
the `data` chunk carries interleaved little-endian frames. Supported sample
formats — the ones that appear in practice for uncompressed audio:

- PCM (format tag 1): unsigned 8-bit, signed 16/24/32-bit
- IEEE float (format tag 3): float32, float64
- G.711 A-law (tag 6) and mu-law (tag 7): the ITU-T G.711 companded 8-bit
  telephony codecs, expanded with the published segment tables — the only
  "compressed" audio that is pure table math and therefore decodes honestly
  in-sandbox
- WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping any of the above
  (SubFormat GUID prefix 1, 3, 6 or 7)

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

_PCM = 1
_IEEE_FLOAT = 3
_ALAW = 6
_MULAW = 7
_EXTENSIBLE = 0xFFFE

# first two bytes of the SubFormat GUID hold the wrapped format tag
_KSDATAFORMAT_PREFIX = {1: _PCM, 3: _IEEE_FLOAT, 6: _ALAW, 7: _MULAW}

WAV_MAGIC = b"RIFF"


def _u16(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8)


def _u32(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8) | (b[o + 2] << 16) | (b[o + 3] << 24)


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
            bits = _u16(body, 14)
            if tag == _EXTENSIBLE:
                # cbSize >= 22: validBits(2) + channelMask(4) + SubFormat GUID(16)
                if len(body) < 26:
                    raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk truncated")
                sub = _u16(body, 24)
                tag = _KSDATAFORMAT_PREFIX.get(sub)
                if tag is None:
                    raise ValueError(f"unsupported EXTENSIBLE SubFormat {sub}")
            fmt = {"tag": tag, "n_ch": n_ch, "rate": rate, "bits": bits}
        elif cid == b"data":
            pcm = body
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
    else:
        raise ValueError(
            f"unsupported WAV format tag={tag} bits={bits} "
            "(PCM 8/16/24/32, float32/64 and G.711 mu-law/A-law decode "
            "in-sandbox; other compressed audio needs a codec library)"
        )

    n_frames = len(x) // n_ch
    return x[: n_frames * n_ch].reshape(n_frames, n_ch), fmt["rate"]


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """(n_frames, n_channels) float in [-1, 1] → WAV bytes (PCM 16-bit by
    default; 8/24/32 PCM, 32-bit float via bits=-32, and G.711 via
    bits="ulaw"/"alaw" supported). Deterministic — used to build checked-in
    test fixtures the same way encode_jpeg/encode_mvt do."""
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
    else:
        raise ValueError(
            f"unsupported bits {bits} "
            "(8/16/24/32 PCM, -32 float, 'ulaw' or 'alaw')"
        )

    n_ch = samples.shape[1]
    abits = 8 if isinstance(bits, str) else abs(bits)
    block_align = n_ch * abits // 8
    byte_rate = sample_rate * block_align

    def u16(v: int) -> bytes:
        return bytes((v & 0xFF, (v >> 8) & 0xFF))

    def u32(v: int) -> bytes:
        return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF))

    fmt_chunk = (
        b"fmt " + u32(16)
        + u16(tag) + u16(n_ch) + u32(sample_rate) + u32(byte_rate)
        + u16(block_align) + u16(abits)
    )
    data_chunk = b"data" + u32(len(payload)) + payload
    if len(payload) & 1:
        data_chunk += b"\x00"
    riff_body = b"WAVE" + fmt_chunk + data_chunk
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
