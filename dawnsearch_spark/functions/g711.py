"""G.711 μ-law / A-law audio codec (WAV formats 7 and 6), pure NumPy.

The telephony companding codecs (ITU-T G.711): 16-bit PCM -> 8 bits per
sample via logarithmic segment/mantissa quantization. Unlike ADPCM the
quantization is STATELESS and closed-form, so ``decode(encode(s))`` is a
pure integer function of ``s`` that a SQL oracle can recompute exactly —
the driver gate for this codec is hash-exact on every decoded sample
aggregate, not bounded-error. Formulas follow the canonical public-domain
reference implementation (Sun Microsystems g711.c, the de facto
interoperability standard).

Reference analog: the reference's fixed-width requantization codecs
(f32->i16/i24, /root/reference/src/search/vector.rs:30-87); G.711 is the
logarithmic member of the family.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "ulaw_encode",
    "ulaw_decode",
    "alaw_encode",
    "alaw_decode",
    "encode_g711_wav",
    "decode_g711_wav",
]

_BIAS = 0x84  # 132
_CLIP = 32635
# segment upper bounds of the BIASED magnitude (μ-law) / 13-bit magnitude
# (A-law); exponent = index of the first bound >= value
_ULAW_SEG = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], np.int32
)
# A-law segment bounds on the 13-bit magnitude
_ALAW_SEG = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int32
)


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> μ-law bytes (uint8), vectorized."""
    s = np.asarray(samples, np.int32)
    sign = np.where(s < 0, 0x80, 0)
    mag = np.minimum(np.abs(s), _CLIP) + _BIAS
    exponent = np.minimum(np.searchsorted(_ULAW_SEG, mag), 7).astype(np.int32)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """μ-law bytes -> int16 PCM, vectorized. Exact inverse of the
    quantized value: ((mantissa*8 + 132) << exponent) - 132, signed."""
    b = ~np.asarray(codes, np.int32) & 0xFF
    sign = b & 0x80
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    mag = (((mantissa << 3) + _BIAS) << exponent) - _BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> A-law bytes (uint8), vectorized (Sun g711.c shape:
    13-bit magnitude, segment search, 0x55 toggle)."""
    s = np.asarray(samples, np.int32)
    mask = np.where(s >= 0, 0xD5, 0x55)
    pcm = np.where(s >= 0, s, -s - 1) >> 3  # 13-bit magnitude
    seg = np.searchsorted(_ALAW_SEG, pcm).astype(np.int32)
    seg_c = np.minimum(seg, 7)
    # seg 0/1: mantissa is bits 1-4; seg >= 2: bits (seg)..(seg+3)
    mant = (pcm >> np.where(seg_c < 2, 1, seg_c)) & 0x0F
    aval = np.where(seg >= 8, 0x7F, (seg_c << 4) | mant)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 PCM, vectorized."""
    a = (np.asarray(codes, np.int32) ^ 0x55) & 0xFF
    sign = a & 0x80
    seg = (a >> 4) & 0x07
    mantissa = a & 0x0F
    mag = np.where(
        seg == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << (seg - 1),
    )
    return np.where(sign != 0, mag, -mag).astype(np.int16)


def encode_g711_wav(
    samples: np.ndarray, sample_rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """int16 PCM mono -> RIFF/WAVE G.711 bytes (format 7 = μ-law,
    format 6 = A-law; 8 bits/sample — the classic telephony WAV)."""
    samples = np.asarray(samples, np.int16).reshape(-1)
    if law == "ulaw":
        fmt_tag, body = 7, ulaw_encode(samples).tobytes()
    elif law == "alaw":
        fmt_tag, body = 6, alaw_encode(samples).tobytes()
    else:
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    fmt = struct.pack("<HHIIHHH", fmt_tag, 1, sample_rate, sample_rate, 1, 8, 0)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + len(fmt)) + (8 + 4) + (8 + len(body)))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, len(samples))
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_g711_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE G.711 (format 7/6, mono) -> (int16 (n, 1), rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt = 12, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        off = pos + 8
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[off : off + 16])
        elif tag == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            fmt_tag, ch, rate, _br, _ba, bits = fmt
            if fmt_tag not in (6, 7) or bits != 8 or ch != 1:
                raise NotImplementedError(
                    f"decode_g711_wav handles mono 8-bit formats 6/7 only "
                    f"(fmt={fmt_tag}, bits={bits}, ch={ch})"
                )
            codes = np.frombuffer(payload, np.uint8, count=length, offset=off)
            out = ulaw_decode(codes) if fmt_tag == 7 else alaw_decode(codes)
            return out.reshape(-1, 1), rate
        pos = off + length + (length & 1)
    raise ValueError("WAV missing data chunk")
