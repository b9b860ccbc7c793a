"""G.711 μ-law / A-law codec (functions/g711.py).

Contract: the vectorized NumPy kernels are BIT-EXACT against a scalar
transcription of the canonical public-domain reference (Sun g711.c) over
the ENTIRE 16-bit input space and all 256 code points, the classic
code-space round-trip holds (encode(decode(b)) == b, μ-law's negative
zero 0x7F being the one known exception), and the WAV formats 6/7
dispatch through the shared decode path.
"""

from __future__ import annotations

import numpy as np
import pytest

from dawnsearch_spark.functions.g711 import (
    alaw_decode,
    alaw_encode,
    decode_g711_wav,
    encode_g711_wav,
    ulaw_decode,
    ulaw_encode,
)

_SEG_UEND = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]
_SEG_AEND = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]


def _search(v, tbl):
    for i, b in enumerate(tbl):
        if v <= b:
            return i
    return len(tbl)


def _ref_ulaw_enc(p: int) -> int:
    sign = 0x80 if p < 0 else 0
    p = min(abs(p), 32635) + 0x84
    seg = _search(p, _SEG_UEND)
    return (~(sign | (seg << 4) | ((p >> (seg + 3)) & 0xF))) & 0xFF


def _ref_ulaw_dec(b: int) -> int:
    b = ~b & 0xFF
    t = (((b & 0xF) << 3) + 0x84) << ((b & 0x70) >> 4)
    return (0x84 - t) if (b & 0x80) else (t - 0x84)


def _ref_alaw_enc(p: int) -> int:
    if p >= 0:
        mask = 0xD5
    else:
        mask, p = 0x55, -p - 1
    p >>= 3
    seg = _search(p, _SEG_AEND)
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (p >> 1) & 0xF if seg < 2 else (p >> seg) & 0xF
    return aval ^ mask


def _ref_alaw_dec(a: int) -> int:
    a ^= 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_encoders_bit_exact_over_full_input_space():
    pcm = np.arange(-32768, 32768, dtype=np.int16)
    assert np.array_equal(
        ulaw_encode(pcm), np.array([_ref_ulaw_enc(int(x)) for x in pcm], np.uint8)
    )
    assert np.array_equal(
        alaw_encode(pcm), np.array([_ref_alaw_enc(int(x)) for x in pcm], np.uint8)
    )


def test_decoders_bit_exact_over_all_codes():
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        ulaw_decode(codes), np.array([_ref_ulaw_dec(int(c)) for c in codes], np.int16)
    )
    assert np.array_equal(
        alaw_decode(codes), np.array([_ref_alaw_dec(int(c)) for c in codes], np.int16)
    )


def test_code_space_roundtrip():
    codes = np.arange(256, dtype=np.uint8)
    rt_u = ulaw_encode(ulaw_decode(codes))
    # 0x7F is μ-law "negative zero": decodes to 0, re-encodes positive
    assert [int(c) for c in codes if rt_u[c] != c] == [0x7F]
    rt_a = alaw_encode(alaw_decode(codes))
    assert [int(c) for c in codes if rt_a[c] != c] == []


def test_wav_roundtrip_and_dispatch(spark):
    from dawnsearch_spark.operators.multimodal import decode_audio_stats, decode_wav

    sig = (3000 * np.sin(np.arange(1000) * 0.01)).astype(np.int16)
    for law, tag in (("ulaw", 7), ("alaw", 6)):
        wav = encode_g711_wav(sig, 8000, law)
        dec, rate = decode_g711_wav(wav)
        assert rate == 8000 and dec.shape == (1000, 1)
        # quantization error bounded by the largest segment step / 2
        assert int(np.abs(dec.reshape(-1).astype(np.int32) - sig).max()) <= 128
        # the shared decode_wav dispatcher routes format 6/7 here
        via_dispatch, rate2 = decode_wav(wav)
        assert rate2 == 8000 and np.array_equal(via_dispatch, dec)
    with pytest.raises(ValueError, match="law"):
        encode_g711_wav(sig, 8000, "mp3")

    # the batched Spark stats operator handles G.711 clips
    media = spark.createDataFrame(
        [(1, bytearray(encode_g711_wav(sig, 8000, "ulaw")), "audio/wav")],
        "doc_id long, media binary, media_type string",
    )
    r = decode_audio_stats(media).collect()[0]
    assert r["n_samples"] == 1000 and r["sample_rate"] == 8000
    assert r["first_sample"] == int(ulaw_decode(ulaw_encode(sig[:1]))[0])
