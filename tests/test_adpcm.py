"""IMA-ADPCM WAV codec (functions/adpcm.py) — the compressed-audio half
of the multimodal column family (VERDICT r4 #6).

Contract under test: the vectorized (block-stacked) NumPy decoder is
BIT-EXACT against an independent scalar implementation of the published
IMA algorithm; block-boundary samples survive the lossy codec verbatim
(they live in block headers); smooth signals round-trip within a small
bounded error; and the Spark-side batched stats operator agrees with the
per-payload decode.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dawnsearch_spark.functions.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    decode_ima_adpcm,
    encode_ima_adpcm,
    samples_per_block,
)


def _scalar_decode_block(block: bytes) -> list[int]:
    """Straight-line transcription of the published IMA ADPCM decoder —
    the independent reference for the vectorized kernel."""
    pred = int.from_bytes(block[:2], "little", signed=True)
    idx = min(max(block[2], 0), 88)
    out = [pred]
    codes: list[int] = []
    for b in block[4:]:
        codes.append(b & 0xF)
        codes.append(b >> 4)
    for code in codes:
        step = int(STEP_TABLE[idx])
        vp = step >> 3
        if code & 4:
            vp += step
        if code & 2:
            vp += step >> 1
        if code & 1:
            vp += step >> 2
        pred = pred - vp if (code & 8) else pred + vp
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(INDEX_TABLE[code & 7])))
        out.append(pred)
    return out


def _scalar_decode_wav(payload: bytes, n: int, block_align: int = 256) -> np.ndarray:
    off = payload.index(b"data") + 8
    out: list[int] = []
    nb = (len(payload) - off) // block_align
    for k in range(nb):
        out.extend(
            _scalar_decode_block(payload[off + k * block_align : off + (k + 1) * block_align])
        )
    return np.array(out[:n], np.int64)


def _triangle(n: int, k: int, phase: int = 0) -> np.ndarray:
    j = np.arange(n, dtype=np.int64)
    return (8 * (np.abs((j * k + phase) % 4096 - 2048) - 1024)).astype(np.int16)


def test_vectorized_decode_matches_scalar_reference():
    for sig in (
        _triangle(2000, 5),
        np.random.default_rng(7).integers(-32768, 32767, 1777).astype(np.int16),
        (3000 * np.sin(np.arange(1500) * 0.05)).astype(np.int16),
        np.zeros(505, np.int16),
        np.array([100], np.int16),
        np.array([-32768, 32767, -32768, 32767], np.int16),
    ):
        wav = encode_ima_adpcm(sig, 16000, block_align=256)
        dec, rate = decode_ima_adpcm(wav)
        assert rate == 16000
        assert dec.shape == (len(sig), 1)
        ref = _scalar_decode_wav(wav, len(sig))
        assert np.array_equal(ref, dec.reshape(-1).astype(np.int64))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=1200),
    st.sampled_from([32, 128, 256]),
)
def test_decode_identity_property(vals, block_align):
    """For ANY signal and block size, the vectorized decode of the
    encoder's output equals the scalar reference decode bit-for-bit
    (the lossy part is the ENCODE quantization; decode is exact)."""
    sig = np.array(vals, np.int16)
    wav = encode_ima_adpcm(sig, 8000, block_align=block_align)
    dec, rate = decode_ima_adpcm(wav)
    assert rate == 8000 and len(dec) == len(sig)
    ref = _scalar_decode_wav(wav, len(sig), block_align)
    assert np.array_equal(ref, dec.reshape(-1).astype(np.int64))


def test_block_boundary_samples_exact_and_bounded_error():
    """Every block's first sample is stored verbatim in its header; the
    in-between samples of a smooth signal stay within a small bound
    (the gate's tolerance is 64 — assert half of it here as margin)."""
    spb = samples_per_block(256)
    for did in range(0, 50, 7):
        sig = _triangle(1500 + did % 101, did % 7 + 3, phase=did)
        dec = decode_ima_adpcm(encode_ima_adpcm(sig, 16000, 256))[0].reshape(-1)
        for b in range(len(sig) // spb + 1):
            j = b * spb
            if j < len(sig):
                assert int(dec[j]) == int(sig[j]), f"block {b} header sample"
        err = int(np.abs(dec.astype(np.int64) - sig.astype(np.int64)).max())
        assert err <= 32, err


def test_compression_ratio():
    """4-bit ADPCM ≈ 4:1 vs 16-bit PCM (modulo per-block headers)."""
    sig = _triangle(10_000, 5)
    wav = encode_ima_adpcm(sig, 16000, 256)
    assert len(wav) < len(sig) * 2 / 3.5


def test_decode_wav_dispatches_adpcm_and_pcm(spark):
    from dawnsearch_spark.operators.multimodal import decode_wav, encode_wav

    sig = _triangle(800, 4)
    pcm, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000 and np.array_equal(pcm.reshape(-1), sig)
    adp, rate = decode_wav(encode_ima_adpcm(sig, 16000))
    assert rate == 16000 and len(adp) == len(sig)
    assert int(adp.reshape(-1)[0]) == int(sig[0])
    with pytest.raises(NotImplementedError, match="fmt=85"):
        # mp3-in-WAV (format 0x55) stays honestly stubbed
        bad = bytearray(encode_wav(sig[:4], 8000))
        bad[20:22] = (0x55).to_bytes(2, "little")
        decode_wav(bytes(bad))


def test_decode_audio_stats_batched_matches_per_payload(spark):
    """The Spark operator stacks ALL payloads' blocks into one decode per
    Arrow batch; its stats must equal the per-payload decode exactly,
    for a mix of ADPCM and plain PCM clips."""
    from dawnsearch_spark.operators.multimodal import (
        decode_audio_stats,
        encode_wav,
        synthesize_audio_media,
    )

    ids = spark.range(12).withColumnRenamed("id", "doc_id")
    media = synthesize_audio_media(ids)
    rows = {r["doc_id"]: r for r in decode_audio_stats(media).collect()}
    assert len(rows) == 12
    for did in range(12):
        sig = _triangle(1500 + did % 101, did % 7 + 3, phase=did)
        dec = decode_ima_adpcm(
            encode_ima_adpcm(sig, 16000, 256)
        )[0].reshape(-1)
        r = rows[did]
        assert r["n_samples"] == len(sig)
        assert r["sample_rate"] == 16000
        assert r["first_sample"] == int(dec[0]) == int(sig[0])
        assert r["last_sample"] == int(dec[-1])
        assert abs(r["mean_abs"] - float(np.abs(dec.astype(np.int64)).mean())) < 1e-9

    # PCM clips flow through the same operator
    pcm_media = spark.createDataFrame(
        [(100, bytearray(encode_wav(_triangle(300, 3), 8000)), "audio/wav")],
        "doc_id long, media binary, media_type string",
    )
    r = decode_audio_stats(pcm_media).collect()[0]
    assert r["n_samples"] == 300 and r["sample_rate"] == 8000
    assert r["first_sample"] == int(_triangle(300, 3)[0])


def test_decode_audio_stats_rejects_multichannel_pcm(spark):
    """Uniform mono contract: every decode_audio_stats branch reports
    per-clip scalar stats over MONO samples. A stereo PCM payload would
    otherwise report frames*channels as n_samples with interleaved
    first/last — it must raise, pointing at decode_wav for frames."""
    from dawnsearch_spark.operators.multimodal import decode_audio_stats, encode_wav

    stereo = np.stack([_triangle(64, 3), _triangle(64, 5)], axis=1)
    media = spark.createDataFrame(
        [(0, bytearray(encode_wav(stereo, 8000)), "audio/wav")],
        "doc_id long, media binary, media_type string",
    )
    with pytest.raises(Exception, match="mono"):
        decode_audio_stats(media).collect()
