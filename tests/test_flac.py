"""FLAC fixed-predictor subset codec (functions/flac.py): bit-exact
lossless round-trips, a scalar-transcription cross-check of the
vectorized Rice decoder, CRC/MD5 tamper detection, and honest refusals
for out-of-subset features."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from dawnsearch_spark.functions.flac import (
    _BitReader,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def _signals():
    rng = np.random.default_rng(7)
    j = np.arange(5000, dtype=np.int64)
    yield "triangle", (8 * (np.abs((j * 5 + 11) % 4096 - 2048) - 1024)).astype(np.int16)
    yield "noise", rng.integers(-32768, 32768, 3000).astype(np.int16)
    yield "constant", np.full(2048, -123, np.int16)
    yield "ramp", (np.arange(4100, dtype=np.int64) % 700 - 350).astype(np.int16)
    yield "quiet+extremes", np.concatenate(
        [np.zeros(100, np.int16), np.array([32767, -32768], np.int16),
         (rng.integers(-50, 50, 900)).astype(np.int16)]
    )
    yield "empty", np.zeros(0, np.int16)
    yield "tiny", np.array([5, -3, 7], np.int16)


@pytest.mark.parametrize("block_size", [256, 1024, 4096, 100])
def test_roundtrip_bit_exact(block_size):
    for name, sig in _signals():
        blob = encode_flac(sig, 22050, block_size=block_size)
        dec, rate = decode_flac(blob)
        assert rate == 22050
        assert dec.shape == (len(sig), 1), (name, block_size)
        assert np.array_equal(dec.reshape(-1), sig), (name, block_size)


def test_rice_partition_matches_scalar_transcription():
    """The orbit-walking vectorized Rice decoder against a literal
    scalar transcription of the spec (read unary quotient bit by bit,
    then k remainder bits) over the same bit positions."""
    sig = (np.arange(3000, dtype=np.int64) * 37 % 1999 - 999).astype(np.int16)
    blob = encode_flac(sig, 8000, block_size=512)

    class ScalarReader(_BitReader):
        def read_rice_partition(self, k, n):
            out = np.empty(n, np.int64)
            for t in range(n):
                q = 0
                while self.bits[self.pos] == 0:
                    q += 1
                    self.pos += 1
                self.pos += 1  # stop bit
                r = 0
                for _ in range(k):
                    r = (r << 1) | int(self.bits[self.pos])
                    self.pos += 1
                u = (q << k) | r
                out[t] = (u >> 1) ^ -(u & 1)
            return out

    import dawnsearch_spark.functions.flac as flac_mod

    orig = flac_mod._BitReader
    vec, _ = decode_flac(blob)
    try:
        flac_mod._BitReader = ScalarReader
        # decode_flac constructs _BitReader by name at module level — the
        # swap makes every partition decode take the scalar path
        scalar, _ = decode_flac(blob)
    finally:
        flac_mod._BitReader = orig
    assert np.array_equal(vec, scalar)


def test_crc_and_md5_detect_corruption():
    sig = (np.arange(2000, dtype=np.int64) % 301 - 150).astype(np.int16)
    blob = bytearray(encode_flac(sig, 16000, block_size=1024))
    # flip one bit in the last frame's residual area
    blob[-40] ^= 0x10
    with pytest.raises(ValueError, match="CRC|MD5|truncated|sync"):
        decode_flac(bytes(blob))
    # truncation is caught, not silently accepted
    with pytest.raises(ValueError):
        decode_flac(bytes(encode_flac(sig, 16000))[:-25])


def test_streaminfo_md5_is_real():
    sig = np.array([1, 2, 3, 4, 5], np.int16)
    blob = encode_flac(sig, 16000)
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the stream
    md5 = blob[4 + 4 + 18 : 4 + 4 + 34]
    assert md5 == hashlib.md5(sig.astype("<i2").tobytes()).digest()


def test_out_of_subset_features_refuse_honestly():
    sig = np.array([0, 1, 2, 3], np.int16)
    blob = bytearray(encode_flac(sig, 16000))
    # claim 2 channels in STREAMINFO (byte 8+12 carries rate|ch|bps bits)
    b = blob[4 + 4 + 12]
    blob[4 + 4 + 12] = (b & ~0x0E) | (1 << 1)
    with pytest.raises(NotImplementedError, match="mono"):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxx")


def test_crc_primitives_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 (init 0) public test vectors
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


def test_utf8_frame_numbers_roundtrip_many_frames():
    # >128 frames exercises multi-byte coded frame numbers
    sig = (np.arange(192 * 130, dtype=np.int64) % 97 - 48).astype(np.int16)
    blob = encode_flac(sig, 44100, block_size=192)
    dec, rate = decode_flac(blob)
    assert rate == 44100 and np.array_equal(dec.reshape(-1), sig)
