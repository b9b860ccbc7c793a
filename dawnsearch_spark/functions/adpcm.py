"""IMA ADPCM audio codec (WAV wFormatTag 0x11) from first principles.

"Multimodal columns" for a training-data pipeline include audio; 16-bit
PCM WAV already decodes with a header parse (operators/multimodal.py),
and this module adds the first real COMPRESSED audio codec: IMA/DVI4
ADPCM — 4 bits per sample, the classic public-spec telephony/game codec
(IMA Digital Audio Focus Group algorithm; carried in WAV as format 0x11
and in RTP as DVI4). Pure NumPy, no codec library.

Reference analog: the reference's byte-shrinking quantization codecs —
f32->i24/i16 with sign handling (/root/reference/src/search/vector.rs:30-87)
— ADPCM is the audio-native member of the same family (4-bit adaptive
delta quantization instead of fixed-width requantization).

Vectorization shape: the sample recursion (predictor += vpdiff; step
index adapts per nibble) is inherently serial in the sample axis, but WAV
ADPCM is BLOCK-structured — every block restarts from a 4-byte header
(initial predictor = the block's first sample verbatim + initial step
index), so blocks decode independently. The kernels below therefore loop
over samples-within-block and vectorize across BLOCKS — and callers may
stack the blocks of MANY payloads into one matrix (multimodal
decode_audio_stats does), so the per-sample loop runs once per Arrow
batch, not once per file. The same idiom as the PNG Average/Paeth
unfilter (serial in x, stacked over images).

Layout implemented (the standard Microsoft WAV mapping, mono):
  * fmt chunk: wFormatTag=0x11, bits=4, cbSize=2 + wSamplesPerBlock;
  * fact chunk: exact total sample count (data pads to whole blocks);
  * each data block: <predictor int16 LE> <step index u8> <reserved u8>,
    then (block_align - 4) bytes of nibbles, LOW nibble first — the
    header predictor IS sample 0 of the block (stored exactly), nibbles
    encode samples 1 .. (block_align-4)*2.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "STEP_TABLE",
    "INDEX_TABLE",
    "encode_ima_adpcm",
    "decode_ima_adpcm",
    "decode_adpcm_blocks",
    "samples_per_block",
]

# the published 89-entry step-size table (IMA ADPCM reference algorithm)
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    np.int32,
)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def samples_per_block(block_align: int) -> int:
    """Samples one mono block carries: the header sample + 2 per nibble
    byte."""
    return (block_align - 4) * 2 + 1


def _advance(predictor: np.ndarray, index: np.ndarray, code: np.ndarray):
    """One shared state-update step (identical in encoder and decoder —
    the encoder MUST track the decoder's reconstruction, not the true
    signal, or errors accumulate). All int32, vectorized over blocks."""
    step = STEP_TABLE[index]
    vpdiff = step >> 3
    vpdiff += np.where(code & 4, step, 0)
    vpdiff += np.where(code & 2, step >> 1, 0)
    vpdiff += np.where(code & 1, step >> 2, 0)
    predictor = predictor + np.where(code & 8, -vpdiff, vpdiff)
    np.clip(predictor, -32768, 32767, out=predictor)
    index = np.clip(index + INDEX_TABLE[code & 7], 0, 88)
    return predictor, index


def _encode_blocks(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(nblocks, spb) int32 samples -> (headers (nblocks, 4) u8,
    nibbles (nblocks, spb-1) u8). Initial step index per block is seeded
    from the first delta (searchsorted into the step table) so adaptation
    is instant — the index is stored in the block header, so any seed is
    spec-valid; a good one just shrinks early-block error."""
    nblocks, spb = mat.shape
    predictor = mat[:, 0].astype(np.int32)
    first_diff = np.abs(mat[:, 1] - mat[:, 0]) if spb > 1 else np.zeros(nblocks, np.int64)
    index = np.minimum(
        np.searchsorted(STEP_TABLE, first_diff.astype(np.int32)), 88
    ).astype(np.int32)
    headers = np.empty((nblocks, 4), np.uint8)
    headers[:, 0] = predictor & 0xFF
    headers[:, 1] = (predictor >> 8) & 0xFF
    headers[:, 2] = index
    headers[:, 3] = 0
    nibbles = np.empty((nblocks, max(spb - 1, 0)), np.uint8)
    for j in range(1, spb):
        step = STEP_TABLE[index]
        diff = mat[:, j].astype(np.int32) - predictor
        sign = diff < 0
        adiff = np.abs(diff)
        code = np.zeros(nblocks, np.int32)
        ge = adiff >= step
        code |= ge << 2
        adiff -= np.where(ge, step, 0)
        half = step >> 1
        ge = adiff >= half
        code |= ge << 1
        adiff -= np.where(ge, half, 0)
        code |= adiff >= (step >> 2)
        code |= sign << 3
        nibbles[:, j - 1] = code
        predictor, index = _advance(predictor, index, code)
    return headers, nibbles


def decode_adpcm_blocks(blocks: np.ndarray) -> np.ndarray:
    """(nblocks, block_align) u8 raw blocks -> (nblocks, spb) int16.

    The batch kernel: callers stack blocks from many payloads and the
    per-sample loop runs ONCE for the whole stack."""
    nblocks, block_align = blocks.shape
    spb = samples_per_block(block_align)
    predictor = (
        blocks[:, 0].astype(np.int32) | (blocks[:, 1].astype(np.int32) << 8)
    )
    predictor = np.where(predictor >= 0x8000, predictor - 0x10000, predictor)
    index = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    data = blocks[:, 4:]
    codes = np.empty((nblocks, (block_align - 4) * 2), np.int32)
    codes[:, 0::2] = data & 0x0F  # low nibble first (spec order)
    codes[:, 1::2] = data >> 4
    out = np.empty((nblocks, spb), np.int16)
    out[:, 0] = predictor.astype(np.int16)
    for j in range(1, spb):
        predictor, index = _advance(predictor, index, codes[:, j - 1])
        out[:, j] = predictor.astype(np.int16)
    return out


def encode_ima_adpcm(
    samples: np.ndarray, sample_rate: int = 16000, block_align: int = 256
) -> bytes:
    """int16 PCM (n,) mono -> RIFF/WAVE IMA-ADPCM (format 0x11) bytes.
    The tail block pads with the last sample; the fact chunk records the
    exact count so decode truncates back to ``n``."""
    samples = np.asarray(samples, np.int16).reshape(-1)
    n = len(samples)
    spb = samples_per_block(block_align)
    nblocks = max(1, (n + spb - 1) // spb)
    mat = np.full((nblocks, spb), samples[-1] if n else 0, np.int32)
    mat.reshape(-1)[:n] = samples
    headers, nibbles = _encode_blocks(mat)
    packed = np.empty((nblocks, block_align), np.uint8)
    packed[:, :4] = headers
    packed[:, 4:] = nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)
    body = packed.tobytes()
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + len(fmt)) + (8 + 4) + (8 + len(body)))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n)
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_ima_adpcm(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE IMA-ADPCM (format 0x11, mono) -> (int16 (n, 1), rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    n_fact = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        off = pos + 8
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[off : off + 16])
        elif tag == b"fact":
            (n_fact,) = struct.unpack("<I", payload[off : off + 4])
        elif tag == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            audio_fmt, ch, rate, _br, block_align, bits = fmt
            if audio_fmt != 0x11 or bits != 4:
                raise NotImplementedError(
                    f"decode_ima_adpcm handles format 0x11/4-bit only "
                    f"(fmt={audio_fmt}, bits={bits})"
                )
            if ch != 1:
                raise NotImplementedError("IMA-ADPCM decode: mono only")
            nblocks = length // block_align
            blocks = np.frombuffer(
                payload, np.uint8, count=nblocks * block_align, offset=off
            ).reshape(nblocks, block_align)
            out = decode_adpcm_blocks(blocks).reshape(-1)
            if n_fact is not None:
                out = out[:n_fact]
            return out.reshape(-1, 1), rate
        pos = off + length + (length & 1)
    raise ValueError("WAV missing data chunk")
