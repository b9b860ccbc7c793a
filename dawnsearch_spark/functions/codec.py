"""Posting-list compression: docID delta + varbyte, block-structured.

Reference analog: the reference shrinks bytes with small-int quantization
codecs — f32->i24 with sign-extend (/root/reference/src/search/vector.rs:50-87),
f32<->i16 (vector.rs:30-46) and smaz text compression
(/root/reference/src/net/udp_service.rs:377-381). Our lexical engine's
equivalent "small-int packing" is classic IR varbyte over docID gaps.

All kernels are NumPy-vectorized (no per-element Python loops over
postings; the loops below iterate over *byte layers*, bounded by 10).

Block layout (one posting list row):
  postings are chunked into blocks of ``block_size``; per block the
  directory stores last docID, byte offsets into each of the three
  varbyte streams (docs/tfs/dls) and the max BM25 impact, enabling
  block-max WAND to skip whole blocks without decoding them
  (reference analog: the shipped ``distance_limit`` pre-filter,
  src/net/udp_service.rs:196-200, and the abandoned "early termination"
  distance kernel, src/search/vector.rs:136-147).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "varbyte_encode",
    "varbyte_decode",
    "encode_posting_blocks",
    "decode_block",
    "decode_all_postings",
]


def varbyte_encode(values: np.ndarray) -> bytes:
    """Little-endian 7-bit varbyte; high bit = continuation."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nbytes = np.ones(n, np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= np.uint64(7)
    out = np.zeros(int(nbytes.sum()), np.uint8)
    idx = np.cumsum(nbytes) - nbytes  # start offset per value
    rem = v.copy()
    active = np.ones(n, bool)
    while active.any():
        byte = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem >>= np.uint64(7)
        more = rem > 0
        out[idx[active]] = byte[active] | (more[active].astype(np.uint8) << 7)
        idx[active] += 1
        active &= more
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview, n: int) -> np.ndarray:
    """Decode exactly ``n`` varbyte values from ``buf`` (uint64 array)."""
    if n == 0:
        return np.zeros(0, np.uint64)
    b = np.frombuffer(buf, np.uint8)
    ends = np.flatnonzero((b & 0x80) == 0)[:n]
    starts = np.empty(n, np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(n, np.uint64)
    pos = starts
    shift = np.uint64(0)
    active = np.ones(n, bool)
    while active.any():
        byte = b[pos[active]]
        vals[active] |= (byte & np.uint8(0x7F)).astype(np.uint64) << shift
        more = (byte & 0x80) > 0
        act_idx = np.flatnonzero(active)
        active[act_idx[~more]] = False
        pos[act_idx[more]] += 1
        shift += np.uint64(7)
    return vals


def _delta_encode_blocked(doc_ids: np.ndarray, block_starts: np.ndarray) -> np.ndarray:
    """Gaps within blocks; the first doc of each block is a gap from the
    previous block's last doc (block 0 stores the absolute docID), so any
    block can be decoded given only the directory."""
    gaps = np.empty(len(doc_ids), np.uint64)
    gaps[0] = doc_ids[0]
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    return gaps


def encode_posting_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    impacts: np.ndarray,
    block_size: int,
) -> dict:
    """Pack one (strictly docID-ascending) posting list into blocked varbyte.

    Returns dict with binary streams + directory arrays. ``impacts`` is the
    per-posting BM25 upper-bound score used for the per-block max.
    """
    n = len(doc_ids)
    assert n > 0
    assert bool(np.all(np.diff(doc_ids.astype(np.int64)) > 0)), "doc_ids must be strictly ascending"
    nblocks = (n + block_size - 1) // block_size
    block_starts = np.arange(nblocks) * block_size
    block_ends = np.minimum(block_starts + block_size, n)

    gaps = _delta_encode_blocked(np.ascontiguousarray(doc_ids, np.uint64), block_starts)

    # Per-block byte offsets: encode per block so offsets are exact.
    doc_parts, tf_parts, dl_parts = [], [], []
    doc_off = np.zeros(nblocks + 1, np.int64)
    tf_off = np.zeros(nblocks + 1, np.int64)
    dl_off = np.zeros(nblocks + 1, np.int64)
    block_last = np.empty(nblocks, np.int64)
    block_max_impact = np.empty(nblocks, np.float64)
    for i in range(nblocks):
        s, e = block_starts[i], block_ends[i]
        doc_parts.append(varbyte_encode(gaps[s:e]))
        tf_parts.append(varbyte_encode(tfs[s:e]))
        dl_parts.append(varbyte_encode(dls[s:e]))
        doc_off[i + 1] = doc_off[i] + len(doc_parts[-1])
        tf_off[i + 1] = tf_off[i] + len(tf_parts[-1])
        dl_off[i + 1] = dl_off[i] + len(dl_parts[-1])
        block_last[i] = int(doc_ids[e - 1])
        block_max_impact[i] = float(impacts[s:e].max())
    return {
        "n_docs": n,
        "doc_blob": b"".join(doc_parts),
        "tf_blob": b"".join(tf_parts),
        "dl_blob": b"".join(dl_parts),
        "block_last": block_last,
        "block_doc_off": doc_off,
        "block_tf_off": tf_off,
        "block_dl_off": dl_off,
        "block_max_impact": block_max_impact,
    }


def _block_count(n_docs: int, block_size: int) -> int:
    return (n_docs + block_size - 1) // block_size


def decode_block(
    row: dict,
    b: int,
    block_size: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode block ``b`` of a packed posting row -> (doc_ids, tfs, dls).

    Only touches the bytes of that block (skip-decode for WAND).
    """
    n = int(row["n_docs"])
    s = b * block_size
    cnt = min(block_size, n - s)
    doc_off = row["block_doc_off"]
    tf_off = row["block_tf_off"]
    dl_off = row["block_dl_off"]
    gaps = varbyte_decode(memoryview(row["doc_blob"])[doc_off[b] : doc_off[b + 1]], cnt)
    docs = np.cumsum(gaps.astype(np.int64))
    if b > 0:
        docs += int(row["block_last"][b - 1])
    tfs = varbyte_decode(memoryview(row["tf_blob"])[tf_off[b] : tf_off[b + 1]], cnt)
    dls = varbyte_decode(memoryview(row["dl_blob"])[dl_off[b] : dl_off[b + 1]], cnt)
    return docs, tfs.astype(np.int64), dls.astype(np.int64)


def decode_all_postings(row: dict, block_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode of a posting row -> (doc_ids, tfs, dls), vectorized."""
    n = int(row["n_docs"])
    gaps = varbyte_decode(row["doc_blob"], n)
    docs = np.cumsum(gaps.astype(np.int64))
    # Block-leading gaps are relative to the previous block's last doc, and
    # cumsum already carries that forward because gap[block_start] was
    # computed as doc - prev_block_last == doc - docs[block_start-1].
    tfs = varbyte_decode(row["tf_blob"], n).astype(np.int64)
    dls = varbyte_decode(row["dl_blob"], n).astype(np.int64)
    return docs, tfs, dls
