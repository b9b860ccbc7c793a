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
  varbyte streams (docs/tfs/dls) and the STATS-FREE impact bound inputs
  (max tf, min dl), enabling block-max WAND to skip whole blocks without
  decoding them (reference analog: the shipped ``distance_limit``
  pre-filter, src/net/udp_service.rs:196-200, and the abandoned "early
  termination" distance kernel, src/search/vector.rs:136-147).

  The directory deliberately stores stats-free bound inputs instead of a
  prebaked BM25 block max: BM25 is monotone increasing in tf and
  decreasing in dl, so for ANY (idf, avgdl) holding at query time the
  block maximum is attained on the PARETO FRONT of the block's (tf, dl)
  pairs (max tf, min dl direction). Per block we store that front
  (typically 1-5 points — tf values in code corpora are tiny ints):
  ``max_j bm25(front_tf_j, front_dl_j, idf_now, avgdl_now)`` is then the
  EXACT block maximum under whatever corpus stats hold at query time —
  full round-3 pruning power with zero staleness. This makes segment
  rows immutable under appends: N, avgdl and df all drift as the corpus
  grows, and a stored score bound would go stale (an under-estimating
  bound silently breaks WAND's exactness). Scalar (max_tf, min_dl) per
  row feed the metadata-level planning bound.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "varbyte_encode",
    "varbyte_encode_with_sizes",
    "varbyte_decode",
    "encode_posting_blocks",
    "decode_block",
    "decode_all_postings",
]


def varbyte_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Little-endian 7-bit varbyte; high bit = continuation.

    Returns (blob, per-value byte counts). The sizes let callers batch one
    encode over a whole partition/posting-list and then slice per-group /
    per-block blobs by byte offset — NumPy's fixed per-call overhead
    (~80us) would otherwise dominate on the millions of tiny groups a
    code corpus produces (singleton identifier terms)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, np.int64)
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
    return out.tobytes(), nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    return varbyte_encode_with_sizes(values)[0]


def varbyte_decode(buf: bytes | memoryview, n: int) -> np.ndarray:
    """Decode exactly ``n`` varbyte values from ``buf`` (uint64 array).

    ``buf`` must hold exactly the ``n`` encoded values (every caller
    slices exact streams via the block directory). That precondition
    makes the dominant case O(1)-detectable: ``len(buf) == n`` iff every
    value fits 7 bits — then the byte buffer IS the value array (tf
    streams and within-block docID gaps are almost always single-byte,
    and the serving path calls this per block, so the branch removes the
    flatnonzero/loop overhead from the hot path entirely)."""
    if n == 0:
        return np.zeros(0, np.uint64)
    b = np.frombuffer(buf, np.uint8)
    if len(b) == n:  # all single-byte values: the buffer is the answer
        return b.astype(np.uint64)
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


def encode_posting_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
) -> dict:
    """Pack one (strictly docID-ascending) posting list into blocked varbyte.

    Returns dict with binary streams + directory arrays. The directory
    carries the stats-free per-block Pareto front of (tf, dl) — the BM25
    block maximum is derived EXACTLY at query time from the CURRENT
    corpus stats (see module docstring). Fully vectorized: one varbyte
    encode per stream; per-block byte offsets from the per-value size
    cumsum; the fronts via one padded (nblocks x block_size) matrix pass
    (sort by dl, running cummax of tf) — no per-block Python loop.
    """
    n = len(doc_ids)
    assert n > 0
    assert bool(np.all(np.diff(doc_ids.astype(np.int64)) > 0)), "doc_ids must be strictly ascending"
    nblocks = (n + block_size - 1) // block_size
    block_starts = np.arange(nblocks) * block_size
    block_ends = np.minimum(block_starts + block_size, n)

    # Gaps: first doc of each block is a gap from the previous block's last
    # doc (block 0 stores the absolute docID), so any block decodes given
    # only the directory.
    docs_i = np.ascontiguousarray(doc_ids, np.int64)
    gaps = np.empty(n, np.uint64)
    gaps[0] = docs_i[0]
    gaps[1:] = (docs_i[1:] - docs_i[:-1]).astype(np.uint64)

    doc_blob, nb_d = varbyte_encode_with_sizes(gaps)
    tf_blob, nb_t = varbyte_encode_with_sizes(np.ascontiguousarray(tfs, np.uint64))
    dl_blob, nb_l = varbyte_encode_with_sizes(np.ascontiguousarray(dls, np.uint64))

    def offs(nb: np.ndarray) -> np.ndarray:
        c = np.zeros(n + 1, np.int64)
        np.cumsum(nb, out=c[1:])
        return c[np.append(block_starts, n)]

    tfs_i = np.ascontiguousarray(tfs, np.int64)
    dls_i = np.ascontiguousarray(dls, np.int64)
    front_tf, front_dl, front_off = _block_pareto_fronts(
        tfs_i, dls_i, nblocks, block_size
    )
    return {
        "n_docs": n,
        "doc_blob": doc_blob,
        "tf_blob": tf_blob,
        "dl_blob": dl_blob,
        "block_last": docs_i[block_ends - 1],
        "block_doc_off": offs(nb_d),
        "block_tf_off": offs(nb_t),
        "block_dl_off": offs(nb_l),
        "front_tf": front_tf,
        "front_dl": front_dl,
        "front_off": front_off,
        "max_tf": int(tfs_i.max()),
        "min_dl": int(dls_i.min()),
    }


def _block_pareto_fronts(
    tfs: np.ndarray, dls: np.ndarray, nblocks: int, block_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-block Pareto fronts of (tf max-direction, dl min-direction).

    Matrix formulation (no per-block loop): pad to (nblocks, block_size)
    with dominated sentinels (tf=0, dl=+inf), argsort each row by
    (dl asc, tf desc), then a point is on the front iff its tf strictly
    exceeds the running max of all points with smaller-or-equal dl before
    it. Returns (front_tf, front_dl, front_off) with front_off of length
    nblocks + 1 (offsets into the flattened fronts); every nonempty block
    contributes >= 1 point."""
    n = len(tfs)
    pad = nblocks * block_size
    tf_m = np.zeros(pad, np.int64)
    dl_m = np.full(pad, np.iinfo(np.int64).max)
    tf_m[:n] = tfs
    dl_m[:n] = dls
    tf_m = tf_m.reshape(nblocks, block_size)
    dl_m = dl_m.reshape(nblocks, block_size)
    # sort each block by dl asc, tf desc (tf desc so equal-dl duplicates
    # keep only the largest tf on the front)
    order = np.lexsort((-tf_m, dl_m), axis=1)
    rows = np.arange(nblocks)[:, None]
    tf_s = tf_m[rows, order]
    dl_s = dl_m[rows, order]
    run = np.maximum.accumulate(tf_s, axis=1)
    keep = np.ones_like(tf_s, bool)
    keep[:, 1:] = tf_s[:, 1:] > run[:, :-1]
    keep &= tf_s > 0  # drop padding sentinels
    counts = keep.sum(axis=1)
    front_off = np.zeros(nblocks + 1, np.int64)
    np.cumsum(counts, out=front_off[1:])
    flat = keep.ravel()
    return tf_s.ravel()[flat], dl_s.ravel()[flat], front_off


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
