"""Delta+varbyte codec: round-trip properties and block-directory
invariants (SURVEY.md §5: property-style random docID sets; the stats-free
block bounds (max_tf, min_dl) must dominate every member posting so the
query-time BM25 bound is a true upper bound under any corpus stats)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dawnsearch_spark.functions.codec import (
    decode_all_postings,
    decode_block,
    encode_posting_blocks,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=60, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr), len(arr)).tolist() == values


def test_varbyte_known():
    assert varbyte_encode(np.array([0], np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], np.uint64)) == b"\xac\x02"


@given(
    st.sets(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=40, deadline=None)
def test_posting_blocks_roundtrip(doc_set, block_size):
    docs = np.array(sorted(doc_set), np.int64)
    n = len(docs)
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 50, n).astype(np.int64)
    dls = rng.integers(1, 3000, n).astype(np.int64)
    row = encode_posting_blocks(docs, tfs, dls, block_size)
    d2, t2, l2 = decode_all_postings(row, block_size)
    assert d2.tolist() == docs.tolist()
    assert t2.tolist() == tfs.tolist()
    assert l2.tolist() == dls.tolist()
    # per-block decode agrees + directory invariants
    nblocks = len(row["block_last"])
    for b in range(nblocks):
        bd, bt, bl = decode_block(row, b, block_size)
        s, e = b * block_size, min((b + 1) * block_size, n)
        assert bd.tolist() == docs[s:e].tolist()
        assert bt.tolist() == tfs[s:e].tolist()
        assert bl.tolist() == dls[s:e].tolist()
        assert row["block_last"][b] == docs[e - 1]
        # the Pareto-front-derived bound is the EXACT block max under ANY
        # corpus stats (monotone ↑tf ↓dl ⇒ the argmax lies on the front)
        from dawnsearch_spark.functions.bm25 import bm25_np

        fs_, fe = row["front_off"][b], row["front_off"][b + 1]
        assert fe > fs_, "every block contributes >= 1 front point"
        for avgdl, idf in ((10.0, 1.3), (900.0, 0.02), (100.0, 0.5)):
            ub = bm25_np(
                row["front_tf"][fs_:fe], row["front_dl"][fs_:fe],
                idf, avgdl, 1.2, 0.75,
            ).max()
            member = bm25_np(tfs[s:e], dls[s:e], idf, avgdl, 1.2, 0.75)
            assert ub == pytest.approx(member.max(), rel=1e-12)
    assert row["max_tf"] == tfs.max() and row["min_dl"] == dls.min()


def test_rejects_unsorted():
    with pytest.raises(AssertionError):
        encode_posting_blocks(
            np.array([3, 1], np.int64),
            np.ones(2, np.int64),
            np.ones(2, np.int64),
            8,
        )
