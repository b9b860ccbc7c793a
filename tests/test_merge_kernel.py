"""Differential test: the batched merge/encode kernel
(merge_rows_columnar + segment_columns_to_rows) must emit EXACTLY the
rows the original per-key path produced (_decode_runs_merged +
_make_segment_row), including the reclassify split of light runs of
heavy terms and the tombstone mask — across randomized fixtures with
multi-byte varbyte values, multi-run keys and range-crossing lists."""

from __future__ import annotations

import numpy as np
import pytest

from dawnsearch_spark.config import EngineConfig
from dawnsearch_spark.functions.codec import varbyte_encode
from dawnsearch_spark.operators.merge import (
    _decode_runs_merged,
    _make_segment_row,
    _tombstone_mask,
    merge_rows_columnar,
    segment_columns_to_rows,
)

CFG = EngineConfig(range_size=64, block_size=8, num_term_buckets=8)


def _encode_run(docs, tfs, dls):
    gaps = np.empty(len(docs), np.uint64)
    gaps[0] = docs[0]
    gaps[1:] = np.diff(docs).astype(np.uint64)
    return (
        varbyte_encode(gaps),
        varbyte_encode(tfs.astype(np.uint64)),
        varbyte_encode(dls.astype(np.uint64)),
    )


def _random_fixture(rng, n_terms=12, max_runs=4, doc_space=500):
    """Run rows whose (term, salt) keys hold disjoint doc sets per run."""
    rows = []
    for ti in range(n_terms):
        term = f"t{rng.integers(0, 1000)}_{ti}"
        salted = rng.random() < 0.4
        pool = np.sort(
            rng.choice(doc_space, size=rng.integers(2, 60), replace=False)
        ).astype(np.int64)
        if salted:
            # one run per (range, run-index) slice with the salt set
            ranges = pool // CFG.range_size
            for r in np.unique(ranges):
                sel = pool[ranges == r]
                parts = np.array_split(sel, rng.integers(1, max_runs + 1))
                for p in parts:
                    if not len(p):
                        continue
                    tfs = rng.integers(1, 300, len(p)).astype(np.int64)
                    dls = rng.integers(1, 5000, len(p)).astype(np.int64)
                    rows.append((term, int(r), p, tfs, dls))
        else:
            parts = np.array_split(pool, rng.integers(1, max_runs + 1))
            for p in parts:
                if not len(p):
                    continue
                tfs = rng.integers(1, 300, len(p)).astype(np.int64)
                dls = rng.integers(1, 5000, len(p)).astype(np.int64)
                rows.append((term, -1, p, tfs, dls))
    rng.shuffle(rows)
    return rows


def _expected_rows(rows, split_terms, tomb):
    """Original formulation: reclassify split, per-key merge, per-key pack."""
    groups: dict[tuple, list] = {}
    for term, salt, docs, tfs, dls in rows:
        if salt == -1 and term in split_terms:
            ranges = docs // CFG.range_size
            for r in np.unique(ranges):
                m = ranges == r
                groups.setdefault((term, int(r)), []).append(
                    (docs[m], tfs[m], dls[m])
                )
        else:
            groups.setdefault((term, salt), []).append((docs, tfs, dls))
    out = {}
    for (term, salt), parts in groups.items():
        blobs = [_encode_run(d, t, l) for d, t, l in parts]
        cols = {
            "term": np.asarray([term] * len(parts), dtype=object),
            "n_docs": np.asarray([len(d) for d, _, _ in parts], np.int64),
            "doc_blob": np.asarray([b[0] for b in blobs], dtype=object),
            "tf_blob": np.asarray([b[1] for b in blobs], dtype=object),
            "dl_blob": np.asarray([b[2] for b in blobs], dtype=object),
        }
        docs, tfs, dls = _decode_runs_merged(cols, 0, len(parts))
        if tomb is not None:
            m = _tombstone_mask(docs, tomb)
            docs, tfs, dls = docs[m], tfs[m], dls[m]
            if not len(docs):
                continue
        out[(term, salt)] = _make_segment_row(term, salt, docs, tfs, dls, CFG)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("with_split,with_tomb", [(False, False), (True, False), (True, True)])
def test_kernel_matches_per_key_path(seed, with_split, with_tomb):
    rng = np.random.default_rng(seed)
    rows = _random_fixture(rng)
    terms = np.asarray([r[0] for r in rows], dtype=object)
    all_terms = sorted(set(terms))
    split_terms = set(all_terms[:: 3]) if with_split else set()
    tomb = None
    if with_tomb:
        tomb = np.sort(rng.choice(500, size=60, replace=False)).astype(np.int64)

    blobs = [_encode_run(d, t, l) for _, _, d, t, l in rows]
    cols = merge_rows_columnar(
        terms,
        np.asarray([r[1] for r in rows], np.int64),
        np.asarray([len(r[2]) for r in rows], np.int64),
        [b[0] for b in blobs],
        [b[1] for b in blobs],
        [b[2] for b in blobs],
        CFG,
        split_terms=split_terms,
        tomb=tomb,
    )
    got_rows = segment_columns_to_rows(cols)
    got = {
        (got_rows["term"][i], got_rows["range_id"][i]): {
            c: got_rows[c][i] for c in got_rows
        }
        for i in range(len(got_rows["term"]))
    }
    want = _expected_rows(rows, split_terms, tomb)
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        for c in w:
            wv = w[c]
            gv = g[c]
            if isinstance(wv, (bytes, bytearray)):
                assert bytes(gv) == bytes(wv), (key, c)
            elif isinstance(wv, list):
                assert list(gv) == list(wv), (key, c)
            else:
                assert gv == wv, (key, c, gv, wv)


def test_kernel_empty_input():
    cols = merge_rows_columnar(
        np.asarray([], dtype=object), np.zeros(0, np.int64),
        np.zeros(0, np.int64), [], [], [], CFG,
    )
    rows = segment_columns_to_rows(cols)
    assert rows["term"] == []
