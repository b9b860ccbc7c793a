"""Product quantization (operators/similarity.py PQ family).

Contract: training is deterministic; codes are m bytes per vector (8x+
compression of the raw floats here, ~30x on 384-d float32 production
vectors); the ADC distance over codes EQUALS the exact L2 distance from
the normalized query to the codebook reconstruction (the approximation
is in the quantization, never in the search math); and the standard
ADC-shortlist -> exact-rerank recipe recovers near-exact recall.
"""

from __future__ import annotations

import numpy as np
import pytest

from dawnsearch_spark.operators.similarity import (
    cosine_topk,
    pq_adc_topk,
    pq_code_rows,
    pq_encode,
    pq_rerank_topk,
    train_pq_codebooks,
)


@pytest.fixture(scope="module")
def emb(spark):
    # clustered data so quantization cells carry structure (pure isotropic
    # gaussian is the PQ worst case and makes recall meaningless)
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((10, 32)) * 2.0
    vecs = centers[rng.integers(0, 10, 400)] + rng.standard_normal((400, 32)) * 0.4
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(400)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache(),
        vecs,
    )


def test_train_deterministic_and_shapes(spark, emb):
    df, _ = emb
    a = train_pq_codebooks(df, m=4, ksub=16)
    b = train_pq_codebooks(df, m=4, ksub=16)
    assert a.shape == (4, 16, 8)
    assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="divide"):
        train_pq_codebooks(df, m=5)


def test_codes_are_m_bytes(spark, emb):
    df, _ = emb
    cb = train_pq_codebooks(df, m=4, ksub=16)
    rows = pq_encode(df, cb).collect()
    assert len(rows) == 400
    assert all(len(bytes(r["code"])) == 4 for r in rows)
    # long form explodes to m rows per vector with codes < ksub
    long = pq_code_rows(pq_encode(df, cb), m=4).collect()
    assert len(long) == 1600
    assert all(0 <= r["code"] < 16 and 0 <= r["j"] < 4 for r in long)


def test_adc_equals_reconstruction_distance(spark, emb):
    """ADC(q, code(x)) must equal ||qn - decode(code(x))||^2 exactly —
    the search math adds no approximation beyond quantization."""
    df, vecs = emb
    cb = train_pq_codebooks(df, m=4, ksub=16)
    q = vecs[7] * 1.7  # unnormalized on purpose
    got = {
        r["vec_id"]: r["adc"]
        for r in pq_adc_topk(pq_encode(df, cb), [float(x) for x in q], cb, k=400).collect()
    }
    qn = q / np.linalg.norm(q)
    m, ksub, dsub = cb.shape
    for vid in (0, 7, 99, 250, 399):
        x = vecs[vid].reshape(m, dsub)
        recon = np.stack(
            [cb[j][((x[j][None, :] - cb[j]) ** 2).sum(axis=1).argmin()] for j in range(m)]
        )
        want = float(((qn.reshape(m, dsub) - recon) ** 2).sum())
        assert abs(got[vid] - round(want, 6)) < 1e-6, vid


def test_rerank_recovers_recall(spark, emb):
    df, vecs = emb
    cb = train_pq_codebooks(df, m=4, ksub=16)
    codes = pq_encode(df, cb)
    hits = 0
    for qid in (3, 77, 123):
        q = [float(x) for x in vecs[qid]]
        exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
        rer = [
            r["vec_id"]
            for r in pq_rerank_topk(df, codes, q, cb, k=10, shortlist=50).collect()
        ]
        hits += len(set(exact) & set(rer))
    # measured 30/30 on this fixture; assert with margin
    assert hits >= 24, f"rerank recall collapsed: {hits}/30"


def test_ivfpq_equals_probe_restricted_adc(spark, emb):
    """The composition adds no new math: ivfpq_topk over (codes+cell)
    must equal pq_adc_topk restricted to the probed cells' vectors."""
    from dawnsearch_spark.operators.similarity import (
        ivf_assign,
        ivf_probe_cells,
        ivfpq_topk,
        train_ivf_centroids,
    )

    df, vecs = emb
    cents = train_ivf_centroids(df, n_cells=8)
    cb = train_pq_codebooks(df, m=4, ksub=16)
    assigned = ivf_assign(df, n_cells=8, centroids=cents)
    codes = pq_encode(df, cb).join(assigned, "vec_id")
    q = [float(x) for x in vecs[42]]
    probe = ivf_probe_cells(q, n_cells=8, nprobe=3, centroids=cents)
    got = ivfpq_topk(codes, q, cb, probe, k=10).collect()

    probed_ids = {
        r["vec_id"]
        for r in assigned.filter(assigned.cell.isin(probe)).collect()
    }
    want = [
        r
        for r in pq_adc_topk(pq_encode(df, cb), q, cb, k=400).collect()
        if r["vec_id"] in probed_ids
    ][:10]
    assert [(r["vec_id"], r["adc"]) for r in got] == [
        (r["vec_id"], r["adc"]) for r in want
    ]


def test_ivfpq_rerank_recall(spark, emb):
    """Probing half the cells + ADC shortlist + exact re-rank recovers
    near-exact recall on the clustered fixture."""
    from dawnsearch_spark.operators.similarity import (
        ivf_assign,
        ivfpq_rerank_topk,
        train_ivf_centroids,
    )

    df, vecs = emb
    cents = train_ivf_centroids(df, n_cells=8)
    cb = train_pq_codebooks(df, m=4, ksub=16)
    codes = pq_encode(df, cb).join(ivf_assign(df, n_cells=8, centroids=cents), "vec_id")
    hits = 0
    for qid in (3, 77, 123):
        q = [float(x) for x in vecs[qid]]
        exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
        got = [
            r["vec_id"]
            for r in ivfpq_rerank_topk(
                df, codes, q, cb, cents, k=10, nprobe=4, shortlist=50
            ).collect()
        ]
        hits += len(set(exact) & set(got))
    assert hits >= 24, f"ivfpq rerank recall collapsed: {hits}/30"
