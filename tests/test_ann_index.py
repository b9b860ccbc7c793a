"""Materialized ANN index: write-time bucket partitioning + pruned scans."""

from __future__ import annotations

import numpy as np
import os
import pytest

from dawnsearch_spark.operators.ann_index import ann_query, build_ann_index
from dawnsearch_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[99] = vecs[42] * 0.999 + 0.001 * vecs[7]  # planted near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache(),
        vecs,
    )


@pytest.mark.parametrize("kind", ["lsh", "ivf"])
def test_build_and_query(spark, emb, tmp_path, kind):
    df, vecs = emb
    d = str(tmp_path / kind)
    m = build_ann_index(df, d, kind=kind, n_planes=4, n_cells=8)
    assert m["part_col"] == "bucket"
    # partition directories exist on disk
    parts = [p for p in os.listdir(os.path.join(d, "vectors")) if p.startswith("bucket=")]
    assert len(parts) > 1, "expected multiple bucket partitions"
    q = [float(x) for x in vecs[42]]
    got = ann_query(spark, d, q, k=5).collect()
    ids = [r["vec_id"] for r in got]
    assert 42 in ids, "query vector's own bucket contains it"
    if kind == "ivf":  # nprobe=4 of 8 cells: near-dup expected found
        assert 99 in ids
    # results are a subset of the exact full ranking (no fabricated rows)
    full = {r["vec_id"] for r in cosine_topk(df, q, k=200).collect()}
    assert set(ids) <= full


def test_query_is_partition_pruned(spark, emb, tmp_path):
    """The pruned scan must reach the source as a partition filter — i.e.
    the plan reads only the query's bucket directory, not the full table."""
    df, vecs = emb
    d = str(tmp_path / "pruned")
    build_ann_index(df, d, kind="lsh", n_planes=4)
    q = [float(x) for x in vecs[3]]
    plan = ann_query(spark, d, q, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # scheme check: the filter is on the partition column, with a literal
    assert "bucket#" in plan or "bucket IN" in plan


def test_ivfpq_index_reads_only_probed_cells(spark, emb, tmp_path):
    """The materialized IVF×PQ index: codes (m bytes/vector, no raw
    floats) partitioned by trained cell. The query plan must carry the
    partition filter AND — the filesystem-level check — every input file
    of the executed scan must live under a probed cell directory."""
    df, vecs = emb
    d = str(tmp_path / "ivfpq")
    m = build_ann_index(df, d, kind="ivfpq", n_cells=8, pq_m=4, pq_ksub=16)
    assert m["codebooks"] is not None and m["centroids"] is not None
    # the index stores codes only — no embedding column on disk
    import pyspark.sql.functions as F
    from dawnsearch_spark.operators.ann_index import ann_query
    from dawnsearch_spark.operators.similarity import ivf_probe_cells

    vectors = spark.read.parquet(os.path.join(d, "vectors"))
    assert set(vectors.columns) == {"vec_id", "code", "bucket"}

    q = [float(x) for x in vecs[42]]
    got = ann_query(spark, d, q, k=5, nprobe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    probe = ivf_probe_cells(
        q, m["n_cells"], 3, m["seed"], np.asarray(m["centroids"], float)
    )
    pruned = vectors.filter(F.col("bucket").isin(probe))
    pruned.collect()
    # filesystem-level evidence from the EXECUTED scan's own metrics
    # (inputFiles() lists the pre-pruning relation): the scan must have
    # opened exactly the probed cells' partitions, no more
    leaves = pruned._jdf.queryExecution().executedPlan().collectLeaves()
    scan = next(
        leaves.apply(i)
        for i in range(leaves.size())
        if "Scan" in leaves.apply(i).nodeName()
    )

    def _metric(name):
        return int(scan.metrics().apply(name).value())

    n_cells_on_disk = sum(
        1
        for p in os.listdir(os.path.join(d, "vectors"))
        if p.startswith("bucket=")
    )
    assert _metric("numPartitions") == len(probe) < n_cells_on_disk
    assert _metric("numFiles") == len(probe)  # one file per cell here

    # results are valid ids and the query's own cell contains it
    ids = [r["vec_id"] for r in got.collect()]
    assert 42 in ids

    # rerank tail reuses the raw relation, never the index
    rer = ann_query(spark, d, q, k=5, nprobe=3, rerank_with=df, shortlist=30)
    ids2 = [r["vec_id"] for r in rer.collect()]
    assert 42 in ids2 and len(ids2) == 5
