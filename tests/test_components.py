"""Connected-components clustering (pairs -> clusters -> keepers).

Ground truth is a plain union-find over the same edge list; the Spark
side must match it exactly on every node, including the long-chain
graphs that the capped-bucket candidate generators emit."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dawnsearch_spark.operators.dedup import connected_components, dedup_clusters


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # full path compression, then label = min of component
    comp = {}
    for n in nodes:
        comp[n] = find(n)
    mins = {}
    for n, r in comp.items():
        mins[r] = min(mins.get(r, n), n)
    return {n: mins[r] for n, r in comp.items()}


def _spark_cc(spark, edges, max_driver_edges=200_000):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "id_a long, id_b long"
    )
    out = connected_components(df, max_driver_edges=max_driver_edges)
    return {r["node"]: r["component"] for r in out.collect()}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in edges for x in e})
    want = _uf_components(edges, nodes)
    # driver fast path and forced-distributed star rounds must agree
    assert _spark_cc(spark, edges) == want
    if seed == 1:
        assert _spark_cc(spark, edges, max_driver_edges=0) == want


def test_long_chain_converges_logarithmically(spark):
    # a 300-node path is the worst case for naive label propagation
    # (diameter rounds); the alternating algorithm must finish well
    # inside the iteration budget.
    edges = [(i, i + 1) for i in range(300)]
    got = _spark_cc(spark, edges, max_driver_edges=0)  # force the star rounds
    assert set(got.values()) == {0}
    assert len(got) == 301


def test_two_components_and_self_loops(spark):
    edges = [(5, 6), (6, 7), (20, 21), (9, 9)]
    got = _spark_cc(spark, edges, max_driver_edges=0)
    assert got == {5: 5, 6: 5, 7: 5, 20: 20, 21: 20}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0
    assert connected_components(df, max_driver_edges=0).count() == 0


def test_midway_handover_to_driver(spark):
    # a dense component (complete graph on 20 nodes = 190 edges) exceeds
    # a budget of 100, but one star round collapses it toward a 19-edge
    # star -> distributed start, driver union-find finish
    edges = [(i, j) for i in range(20) for j in range(i + 1, 20)]
    edges += [(100, 101)]  # plus a separate pair component
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, max_driver_edges=100)
    got = {r["node"]: r["component"] for r in out.collect()}
    assert {got[i] for i in range(20)} == {0}
    assert got[100] == 100 and got[101] == 100
    assert len(got) == 22


def test_dedup_clusters_keeper_flags(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(11)], "doc_id long")
    out = dedup_clusters(pairs, ids).collect()
    by_id = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out}
    assert len(by_id) == 11
    assert by_id[1] == (1, True)
    assert by_id[2] == (1, False)
    assert by_id[3] == (1, False)
    assert by_id[7] == (7, True)
    assert by_id[9] == (7, False)
    # singletons are their own canonical cluster
    assert by_id[0] == (0, True)
    assert by_id[10] == (10, True)
    keepers = [i for i, (_, can) in by_id.items() if can]
    assert sorted(keepers) == [0, 1, 4, 5, 6, 7, 8, 10]
