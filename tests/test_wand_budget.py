"""Driver-postings budget, distributed overflow routing, θ pre-seeding and
observability counters of the WAND executor (VERDICT r2 items 1/3/4/6).

The invariant under test: no matter how small ``max_driver_postings`` is,
results stay rank-identical to the exact oracle (overflow light lists are
range-split on the executors, never decoded on the driver), and the
counters faithfully report what the engine did. Reference analogs: the
bounded top-k accumulator (/root/reference/src/search/best_results.rs:28-65)
and the per-search servers_contacted/pages_searched counters
(/root/reference/src/search/search_provider.rs:44-59).
"""

from __future__ import annotations

import math
from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from dawnsearch_spark.corpus import REFERENCE_QUERIES
from dawnsearch_spark.index_build import build_index
from dawnsearch_spark.operators.oracle import bm25_exact_topk
from dawnsearch_spark.operators.tf import (
    corpus_stats,
    doc_lengths,
    document_frequencies,
    term_frequencies,
)
from dawnsearch_spark.operators.wand import new_counters, search_index
from dawnsearch_spark.plans.query import Engine

MULTI_TERM_QUERIES = [2, 3, 12, 18, 21, 24]  # heavier, multi-list queries


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, spark, small_corpus, cfg):
    d = str(tmp_path_factory.mktemp("budget_index"))
    build_index(spark, small_corpus, d, cfg, n_groups=4)
    return d


@pytest.fixture(scope="module")
def oracle_inputs(spark, small_corpus):
    tf = term_frequencies(small_corpus).cache()
    stats = corpus_stats(doc_lengths(small_corpus))
    dfs = document_frequencies(tf).cache()
    tf.count()
    return tf, stats, dfs


def _oracle(oracle_inputs, cfg, query):
    tf, stats, dfs = oracle_inputs
    return [
        (r["doc_id"], r["score"])
        for r in bm25_exact_topk(tf, dfs, stats, query, cfg).collect()
    ]


def _assert_rank_identical(got, want, query):
    assert [g[0] for g in got] == [w[0] for w in want], f"docIDs differ for {query!r}"
    for (gd, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), f"score differs for doc {gd}"


@pytest.mark.parametrize("qid", MULTI_TERM_QUERIES)
def test_tiny_budget_overflow_rank_identical(spark, index_dir, oracle_inputs, cfg, qid):
    """A budget far below the lists' sizes forces the overflow split path;
    results must not change and the driver must respect the budget."""
    query = REFERENCE_QUERIES[qid]
    tight = replace(cfg, max_driver_postings=16)
    ctr = new_counters()
    got = search_index(spark, index_dir, query, tight, task_groups=4, counters=ctr)
    _assert_rank_identical(got, _oracle(oracle_inputs, cfg, query), query)
    assert ctr["path"] == "distributed"
    # budget bounds ALL driver decode: resident lights + θ-seed range
    assert ctr["driver_postings_decoded"] <= 16


def test_light_lists_overflow_to_executors(spark, index_dir, oracle_inputs, cfg):
    """Build a query from terms the dictionary says are LIGHT with df above
    the budget: every one of them must overflow (range-split on the
    executors), none decoded on the driver — the VERDICT r2 scale choke."""
    terms_dict = spark.read.parquet(index_dir + "/terms")
    light_terms = [
        r["term"]
        for r in terms_dict.filter(
            (~F.col("heavy")) & (F.col("df") > 8) & (F.col("df") <= 32)
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(3)
        .collect()
    ]
    assert len(light_terms) == 3, "corpus must have mid-df light terms"
    query = {t: 1 for t in light_terms}
    tight = replace(cfg, max_driver_postings=8)
    ctr = new_counters()
    got = search_index(spark, index_dir, query, tight, task_groups=4, counters=ctr)
    assert ctr["path"] == "distributed"
    assert ctr["light_terms_overflow"] == 3, ctr
    assert ctr["light_terms_driver"] == 0
    assert ctr["driver_postings_decoded"] <= 8
    # identical to the unconstrained engine answer
    want = search_index(spark, index_dir, query, cfg)
    assert [(d, round(s, 9)) for d, s in got] == [(d, round(s, 9)) for d, s in want]


@pytest.mark.parametrize("qid", [3, 21])
def test_zero_budget_everything_distributed(spark, index_dir, oracle_inputs, cfg, qid):
    query = REFERENCE_QUERIES[qid]
    zero = replace(cfg, max_driver_postings=0)
    ctr = new_counters()
    got = search_index(spark, index_dir, query, zero, task_groups=4, counters=ctr)
    _assert_rank_identical(got, _oracle(oracle_inputs, cfg, query), query)
    assert ctr["driver_postings_decoded"] == 0
    assert ctr["light_terms_driver"] == 0


def test_fast_path_within_budget_and_counters(spark, index_dir, cfg):
    """Default budget: the driver fast path serves the query, counters
    report the work done (nonzero where work happened)."""
    engine = Engine(spark, index_dir, cfg)
    got = engine.search(REFERENCE_QUERIES[3])
    ctr = engine.last_search_counters
    assert got and ctr["path"] in ("driver", "light_only")
    assert ctr["terms"] == 3
    assert ctr["driver_postings_decoded"] > 0
    assert ctr["driver_postings_decoded"] <= cfg.max_driver_postings
    assert ctr["postings_scored"] >= 0
    assert "last_search" in engine.stats()


def test_block_max_pruning_saves_decodes(spark, index_dir, cfg):
    """Distributed branch with θ pre-seed: across the multi-term queries
    the executor must decode strictly fewer blocks than a full decode of
    every matching heavy row would (the whole point of block-max WAND +
    the seeded θ)."""
    seg = spark.read.parquet(index_dir + "/segments")
    saved_somewhere = False
    for qid in MULTI_TERM_QUERIES:
        query = REFERENCE_QUERIES[qid]
        terms = query.split()
        total_blocks = (
            seg.filter(F.col("term").isin(terms) & (F.col("range_id") >= 0))
            .select(F.sum(F.size("block_last")).alias("nb"))
            .collect()[0]["nb"]
            or 0
        )
        ctr = new_counters()
        search_index(
            spark, index_dir, query, cfg,
            max_driver_heavy_rows=0, task_groups=4, counters=ctr,
        )
        assert ctr["path"] == "distributed"
        assert ctr["blocks_decoded"] <= total_blocks
        if ctr["blocks_decoded"] < total_blocks or ctr["ranges_pruned"] > 0:
            saved_somewhere = True
    assert saved_somewhere, "pruning never skipped a block or range"


def test_block_seed_under_starved_budget(spark, index_dir, oracle_inputs, cfg):
    """When the best range's postings exceed the driver budget (the shape
    of a 100x index), θ must still be seeded — from the single best block
    (≤ block_size postings) of the best row — so the fan-out does not
    start at θ≈0 (VERDICT r4 #3: ranges_pruned was 0 two rounds running).
    Results stay rank-identical to the oracle; a discriminative
    rare+stopword query must record actual range pruning."""
    terms_dict = spark.read.parquet(index_dir + "/terms")
    # rare terms with at least k=5 matching docs so the seeded θ lands on
    # a HIGH (rare-idf) score, tight enough to prune heavy-only ranges
    rare = [
        r["term"]
        for r in terms_dict.filter(
            (~F.col("heavy")) & (F.col("df") >= 8) & (F.col("df") <= 16)
        )
        .orderBy("term")
        .limit(2)
        .collect()
    ]
    heavy2 = [
        r["term"]
        for r in terms_dict.orderBy(F.desc("df"), F.asc("term")).limit(2).collect()
    ]
    assert len(rare) == 2 and len(heavy2) == 2
    pruned_somewhere = False
    for t in rare:
        query = {t: 1, heavy2[0]: 1, heavy2[1]: 1}
        tight = replace(cfg, max_driver_postings=16, top_k_internal=5)
        ctr = new_counters()
        got = search_index(
            spark, index_dir, query, tight, k=5,
            max_driver_heavy_rows=0, task_groups=4, counters=ctr,
        )
        assert ctr["path"] == "distributed"
        assert ctr["theta_seed_mode"] == "block", ctr
        assert ctr["seed_blocks_decoded"] >= 1
        assert 0 < ctr["seed_postings_scored"] <= cfg.block_size
        assert ctr["theta_seed"] > 0.0, ctr
        want = search_index(spark, index_dir, query, cfg)
        assert [(d, round(s, 9)) for d, s in got] == [
            (d, round(s, 9)) for d, s in want[:5]
        ], t
        if ctr["ranges_pruned"] > 0:
            pruned_somewhere = True
    assert pruned_somewhere, "block-seeded θ never pruned a range"


def test_theta_seed_recorded(spark, index_dir, cfg):
    """The θ pre-seed must be captured and nonzero for a query whose light
    lists alone fill the top-k (seed = kth best light/seed score)."""
    ctr = new_counters()
    search_index(
        spark, index_dir, REFERENCE_QUERIES[21], cfg,
        max_driver_heavy_rows=0, task_groups=4, counters=ctr,
    )
    assert ctr["path"] == "distributed"
    assert ctr["theta_seed"] > 0.0
