"""Deterministic dense docID assignment (SURVEY.md §7 hard part 4)."""

from __future__ import annotations

from dawnsearch_spark.corpus import generate_corpus
from dawnsearch_spark.operators.docids import assign_doc_ids


def test_doc_ids_dense_and_ordered(small_corpus):
    rows = small_corpus.select("doc_id", "repo", "path", "commit").collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(rows)))
    by_key = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    assert [r["doc_id"] for r in by_key] == list(range(len(rows)))


def test_doc_ids_partitioning_invariant(spark):
    """Same ids regardless of generation parallelism / partition count."""
    a = generate_corpus(spark, 150, seed=7, vocab_size=500, parts=3)
    b = generate_corpus(spark, 150, seed=7, vocab_size=500, parts=11)
    ia = assign_doc_ids(a, ("repo", "path", "commit"), parts=4)
    ib = assign_doc_ids(b, ("repo", "path", "commit"), parts=9)
    ra = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in ia.collect()}
    rb = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in ib.collect()}
    assert ra == rb
