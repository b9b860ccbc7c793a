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


def test_dedup_null_keys_null_safe(spark):
    """ADVICE r3: offsets come from Spark countDistinct (NULL == NULL) but
    the Arrow shift-compare treated NaN/None as unequal — kept rows then
    exceeded the counted rows and later partitions' doc_ids collided.
    Duplicate keys containing nulls must dedup exactly like non-null ones."""
    rows = [
        (None, "y", "c1", "aaa"),
        (None, "y", "c1", "bbb"),   # dup of the null-keyed row
        (None, "y", "c1", "ccc"),   # triple
        ("r1", None, "c2", "ddd"),
        ("r1", None, "c2", "eee"),  # dup with null in a middle column
        ("r2", "p2", "c3", "fff"),
        (None, None, None, "ggg"),
        (None, None, None, "hhh"),  # all-null key dup
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content_sha string"
    )
    out = assign_doc_ids(
        df, ("repo", "path", "commit"), parts=3, dedup_order_col="content_sha"
    ).collect()
    # one row per distinct (null-safe) key, dense ids, keeper = min sha
    assert sorted(r["doc_id"] for r in out) == list(range(4))
    keep = {(r["repo"], r["path"], r["commit"]): r["content_sha"] for r in out}
    assert keep[(None, "y", "c1")] == "aaa"
    assert keep[("r1", None, "c2")] == "ddd"
    assert keep[(None, None, None)] == "ggg"


def test_dedup_null_keys_ids_dense_across_partitions(spark):
    """Many null-keyed dup groups spread over partitions: ids must stay
    dense (the pre-fix failure mode was silent doc_id collisions)."""
    rows = []
    for i in range(40):
        key = (None if i % 3 == 0 else f"r{i}", f"p{i % 7}", f"c{i}")
        rows.append((*key, "s_a"))
        rows.append((*key, "s_b"))  # every key duplicated once
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content_sha string"
    )
    out = assign_doc_ids(
        df, ("repo", "path", "commit"), parts=5, dedup_order_col="content_sha"
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == list(range(40)), "doc_ids must be dense with no collisions"
    assert all(r["content_sha"] == "s_a" for r in out)
