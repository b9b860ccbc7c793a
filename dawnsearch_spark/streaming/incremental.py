"""Incremental index updates: batch append + Structured Streaming ingest.

Reference analog: the continuous ingestion loop feeding an ever-growing
index (/root/reference/src/index/extraction_service.rs:34-61 — runs
forever, random WARC per cycle) with URL-dedup before insert
(/root/reference/src/search/search_provider.rs:250-286) and periodic Save
checkpoints (/root/reference/src/bin/dawnsearch.rs:80-88).

Spark shape: each micro-batch of new documents becomes one or more new
**build groups** appended after the committed ones. BOTH the posting
runs AND the merged segment rows are stats-free (runs store raw
docID/tf/dl; segment rows store (max_tf, min_dl) block bounds and
per-row n_docs — query-time idf/avgdl/bounds always derive from current
stats), so an append only:
  1. anti-joins new docs against the forward index on the identity key
     (J2 insert-dedup analog), assigns docIDs starting at the current N;
  2. appends to the forward-index parquet and re-commits its manifest;
  3. invalidates the ``stats`` manifest (exact recount from run
     metadata — cheap) while the ``segments`` manifest KEEPS its
     committed generation list;
  4. re-runs ``build_index`` — committed run groups are skipped, only
     the new groups tokenize/shuffle, and stage 3 merges ONLY the new
     groups' runs into a new segment GENERATION: append IO is O(batch),
     never O(index) (the reference appends in O(batch) too —
     search_provider.rs:250-286 — with periodic saves :173-181).
     Compaction re-merges all generations once their count exceeds
     ``cfg.max_segment_generations``.
Scores stay rank-identical to a from-scratch build because nothing
stats-dependent is stored: df is recovered by summing n_docs across a
term's rows, and block bounds are evaluated under current stats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawnsearch_spark.config import EngineConfig
from dawnsearch_spark.index_build import IndexPaths, build_index
from dawnsearch_spark.manifest import MANIFEST_DIR, write_manifest
from dawnsearch_spark.operators.docids import assign_doc_ids


def _invalidate(root: str, names: list[str]) -> None:
    for n in names:
        p = os.path.join(root, MANIFEST_DIR, f"{n}.json")
        if os.path.exists(p):
            os.remove(p)


def append_documents(
    spark: SparkSession,
    index_root: str,
    new_docs: DataFrame,
    cfg: EngineConfig,
    n_groups: int = 1,
    log=lambda m: None,
) -> dict:
    """Append new documents and bring the index fully up to date.

    Crash safety (no torn-append window): the doc_id base comes from
    ``max(doc_id) + 1`` of the forward-index parquet itself — never from
    the stats manifest, which may be stale after a crash — and the derived
    manifests (stats, documents) are invalidated BEFORE the parquet
    append (the segments manifest survives: its committed generations
    stay valid, and stage 3 detects the uncovered new groups by
    comparing the generation group list against the build plan). A crash at any point then leaves one of two states:
    (a) manifests invalidated, parquet untouched — the next build recovers
    the documents manifest by recount; (b) rows appended, manifests still
    missing — same recovery path adopts the appended rows (their ids are
    dense on top of the old max). Duplicate doc_ids can never be minted.
    """
    paths = IndexPaths(index_root)
    existing = spark.read.parquet(paths.documents)
    agg = existing.agg(
        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("mx")
    ).collect()[0]
    n_existing = int(agg["n"])
    base = int(agg["mx"]) + 1 if agg["mx"] is not None else 0
    if base != n_existing:
        raise RuntimeError(
            f"forward index not dense (count={n_existing}, max+1={base}); "
            "refusing to append"
        )

    # insert-dedup (J2): drop docs whose identity key already exists, then
    # dedup identity keys WITHIN the batch exactly like the first build
    # does — deterministic keeper = smallest content_sha per key, fused
    # into assign_doc_ids' range sort (a bare dropDuplicates picks an
    # arbitrary row, so a replayed batch could mint a different forward-
    # index row for the same key).
    key = list(cfg.id_cols)
    fresh = new_docs.join(existing.select(*key), on=key, how="left_anti")
    if "doc_id" in fresh.columns:
        fresh = fresh.drop("doc_id")
    if "content_sha" not in fresh.columns:
        fresh = fresh.withColumn("content_sha", F.sha2(F.col(cfg.content_col), 256))
    assigned = assign_doc_ids(fresh, cfg.id_cols, dedup_order_col="content_sha")
    fresh = assigned.withColumn("doc_id", F.col("doc_id") + F.lit(base))
    try:
        n_new = fresh.count()
        if n_new == 0:
            log("append: nothing new after dedup")
            return {"appended": 0, "n_docs": n_existing}
        _invalidate(paths.root, ["stats", "documents"])
        # assign_doc_ids output partitions are already contiguous sorted
        # doc_id ranges — append them as-is (no extra repartitionByRange
        # shuffle)
        fresh.select(*existing.columns).write.mode("append").parquet(paths.documents)
    finally:
        # release the range-sort cache on BOTH exits — the n_new == 0 early
        # return otherwise leaks one persisted corpus copy per no-op append
        cached = getattr(assigned, "_dawnsearch_persisted", None)
        if cached is not None:
            cached.unpersist()
    from dawnsearch_spark.manifest import config_fingerprint

    fp = config_fingerprint(cfg)
    write_manifest(
        paths.root,
        "documents",
        {"fingerprint": fp, "n_docs": base + n_new, "appended": n_new},
    )
    log(f"append: {n_new} new docs (total {base + n_new}); stats recount + incremental merge")
    counters = build_index(spark, existing, index_root, cfg, n_groups=n_groups, log=log)
    counters["appended"] = n_new
    return counters


def stream_into_index(
    stream_df: DataFrame,
    index_root: str,
    cfg: EngineConfig,
    checkpoint_dir: str,
    n_groups: int = 1,
    trigger_available_now: bool = True,
):
    """Structured Streaming sink: each micro-batch appends to the index via
    ``foreachBatch`` (ST1/ST2 analog — micro-batch with per-batch commit).

    ``stream_df`` must carry the corpus schema (repo, path, commit, lang,
    content). Returns the started StreamingQuery.
    """

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_documents(
            batch_df.sparkSession, index_root, batch_df, cfg, n_groups=n_groups
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
