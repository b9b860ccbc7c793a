"""Result hydration: top-k docIDs -> document rows + integrity check.

Reference analogs:
* point-lookup hydration of each result id from the row store
  (/root/reference/src/search/search_provider.rs:218-240) — here a
  broadcast hash join of the tiny top-k set against ``documents`` (J1);
* per-row integrity verification (full-scan embedding verify at
  search_provider.rs:289-327) — here the input_hint invariant:
  sha256(content) must equal the stored content_sha for every hydrated row;
* serve-time snippet truncation (/root/reference/src/net/web.rs:328).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawnsearch_spark.config import EngineConfig


def hydrate_topk(
    topk: DataFrame,
    documents: DataFrame,
    cfg: EngineConfig,
    verify_sha: bool = True,
    doc_ids: list[int] | None = None,
) -> DataFrame:
    """Join (doc_id, score) against documents; returns ranked result rows.

    The top-k side is tiny (k rows) so it is broadcast — the scan side
    prunes to the joined ids via the broadcast hash join (no shuffle of the
    documents table). Plan shape matters: the join runs FIRST, and the
    sha256 + snippet projections are computed on the k joined rows only —
    projecting below the join would hash/truncate the full corpus per query
    (full-corpus crypto belongs to ``verify_corpus``, not the search path).

    ``doc_ids`` (the k result ids, when the caller already holds them on
    the driver) becomes an ``IN`` predicate pushed into the documents scan:
    the forward index is written as contiguous doc_id ranges, so parquet
    row-group statistics skip every file/row-group outside the k ids — the
    reference's per-id point lookup (search_provider.rs:218-240) instead
    of a full table scan feeding the join.
    """
    cols = [c for c in ("repo", "path", "commit", "lang") if c in documents.columns]
    sel = documents.select(
        "doc_id",
        *cols,
        cfg.content_col,
        *(["content_sha"] if "content_sha" in documents.columns else []),
    )
    if doc_ids is not None:
        sel = sel.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
    out = sel.join(F.broadcast(topk), "doc_id", "inner")
    if verify_sha and "content_sha" in documents.columns:
        out = out.withColumn(
            "sha_ok", F.sha2(F.col(cfg.content_col), 256) == F.col("content_sha")
        )
    out = out.withColumn(
        "snippet", F.substring(F.col(cfg.content_col), 1, cfg.snippet_len)
    ).drop(cfg.content_col)
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


def verify_corpus(documents: DataFrame, cfg: EngineConfig) -> dict:
    """Full-corpus integrity scan (reference: SearchProvider::verify,
    search_provider.rs:289-327 — boot-time full verify that fails the
    process on any bad row). Returns counters; caller decides to fail."""
    agg = documents.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(
                F.sha2(F.col(cfg.content_col), 256) != F.col("content_sha"), 1
            ).otherwise(0)
        ).alias("sha_mismatch"),
        F.sum(F.when(F.col(cfg.content_col).isNull(), 1).otherwise(0)).alias("null_content"),
    ).collect()[0]
    return {
        "rows": int(agg["rows"]),
        "sha_mismatch": int(agg["sha_mismatch"] or 0),
        "null_content": int(agg["null_content"] or 0),
    }
