"""Exact full-scan BM25 top-k — the engine's golden oracle.

Reference analog: the brute-force exact top-10 scan kept alongside the real
index for sanity-checking (/root/reference/examples_old/search.rs:44-72).
The WAND executor must be rank-identical (docIDs AND scores) to this scorer
on the reference query set (BASELINE.md).

Determinism: per-doc scores are folded in ascending-term order via
``aggregate(array_sort(collect_list(...)))`` in float64, so the summation
order is bitwise-reproducible; the WAND executor accumulates in the same
ascending-term order (SURVEY.md §7 hard part 1). Ties break
(score desc, doc_id asc) like the reference's stable final sort
(/root/reference/src/search/best_results.rs:71-79).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawnsearch_spark.config import EngineConfig
from dawnsearch_spark.functions.bm25 import bm25_col, idf_col
from dawnsearch_spark.functions.tokenizer import tokenize_py
from dawnsearch_spark.operators.tf import CorpusStats


def query_terms_df(spark: SparkSession, query: str | dict[str, float]) -> DataFrame:
    """Tokenize a query (same tokenizer as the corpus) -> (term, qtf).

    Reference analog: query and corpus share one tokenizer/model
    (embedding_service.rs:97-139). Duplicate query terms weight the score
    by their in-query count (qtf); a ``{term: boost}`` dict weights terms
    explicitly (Lucene BoostQuery semantics — the boost multiplies the
    term's BM25 contribution), and floats are honored end-to-end.
    """
    if isinstance(query, dict):
        rows = [(t, float(w)) for t, w in sorted(query.items())]
    else:
        rows = [(t, float(c)) for t, c in sorted(Counter(tokenize_py(query)).items())]
    return spark.createDataFrame(rows, "term string, qtf double")


def bm25_exact_topk(
    tf: DataFrame,
    term_stats: DataFrame,
    stats: CorpusStats,
    query: str,
    cfg: EngineConfig,
    k: int | None = None,
) -> DataFrame:
    """Full-scan scorer: (doc_id, score), top-k, deterministic order.

    tf:         (doc_id, term, tf, dl)   — from operators.tf
    term_stats: (term, df[, cf])         — from operators.tf
    """
    spark = tf.sparkSession
    k = k or cfg.top_k
    q = query_terms_df(spark, query)
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(term_stats.join(q, "term", "left_semi")), "term")
        .withColumn(
            "tscore",
            F.col("qtf").cast("double")
            * bm25_col(
                F.col("tf"),
                F.col("dl"),
                idf_col(F.col("df"), float(stats.n_docs)),
                stats.avgdl,
                cfg.k1,
                cfg.b,
            ),
        )
    )
    per_doc = (
        scored.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("term", "tscore"))).alias("_parts"))
        .select(
            "doc_id",
            F.aggregate(
                "_parts", F.lit(0.0), lambda acc, x: acc + x["tscore"]
            ).alias("score"),
        )
    )
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
