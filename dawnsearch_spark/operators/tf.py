"""Term-frequency extraction and corpus statistics.

Reference analog: the reference never computes TF (its per-doc derived
vector is an embedding, /root/reference/src/embedding/embedding_service.rs:
126-135); per the north rule the analogous per-document derived structure is
the term-frequency bag (SURVEY.md §2.4 A6/A7).

Everything here is built-in Catalyst operators (tokenize -> explode ->
hash-aggregate with map-side partial aggregation); the tokenizer is native
Spark expressions, so the whole TF pipeline is JVM-side / codegen — no
Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawnsearch_spark.functions.tokenizer import tokens_col


@dataclass(frozen=True)
class CorpusStats:
    """BM25 global stats (SURVEY.md §2.4 A7). Exact counts — rank identity
    forbids approx_count_distinct."""

    n_docs: int
    avgdl: float
    total_tokens: int


def term_frequencies(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, term, tf, dl) — one row per distinct (doc, term).

    ``dl`` (document token length) is carried through the grouping key so no
    extra join against a doclen table is needed downstream.
    """
    toks = docs.select(
        "doc_id", tokens_col(content_col).alias("_toks")
    ).withColumn("dl", F.size("_toks").cast("long"))
    return (
        toks.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def doc_lengths(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, dl) token counts."""
    return docs.select("doc_id", F.size(tokens_col(content_col)).cast("long").alias("dl"))


def corpus_stats(doclens: DataFrame) -> CorpusStats:
    row = doclens.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total"),
    ).collect()[0]
    return CorpusStats(
        n_docs=int(row["n"]),
        avgdl=float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
        total_tokens=int(row["total"]) if row["total"] is not None else 0,
    )


def document_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency per term.

    (term, doc_id) is unique in ``tf`` so df is a plain count — a hash
    aggregate with partial (map-side) combine, no distinct shuffle.
    """
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
