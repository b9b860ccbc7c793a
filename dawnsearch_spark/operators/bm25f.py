"""BM25F: fielded BM25 with per-field weights and length normalization.

Robertson & Zaragoza's simple BM25F ("The Probabilistic Relevance
Framework: BM25 and Beyond", 2009 — public literature): per-field term
frequencies are length-normalized per field, weighted, SUMMED into one
pseudo-frequency, and pushed through a single saturation:

    tf~(t,d)  = sum_f  w_f * tf_f(t,d) / (1 - b_f + b_f * dl_f(d)/avgdl_f)
    score(d)  = sum_t  idf(t) * (k1 + 1) * tf~(t,d) / (k1 + tf~(t,d))

idf uses document-level df (the term appears in ANY field), with the same
Lucene-style ln((N - df + 0.5)/(df + 0.5) + 1) kernel as the unfielded
scorer (functions/bm25.py), and the (k1 + 1) numerator factor is kept
(as Lucene keeps it), so BM25F with ONE field at w=1 and the engine's b
degenerates to EXACTLY the unfielded BM25 scores — pinned by
tests/test_snippets_bm25f.py.

Reference analog: the reference scores one stored text per page
(/root/reference/src/search/search_provider.rs); multi-field weighting is
the Lucene/Elasticsearch-standard extension a code-search user expects
(path/title matches outrank body matches).

Determinism: per-doc scores fold in ascending-term order in float64
(same discipline as operators/oracle.py), so summation order is
bit-reproducible.

Scale notes: like the exact-BM25 oracle this is a full-scan scorer — the
deliberate golden-truth path, not the serving path. One scan of the
corpus, one explode per (field, token), groupBy (doc, field, term)
restricted to broadcast query terms, map-side combine throughout; the
field structure adds a constant factor, not a new shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dawnsearch_spark.functions.bm25 import idf_col
from dawnsearch_spark.functions.tokenizer import tokenize_py, tokens_col


def title_body_fields(text_col: str = "text", title_len: int = 12) -> dict:
    """Default field split used by the gate entry: ``title`` = the first
    ``title_len`` tokens, ``body`` = the remainder. Deterministic and
    recomputable in SQL (the synthetic corpus has no separate title
    column; a real pipeline passes one Column per real field)."""
    toks = tokens_col(text_col)
    return {
        "title": (F.slice(toks, 1, title_len), 2.0, 0.75),
        "body": (
            F.slice(toks, title_len + 1, F.greatest(F.size(toks) - title_len, F.lit(0))),
            1.0,
            0.75,
        ),
    }


def bm25f_topk(
    docs: DataFrame,
    query: str,
    fields: dict[str, tuple[Column, float, float]] | None = None,
    k: int = 10,
    k1: float = 1.2,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score) top-k under BM25F. ``fields`` maps field name ->
    (tokens Column, weight w_f, length-norm b_f)."""
    if fields is None:
        fields = title_body_fields()
    terms = sorted(set(tokenize_py(query)))
    spark = docs.sparkSession
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")

    # one scan: every (doc, field) row with its token array
    frows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("field"), col.alias("toks"))
                    for name, (col, _, _) in fields.items()
                ]
            )
        ).alias("_f"),
    ).select("doc_id", F.col("_f.field").alias("field"), F.col("_f.toks").alias("toks"))
    frows = frows.persist()
    try:
        dl = frows.select("doc_id", "field", F.size("toks").cast("double").alias("dl"))
        avgdl = dl.groupBy("field").agg(F.avg("dl").alias("avgdl"))
        n_docs = float(docs.count())

        tf = (
            frows.select("doc_id", "field", F.explode("toks").alias("term"))
            .join(F.broadcast(qdf), "term")
            .groupBy("doc_id", "field", "term")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        )
        # document-level df: the term occurs in ANY field of the doc
        dfq = tf.select("doc_id", "term").distinct().groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias("df")
        )

        wmap = F.create_map(
            *[x for name, (_, w, _) in fields.items() for x in (F.lit(name), F.lit(float(w)))]
        )
        bmap = F.create_map(
            *[x for name, (_, _, b) in fields.items() for x in (F.lit(name), F.lit(float(b)))]
        )
        pseudo = (
            tf.join(dl, ["doc_id", "field"])
            .join(F.broadcast(avgdl), "field")
            .withColumn("_w", wmap[F.col("field")])
            .withColumn("_b", bmap[F.col("field")])
            .withColumn(
                "_part",
                F.col("_w")
                * F.col("tf")
                / (F.lit(1.0) - F.col("_b") + F.col("_b") * F.col("dl") / F.col("avgdl")),
            )
            .groupBy("doc_id", "term")
            .agg(F.sum("_part").alias("tfx"))
        )
        scored = (
            pseudo.join(F.broadcast(dfq), "term")
            .withColumn(
                "tscore",
                idf_col(F.col("df"), n_docs)
                * F.lit(float(k1) + 1.0)
                * F.col("tfx")
                / (F.lit(float(k1)) + F.col("tfx")),
            )
        )
        per_doc = (
            scored.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("term", "tscore"))).alias("_parts"))
            .select(
                "doc_id",
                F.aggregate(
                    "_parts", F.lit(0.0), lambda acc, p: acc + p["tscore"]
                ).alias("score"),
            )
        )
        out = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        rows = out.collect()
    finally:
        frows.unpersist()
    return spark.createDataFrame(rows, "doc_id long, score double")
