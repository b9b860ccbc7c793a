"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-10 over the sf0.001 ``documents``
table, hydrated. ``queries()`` / ``oracle_sql()`` — one entry per
implemented operator family from SURVEY.md §2, each with an ANSI-SQL twin
the driver runs in DuckDB at sf0.01 (row-count + schema + value-hash).

Column-name & value parity rules used throughout:
* every computed column is aliased identically on both sides;
* float aggregates are rounded (4-6 dp) on both sides; sums that must be
  bit-stable are over integer-valued columns (exact in fp);
* tokenization is the engine's code-aware tokenizer, mirrored exactly in
  DuckDB SQL (same regex chain, 'g' flags).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawnsearch_spark.config import EngineConfig
from dawnsearch_spark.functions.tokenizer import tokens_col
from dawnsearch_spark.operators.dedup import (
    embedding_near_duplicates,
    jaccard_pairs_exact,
    word_shingles,
)
from dawnsearch_spark.operators.oracle import bm25_exact_topk
from dawnsearch_spark.operators.similarity import cosine_topk
from dawnsearch_spark.operators.text_analysis import (
    EN_STOPWORDS,
    alpha_ratio,
    lang_guess,
    normalized_fingerprint,
    quality_score,
    stopword_ratio,
    ws_token_count,
)
from dawnsearch_spark.operators.tf import (
    corpus_stats,
    doc_lengths,
    document_frequencies,
    term_frequencies,
)

CFG = EngineConfig()

BM25_QUERY_1 = "table scan query"
BM25_QUERY_2 = "window shuffle customer"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # engine-shaped view of the driver's documents table
    return _t(spark, sf_dir, "documents").withColumnRenamed("text", "content")


# --------------------------------------------------------------------------
# DuckDB SQL fragments mirroring the code-aware tokenizer (tokenizer.py):
# acronym split, camel split, non-alnum -> space, lower, split, drop empties.
# --------------------------------------------------------------------------
def _tok_sql(col: str) -> str:
    return (
        "list_filter(regexp_split_to_array(lower(trim("
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'), "
        "'([a-z0-9])([A-Z])', '\\1 \\2', 'g'), "
        "'[^A-Za-z0-9]+', ' ', 'g'))), ' +'), x -> x <> '')"
    )


_WS_TOKS = "list_filter(regexp_split_to_array(lower(trim({col})), '\\s+'), x -> x <> '')"


def _cos_sql(a: str, b: str) -> str:
    """float64 cosine with sequential left folds — bit-identical to the
    Spark ``cosine_sim_col`` evaluation (dedup.py)."""
    def dot(x, y):
        return (
            f"list_reduce(list_transform(range(1, len({x}) + 1), "
            f"i -> {x}[i]::DOUBLE * {y}[i]::DOUBLE), (acc, v) -> acc + v)"
        )

    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def _bm25_sql(query_terms: list[str], k: int = 10) -> str:
    terms_in = ", ".join(f"'{t}'" for t in query_terms)
    toks = _tok_sql("text")
    return f"""
WITH dl AS (
  SELECT doc_id, len({toks})::DOUBLE AS dl FROM documents
),
st AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, unnest({toks}) AS term FROM documents)
  WHERE term IN ({terms_in})
  GROUP BY doc_id, term
),
dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         sum( ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
              * tf.tf * ({CFG.k1} + 1.0)
              / (tf.tf + {CFG.k1} * (1.0 - {CFG.b} + {CFG.b} * dl.dl / st.avgdl)) ) AS s
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 6) AS score FROM sc ORDER BY s DESC, doc_id LIMIT {k}
"""


def _bm25_spark(spark: SparkSession, sf_dir: str, query: str, k: int = 10) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tf = term_frequencies(docs)
    stats = corpus_stats(doc_lengths(docs))
    dfs = document_frequencies(tf)
    top = bm25_exact_topk(tf, dfs, stats, query, CFG, k=k)
    return top.select("doc_id", F.round("score", 6).alias("score"))


# --------------------------------------------------------------------------
# queries() implementations
# --------------------------------------------------------------------------

def q_doclen_stats(spark, sf_dir):
    """A1/A7: corpus statistics for BM25."""
    docs = _docs(spark, sf_dir)
    dl = docs.select(F.size(tokens_col("content")).cast("long").alias("dl"))
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
    )


def q_term_tf(spark, sf_dir):
    """A6: per-(doc, term) term frequency — full tokenizer parity check."""
    docs = _docs(spark, sf_dir)
    return (
        term_frequencies(docs)
        .select("term", "doc_id", "tf")
        .filter(F.col("term").startswith("s"))  # bounded output, still thousands of rows
    )


def q_doc_freq(spark, sf_dir):
    """A7: document/collection frequency per term."""
    docs = _docs(spark, sf_dir)
    return document_frequencies(term_frequencies(docs)).select("term", "df", "cf")


def q_bm25_topk_1(spark, sf_dir):
    """T3/E1: exact BM25 top-10 (flagship semantics)."""
    return _bm25_spark(spark, sf_dir, BM25_QUERY_1)


def q_bm25_topk_2(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, BM25_QUERY_2)


def q_filter_project(spark, sf_dir):
    """F1-F8: ingest-style predicates + projections on events."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view") & (F.col("value") > 10.0))
        .select(
            "event_id",
            "user_id",
            F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("tag"),
            F.round("value", 4).alias("value_r"),
        )
    )


def q_length_gate(spark, sf_dir):
    """F4/F5/F7: length gates + char-truncation projection."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter((F.col("n_chars") >= 200) & (F.length("text") >= 200))
        .select("doc_id", F.substring("text", 1, 120).alias("snippet"))
    )


def q_hydration_join(spark, sf_dir):
    """J1: tiny top-k set broadcast-joined back to the row store."""
    docs = _t(spark, sf_dir, "documents")
    topk = docs.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(10).select("doc_id")
    return (
        docs.join(F.broadcast(topk), "doc_id")
        .select("doc_id", "lang", "source", "n_chars", F.substring("text", 1, 80).alias("snippet"))
    )


def q_anti_join(spark, sf_dir):
    """J2: anti-join (suppliers with no lineitem)."""
    sup = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    return sup.join(li.select("l_suppkey"), sup.s_suppkey == li.l_suppkey, "left_anti").select(
        "s_suppkey", "s_name"
    )


def q_broadcast_dim_join(spark, sf_dir):
    """Broadcast dim join + integer-exact aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_tpch_q1_like(spark, sf_dir):
    """TPC-H Q1-shaped aggregate (hash agg with partial combine)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_quantity") / F.count(F.lit(1)), 6).alias("avg_qty"),
        )
    )


def q_events_daily(spark, sf_dir):
    """Tumbling daily window aggregate over the events stream table."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def q_window_rank(spark, sf_dir):
    """§2.7: first event per user (row_number window)."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_topk_orders(spark, sf_dir):
    """T1/T5: top-k with deterministic tie-break."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
    )


def q_fingerprints(spark, sf_dir):
    """Exact-dup fingerprint groups (F11/J2 dedup key)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(normalized_fingerprint("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_id"))
    )


def q_text_features(spark, sf_dir):
    """Language-ID heuristic, quality score, token count per doc."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ws_token_count("text").alias("n_tokens"),
        F.round(alpha_ratio("text"), 6).alias("alpha_ratio"),
        F.round(stopword_ratio("text"), 6).alias("stop_ratio"),
        quality_score("text").alias("quality"),
        lang_guess("text").alias("lang_guess"),
    )


def q_jaccard_pairs(spark, sf_dir):
    """N-gram Jaccard near-dup pairs (exact, shared-shingle candidates)."""
    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs_exact(docs, col="text", threshold=0.12)


def q_cosine_topk(spark, sf_dir):
    """ANN baseline: brute-force cosine top-10 vs the vec_id=0 embedding."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return cosine_topk(emb.filter(F.col("vec_id") != 0), [float(x) for x in qvec], k=10)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs above 0.8."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(emb, threshold=0.8)


def q_shingle_count(spark, sf_dir):
    """Shingling sanity: distinct 3-gram shingle count per doc (first 50)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 50)
        .select("doc_id", F.size(word_shingles("text", 3)).alias("n_shingles"))
    )


def q_lang_token_stats(spark, sf_dir):
    """Per-lang token statistics (A3 counters analog)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ws_token_count("text")).alias("total_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


def q_sha_integrity(spark, sf_dir):
    """A4: per-row sha256 integrity fingerprint of the corpus."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2(F.col("text"), 256).alias("content_sha"))


def q_capacity_guard(spark, sf_dir):
    """A2: capacity check (reference: local_space_available, count < 1e6,
    search_provider.rs:164-166)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) < F.lit(1_000_000)).alias("within_capacity"),
    )


def q_dedup_kept(spark, sf_dir):
    """F11/J2: ids surviving exact dedup (keeper = min doc_id per
    normalized fingerprint)."""
    from dawnsearch_spark.operators.dedup import dedup_exact

    docs = _t(spark, sf_dir, "documents")
    return dedup_exact(docs).select("doc_id")


# ---- rows-only entries (no SQL-expressible oracle; the driver records a
# weaker rows-only check per the contract) ----

def q_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidates, exact-Jaccard-verified."""
    from dawnsearch_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.5, bands=8, rows_per_band=8)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs within Hamming distance 3 (banded blocking)."""
    from dawnsearch_spark.operators.dedup import simhash_near_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=3)


def q_lsh_topk(spark, sf_dir):
    """ANN scale path: hyperplane-LSH bucketed cosine top-k."""
    from dawnsearch_spark.operators.similarity import lsh_bucket_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return lsh_bucket_topk(emb.filter(F.col("vec_id") != 0), qvec, k=10, n_planes=6)


def q_ivf_topk(spark, sf_dir):
    """ANN scale path: IVF coarse-quantizer probe search."""
    from dawnsearch_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return ivf_topk(emb.filter(F.col("vec_id") != 0), qvec, k=10, n_cells=16, nprobe=4)


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary media column -> vectorized features."""
    from dawnsearch_spark.operators.multimodal import extract_features, synthesize_media

    docs = _t(spark, sf_dir, "documents").withColumnRenamed("text", "content")
    return extract_features(synthesize_media(docs.limit(100)))


# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents, hydrated (E1)."""
    sf_dir = "/root/testdata/sf0.001"
    top = _bm25_spark(spark, sf_dir, BM25_QUERY_1)
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(top), "doc_id")
        .select("doc_id", "score", "lang", "source", F.substring("text", 1, 200).alias("snippet"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "doclen_stats": q_doclen_stats,
        "term_tf": q_term_tf,
        "doc_freq": q_doc_freq,
        "bm25_topk_1": q_bm25_topk_1,
        "bm25_topk_2": q_bm25_topk_2,
        "filter_project": q_filter_project,
        "length_gate": q_length_gate,
        "hydration_join": q_hydration_join,
        "anti_join": q_anti_join,
        "broadcast_dim_join": q_broadcast_dim_join,
        "tpch_q1_like": q_tpch_q1_like,
        "events_daily": q_events_daily,
        "window_rank": q_window_rank,
        "topk_orders": q_topk_orders,
        "fingerprints": q_fingerprints,
        "text_features": q_text_features,
        "jaccard_pairs": q_jaccard_pairs,
        "cosine_topk": q_cosine_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "shingle_count": q_shingle_count,
        "lang_token_stats": q_lang_token_stats,
        "sha_integrity": q_sha_integrity,
        "capacity_guard": q_capacity_guard,
        "dedup_kept": q_dedup_kept,
        # rows-only (no oracle_sql entry; driver records weaker check):
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "lsh_topk": q_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "media_features": q_media_features,
    }


def oracle_sql() -> dict[str, str]:
    toks = _tok_sql("text")
    ws = _WS_TOKS.format(col="text")
    stop_in = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return {
        "doclen_stats": f"""
            WITH dl AS (SELECT len({toks})::BIGINT AS dl FROM documents)
            SELECT count(*) AS n_docs, sum(dl) AS total_tokens,
                   round(avg(dl), 6) AS avgdl FROM dl
        """,
        "term_tf": f"""
            SELECT term, doc_id, count(*)::BIGINT AS tf
            FROM (SELECT doc_id, unnest({toks}) AS term FROM documents)
            WHERE term LIKE 's%' GROUP BY term, doc_id
        """,
        "doc_freq": f"""
            WITH tf AS (
              SELECT doc_id, term, count(*)::BIGINT AS tf
              FROM (SELECT doc_id, unnest({toks}) AS term FROM documents)
              GROUP BY doc_id, term)
            SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
        """,
        "bm25_topk_1": _bm25_sql(BM25_QUERY_1.split()),
        "bm25_topk_2": _bm25_sql(BM25_QUERY_2.split()),
        "filter_project": """
            SELECT event_id, user_id,
                   event_type || ':' || user_id::VARCHAR AS tag,
                   round(value, 4) AS value_r
            FROM events
            WHERE event_type IN ('click', 'view') AND value > 10.0
        """,
        "length_gate": """
            SELECT doc_id, substring(text, 1, 120) AS snippet
            FROM documents WHERE n_chars >= 200 AND length(text) >= 200
        """,
        "hydration_join": """
            WITH topk AS (SELECT doc_id FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10)
            SELECT d.doc_id, d.lang, d.source, d.n_chars,
                   substring(d.text, 1, 80) AS snippet
            FROM documents d JOIN topk USING (doc_id)
        """,
        "anti_join": """
            SELECT s_suppkey, s_name FROM supplier
            WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem)
        """,
        "broadcast_dim_join": """
            SELECT p_brand, count(*)::BIGINT AS n_items,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "tpch_q1_like": """
            SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS count_order,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_quantity) / count(*), 6) AS avg_qty
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "events_daily": """
            SELECT date_trunc('day', ts) AS day, event_type,
                   count(*)::BIGINT AS n,
                   count(DISTINCT user_id)::BIGINT AS users,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "window_rank": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn = 1
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "fingerprints": """
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
                   count(*)::BIGINT AS n_dups, min(doc_id) AS keep_id
            FROM documents GROUP BY 1
        """,
        "text_features": f"""
            WITH base AS (
              SELECT doc_id, text,
                     len({ws})::BIGINT AS n_tokens,
                     CASE WHEN length(text) = 0 THEN 0.0
                          ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                               / length(text) END AS ar,
                     len(list_filter({ws}, x -> x IN ({stop_in})))::BIGINT AS stop_hits
              FROM documents),
            feat AS (
              SELECT doc_id, n_tokens, ar,
                     CASE WHEN n_tokens = 0 THEN 0.0
                          ELSE stop_hits::DOUBLE / n_tokens END AS sr
              FROM base)
            SELECT doc_id, n_tokens, round(ar, 6) AS alpha_ratio,
                   round(sr, 6) AS stop_ratio,
                   round(0.7 * ar + 0.3 * least(1.0, sr * 5.0), 6) AS quality,
                   CASE WHEN sr >= 0.05 THEN 'en' ELSE 'other' END AS lang_guess
            FROM feat
        """,
        "jaccard_pairs": f"""
            WITH sh AS (
              SELECT doc_id, list_sort(list_distinct(
                       list_transform(range(1, len({ws}) - 1),
                         i -> {ws}[i] || ' ' || {ws}[i+1] || ' ' || {ws}[i+2])
                     )) AS s
              FROM documents WHERE len({ws}) >= 3)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / len(list_distinct(a.s || b.s)), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / len(list_distinct(a.s || b.s)) >= 0.12
        """,
        # cosine written out in float64 with sequential folds so it is
        # bit-identical to the Spark zip_with/aggregate evaluation
        # (DuckDB's list_cosine_similarity computes in float32).
        "cosine_topk": f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            sc AS (
              SELECT vec_id, {_cos_sql('embedding', 'qv')} AS c
              FROM embeddings, q WHERE vec_id <> 0)
            SELECT vec_id, round(c, 6) AS cos FROM sc
            ORDER BY c DESC, vec_id LIMIT 10
        """,
        "embedding_near_dups": f"""
            WITH sc AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     {_cos_sql('a.embedding', 'b.embedding')} AS c
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, round(c, 6) AS cos FROM sc WHERE c >= 0.8
        """,
        "shingle_count": f"""
            SELECT doc_id,
                   CASE WHEN len({ws}) < 3 THEN 0
                        ELSE len(list_distinct(
                          list_transform(range(1, len({ws}) - 1),
                            i -> {ws}[i] || ' ' || {ws}[i+1] || ' ' || {ws}[i+2])))
                   END::INT AS n_shingles
            FROM documents WHERE doc_id < 50
        """,
        "lang_token_stats": f"""
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(len({ws}))::BIGINT AS total_tokens,
                   round(avg(n_chars), 6) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "sha_integrity": """
            SELECT doc_id, sha256(text) AS content_sha FROM documents
        """,
        "capacity_guard": """
            SELECT count(*) AS n_docs, count(*) < 1000000 AS within_capacity
            FROM documents
        """,
        "dedup_kept": """
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
    }
