"""Boolean / phrase query surface over the lexical engine.

Reference analog: the reference's entire query surface is one ANN call
(/root/reference/src/search/search_provider.rs:214) — it has no phrase or
boolean operators. A fulltext index that users would actually switch to
needs the classic query language on top of BM25, so this module adds the
three standard compositions, each expressed Spark-first over the same TF
relation the scorer uses (operators/tf.py):

* :func:`phrase_topk`   — "exact phrase" ranking. Candidate docs are found
  by POSTINGS INTERSECTION (all phrase terms present — a groupBy over the
  query terms' TF rows only, shuffle proportional to those postings, never
  the corpus), and token adjacency is then verified by re-tokenizing ONLY
  the candidate rows (broadcast hash join into the doc scan, vectorized
  shift-AND inside ``mapInPandas``). At 100 TB the candidate set is bounded
  by the rarest term's df, so the expensive content pass touches a sliver
  of the table; everything before it is doc_id-only traffic. Scoring is
  BM25 with the phrase as a single synthetic term (Lucene PhraseQuery
  semantics: tf = number of phrase occurrences, df = number of docs
  containing the phrase).

* :func:`boolean_topk`  — must / should / must_not (Lucene BooleanQuery
  semantics): must terms are a containment requirement AND score
  contributors, should terms contribute score only, must_not excludes.
  Containment is the same postings intersection; exclusion is a broadcast
  left-anti join on the must_not postings' doc_ids. Per-doc scores fold in
  ascending-term order (array_sort + aggregate) for bitwise-reproducible
  float64 sums, exactly like the exact scorer (operators/oracle.py).

* :func:`facet_counts`  — facet aggregation over the FULL match set (OR
  semantics), the search-engine sidebar: one distinct pass over the query
  terms' postings for match ids, one co-partitioned join against the
  forward index, one explode-to-(facet, value) aggregate — a single
  shuffle regardless of how many facet columns are requested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dawnsearch_spark.config import EngineConfig
from dawnsearch_spark.functions.bm25 import bm25_col, idf_col
from dawnsearch_spark.functions.tokenizer import tokenize_py
from dawnsearch_spark.operators.tf import CorpusStats


def _near_hits(tokens: np.ndarray, ta: str, tb: str, window: int) -> int:
    """Number of ``ta`` positions with a ``tb`` within ``window`` tokens
    (unordered) — sorted-merge nearest-neighbor, no quadratic pair scan."""
    pa = np.flatnonzero(tokens == ta)
    pb = np.flatnonzero(tokens == tb)
    if not len(pa) or not len(pb):
        return 0
    j = np.searchsorted(pb, pa)
    big = np.iinfo(np.int64).max
    left = np.where(j > 0, pa - pb[np.maximum(j - 1, 0)], big)
    right = np.where(j < len(pb), pb[np.minimum(j, len(pb) - 1)] - pa, big)
    return int((np.minimum(left, right) <= window).sum())


def _phrase_hits(tokens: np.ndarray, terms: list[str]) -> int:
    """Number of positions where ``terms`` occurs contiguously in
    ``tokens`` — vectorized shift-AND (one boolean array op per phrase
    term, no per-position Python loop)."""
    m = len(terms)
    n = len(tokens)
    if n < m:
        return 0
    mask = tokens[: n - m + 1] == terms[0]
    for j in range(1, m):
        mask &= tokens[j : n - m + 1 + j] == terms[j]
    return int(mask.sum())


def _flatten_tokens(toks: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat, seg, dl) for a Series of token lists: one concatenated token
    array, each token's doc ordinal, and per-doc token counts — the
    NumPy REFERENCE implementation of ``tokenize_flat_arrow``'s output
    contract (production paths use the arrow kernel; the equivalence
    tests pin the two against each other). The batch matchers below run
    ONE vectorized pass over ``flat`` instead of a per-document Python
    call — the per-doc loop's fixed NumPy overhead (~tens of µs x 10^5
    candidate docs) dominated positional verification."""
    dl = toks.str.len().fillna(0).to_numpy(np.int64)
    ex = toks.explode()
    ex = ex[ex.notna()]
    flat = ex.to_numpy()
    seg = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
    return flat, seg, dl


def _term_eq(flat, term: str) -> np.ndarray:
    """Elementwise token == term as a numpy bool array; ``flat`` may be a
    numpy object array or a pyarrow StringArray (C++-kernel equality —
    the arrow flat tokenizer's output is matched without ever
    materializing Python strings)."""
    if isinstance(flat, np.ndarray):
        return flat == term
    import pyarrow.compute as pc

    return pc.equal(flat, term).to_numpy(zero_copy_only=False)


def _phrase_hits_flat(
    flat, seg: np.ndarray, n_docs: int, terms: list[str]
) -> np.ndarray:
    """Per-doc contiguous-occurrence counts over a flattened token batch —
    value-identical to :func:`_phrase_hits` per doc (windows crossing a
    doc boundary are excluded by the segment-equality mask)."""
    m = len(terms)
    n = len(flat)
    out_n = n - m + 1
    if out_n <= 0:
        return np.zeros(n_docs, np.int64)
    eqs = [_term_eq(flat, t) for t in dict.fromkeys(terms)]
    by_term = {t: e for t, e in zip(dict.fromkeys(terms), eqs)}
    mask = by_term[terms[0]][:out_n].copy()
    for j in range(1, m):
        mask &= by_term[terms[j]][j : out_n + j]
    if m > 1:
        mask &= seg[:out_n] == seg[m - 1 :]
    return np.bincount(seg[:out_n][mask], minlength=n_docs)


def _near_hits_flat(
    flat,
    seg: np.ndarray,
    n_docs: int,
    ta: str,
    tb: str,
    window: int,
) -> np.ndarray:
    """Per-doc NEAR counts over a flattened token batch — value-identical
    to :func:`_near_hits` per doc: a doc's ``tb`` positions form a
    contiguous run of the global sorted position list, so the global
    nearest predecessor/successor IS the same-doc one whenever a same-doc
    one exists, and the segment check drops cross-doc neighbors."""
    pa = np.flatnonzero(_term_eq(flat, ta))
    pb = np.flatnonzero(_term_eq(flat, tb))
    if not len(pa) or not len(pb):
        return np.zeros(n_docs, np.int64)
    sa = seg[pa]
    sb = seg[pb]
    j = np.searchsorted(pb, pa)
    big = np.iinfo(np.int64).max
    jl = np.maximum(j - 1, 0)
    left = np.where(
        (j > 0) & (sb[jl] == sa), pa - pb[jl], big
    )
    jr = np.minimum(j, len(pb) - 1)
    right = np.where(
        (j < len(pb)) & (sb[jr] == sa), pb[jr] - pa, big
    )
    hits = np.minimum(left, right) <= window
    return np.bincount(sa[hits], minlength=n_docs)


def phrase_topk(
    docs: DataFrame,
    tf: DataFrame,
    stats: CorpusStats,
    phrase: str,
    cfg: EngineConfig,
    k: int | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Exact-phrase BM25 top-k: (doc_id, phrase_tf, score).

    ``tf`` is the (term, doc_id, dl, tf) relation (or the index's postings
    projected to that shape); ``stats`` the corpus stats the index already
    holds. The phrase scores as one synthetic term: tf = occurrence count,
    df = matching-doc count, dl/avgdl as usual.
    """
    k = k or cfg.top_k
    terms = tokenize_py(phrase)
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, phrase_tf long, score double"
        )
    uniq = sorted(set(terms))

    # 1. containment pruning: docs holding ALL phrase terms. Only the
    # query terms' postings flow into this shuffle; (term, doc_id) is
    # unique in tf so count(*) == |uniq| is the intersection test.
    cand = (
        tf.filter(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == len(uniq))
        .select("doc_id")
    )

    # 2. adjacency verification over candidate rows only (broadcast hash
    # join — the candidate side is bounded by min df over the phrase
    # terms; the corpus scan streams, nothing shuffles).
    cand_docs = docs.select("doc_id", content_col).join(F.broadcast(cand), "doc_id")

    phrase_terms = terms  # closure for the Arrow batches

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dawnsearch_spark.functions.tokenizer import tokenize_flat_arrow

        for pdf in batches:
            if not len(pdf):
                continue
            flat, seg, dl = tokenize_flat_arrow(pdf[content_col])
            ptf = _phrase_hits_flat(flat, seg, len(dl), phrase_terms)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "dl": dl,
                    "phrase_tf": ptf,
                }
            )

    matched = cand_docs.mapInPandas(
        gen, "doc_id long, dl long, phrase_tf long"
    ).filter(F.col("phrase_tf") > 0)

    # 3. BM25 with the phrase as a single term; df comes from the match
    # set itself. A global window count (single-partition exchange of the
    # NARROW matched rows only) instead of an aggregate + crossJoin: the
    # aggregate formulation recomputed the whole candidate tokenize
    # pipeline a second time for the re-join.
    from pyspark.sql import Window

    scored = matched.withColumn(
        "_dfp",
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(0))).cast("double"),
    ).withColumn(
        "score",
        bm25_col(
            F.col("phrase_tf"),
            F.col("dl"),
            idf_col(F.col("_dfp"), float(stats.n_docs)),
            stats.avgdl,
            cfg.k1,
            cfg.b,
        ),
    )
    return (
        scored.select("doc_id", "phrase_tf", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def boolean_topk(
    tf: DataFrame,
    term_stats: DataFrame,
    stats: CorpusStats,
    cfg: EngineConfig,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    k: int | None = None,
) -> DataFrame:
    """Lucene-style boolean BM25 top-k: (doc_id, score).

    must      — every term required in the doc; contributes score.
    should    — optional; contributes score when present.
    must_not  — any occurrence excludes the doc (broadcast anti-join).

    df for each scoring term is the corpus-wide document frequency from
    ``term_stats`` (containment does NOT reweight idf — Lucene semantics),
    and the per-doc sum folds in ascending-term order for reproducibility.
    """
    spark = tf.sparkSession
    k = k or cfg.top_k
    must_t = sorted({t for s in (must or []) for t in tokenize_py(s)})
    should_t = sorted({t for s in (should or []) for t in tokenize_py(s)})
    not_t = sorted({t for s in (must_not or []) for t in tokenize_py(s)})
    score_t = sorted(set(must_t) | set(should_t))
    if not score_t:
        return spark.createDataFrame([], "doc_id long, score double")

    q = spark.createDataFrame(
        [(t, t in must_t) for t in score_t], "term string, is_must boolean"
    )
    tfq = tf.join(F.broadcast(q), "term").join(
        F.broadcast(term_stats.select("term", "df").join(q, "term", "left_semi")),
        "term",
    )
    tscore: Column = bm25_col(
        F.col("tf"),
        F.col("dl"),
        idf_col(F.col("df"), float(stats.n_docs)),
        stats.avgdl,
        cfg.k1,
        cfg.b,
    )
    per_doc = (
        tfq.withColumn("tscore", tscore)
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("term", "tscore"))).alias("_parts"),
            F.sum(F.when(F.col("is_must"), 1).otherwise(0)).alias("_nmust"),
        )
        .filter(F.col("_nmust") == len(must_t))
        .select(
            "doc_id",
            F.aggregate("_parts", F.lit(0.0), lambda acc, x: acc + x["tscore"]).alias(
                "score"
            ),
        )
    )
    if not_t:
        excl = tf.filter(F.col("term").isin(not_t)).select("doc_id").distinct()
        per_doc = per_doc.join(F.broadcast(excl), "doc_id", "left_anti")
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def prefix_topk(
    tf: DataFrame,
    term_stats: DataFrame,
    stats: CorpusStats,
    prefix: str,
    cfg: EngineConfig,
    k: int | None = None,
    max_expansion: int = 128,
) -> DataFrame:
    """Prefix (wildcard ``pre*``) BM25 top-k: (doc_id, score).

    Lucene PrefixQuery rewrite: the prefix expands against the term
    dictionary into at most ``max_expansion`` concrete terms (highest-df
    first, term as tie-break — the deterministic analog of Lucene's
    rewrite cap), then scores as a pure-OR boolean query with qtf=1 per
    expanded term. The expansion collect is bounded metadata (<= cap
    rows), never postings.
    """
    pre = tokenize_py(prefix)
    if len(pre) != 1:
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")
    exp = [
        r["term"]
        for r in term_stats.filter(F.col("term").startswith(pre[0]))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansion)
        .collect()
    ]
    if not exp:
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")
    return boolean_topk(tf, term_stats, stats, cfg, should=exp, k=k)


def fuzzy_topk(
    tf: DataFrame,
    term_stats: DataFrame,
    stats: CorpusStats,
    term: str,
    cfg: EngineConfig,
    k: int | None = None,
    max_edits: int = 1,
    max_expansion: int = 50,
) -> DataFrame:
    """Fuzzy-term BM25 top-k (Lucene FuzzyQuery shape): expand the query
    term to every dictionary term within ``max_edits`` Levenshtein edits
    (JVM-side ``F.levenshtein`` over the terms relation — a metadata scan,
    never postings; Lucene walks an FST automaton for the same set), cap
    deterministically (distance asc, df desc, term asc), then score the
    expansion as a pure-OR boolean query."""
    q = tokenize_py(term)
    if len(q) != 1:
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")
    exp = [
        r["term"]
        for r in term_stats.withColumn(
            "_d", F.levenshtein(F.col("term"), F.lit(q[0]))
        )
        .filter(F.col("_d") <= max_edits)
        .orderBy(F.asc("_d"), F.desc("df"), F.asc("term"))
        .limit(max_expansion)
        .collect()
    ]
    if not exp:
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")
    return boolean_topk(tf, term_stats, stats, cfg, should=exp, k=k)


def regex_expand(
    term_stats: DataFrame, pattern: str, max_expansion: int = 128
) -> list[str]:
    """Full-match regex expansion against the term dictionary (Lucene
    RegexpQuery: the automaton must accept the ENTIRE term, so the
    pattern is anchored). JVM-side ``rlike`` over the terms relation — a
    bounded metadata scan, never postings; Lucene intersects an FST for
    the same set. Deterministic cap: df desc, term asc."""
    anchored = f"^(?:{pattern})$"
    return [
        r["term"]
        for r in term_stats.filter(F.col("term").rlike(anchored))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansion)
        .collect()
    ]


def wildcard_to_regex(pattern: str) -> str:
    """Lucene WildcardQuery translation: ``*`` -> ``.*``, ``?`` -> ``.``,
    everything else regex-escaped. The wildcard surface is sugar over the
    regex rewrite path."""
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def regex_topk(
    tf: DataFrame,
    term_stats: DataFrame,
    stats: CorpusStats,
    pattern: str,
    cfg: EngineConfig,
    k: int | None = None,
    max_expansion: int = 128,
) -> DataFrame:
    """Regex term query BM25 top-k (Lucene RegexpQuery shape): full-match
    dictionary expansion (:func:`regex_expand`), then pure-OR scoring with
    qtf=1 per expanded term — the same rewrite contract as prefix/fuzzy."""
    exp = regex_expand(term_stats, pattern, max_expansion)
    if not exp:
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")
    return boolean_topk(tf, term_stats, stats, cfg, should=exp, k=k)


def wildcard_topk(
    tf: DataFrame,
    term_stats: DataFrame,
    stats: CorpusStats,
    pattern: str,
    cfg: EngineConfig,
    k: int | None = None,
    max_expansion: int = 128,
) -> DataFrame:
    """Wildcard (``te?m*``) BM25 top-k: translate to the regex rewrite."""
    return regex_topk(
        tf, term_stats, stats, wildcard_to_regex(pattern.lower()), cfg, k, max_expansion
    )


def near_topk(
    docs: DataFrame,
    tf: DataFrame,
    stats: CorpusStats,
    term_a: str,
    term_b: str,
    window: int,
    cfg: EngineConfig,
    k: int | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Proximity (NEAR/n) BM25 top-k: (doc_id, prox_tf, score).

    Matches docs where ``term_a`` occurs within ``window`` token positions
    of ``term_b`` (unordered). prox_tf = number of term_a positions with a
    term_b neighbor in range; the pair scores as one synthetic BM25 term
    (tf = prox_tf, df = matching docs) — the same sloppy-phrase shape as
    :func:`phrase_topk`, and the same scale plan: postings intersection
    prunes candidates, only candidate rows are re-tokenized.
    """
    k = k or cfg.top_k
    ta = tokenize_py(term_a)
    tb = tokenize_py(term_b)
    if len(ta) != 1 or len(tb) != 1:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, prox_tf long, score double"
        )
    ta, tb = ta[0], tb[0]
    cand = (
        tf.filter(F.col("term").isin([ta, tb]))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == 2)
        .select("doc_id")
    )
    cand_docs = docs.select("doc_id", content_col).join(F.broadcast(cand), "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dawnsearch_spark.functions.tokenizer import tokenize_flat_arrow

        for pdf in batches:
            if not len(pdf):
                continue
            flat, seg, dl = tokenize_flat_arrow(pdf[content_col])
            prox = _near_hits_flat(flat, seg, len(dl), ta, tb, window)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "dl": dl,
                    "prox_tf": prox,
                }
            )

    matched = cand_docs.mapInPandas(
        gen, "doc_id long, dl long, prox_tf long"
    ).filter(F.col("prox_tf") > 0)
    # global window count instead of aggregate + crossJoin — one pass over
    # the candidate tokenize pipeline (see phrase_topk)
    from pyspark.sql import Window

    scored = matched.withColumn(
        "_dfp",
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(0))).cast("double"),
    ).withColumn(
        "score",
        bm25_col(
            F.col("prox_tf"),
            F.col("dl"),
            idf_col(F.col("_dfp"), float(stats.n_docs)),
            stats.avgdl,
            cfg.k1,
            cfg.b,
        ),
    )
    return (
        scored.select("doc_id", "prox_tf", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def facet_counts(
    docs: DataFrame,
    tf: DataFrame,
    query: str,
    facet_cols: list[str],
) -> DataFrame:
    """Facet aggregation over the full OR-match set: (facet, value, n_docs).

    The match set (docs containing >= 1 query term) comes from the query
    terms' postings only — a distinct over doc_id, no content touched.
    Facet columns ride one co-partitioned join against the forward index
    and a single explode-to-pairs aggregate, so adding facets adds zero
    shuffles.
    """
    terms = sorted(set(tokenize_py(query)))
    matched = (
        tf.filter(F.col("term").isin(terms)).select("doc_id").distinct()
    )
    joined = docs.select("doc_id", *facet_cols).join(matched, "doc_id")
    pairs = joined.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("facet"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in facet_cols
                ]
            )
        ).alias("fv")
    )
    return (
        pairs.select("fv.facet", "fv.value")
        .groupBy("facet", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def suggest_terms(
    term_stats: DataFrame, prefix: str, n: int = 10
) -> DataFrame:
    """Autocomplete suggester (Lucene suggest module analog): the top-n
    dictionary terms under a prefix, ranked by collection frequency
    (cf desc, term asc — "most typed continuation first"). A bounded
    metadata scan of the terms relation; never touches postings. The
    same relation serves the index path (``Engine.suggest``), so batch
    and served answers are identical by construction."""
    pre = tokenize_py(prefix)
    if len(pre) != 1:
        return term_stats.sparkSession.createDataFrame([], "term string, cf long")
    return (
        term_stats.filter(F.col("term").startswith(pre[0]))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(n)
        .select("term", F.col("cf").cast("long").alias("cf"))
    )


def spellcheck(
    term_stats: DataFrame,
    word: str,
    max_edits: int = 2,
    n: int = 5,
) -> DataFrame:
    """Did-you-mean suggestions (Lucene DirectSpellChecker analog):
    dictionary terms within ``max_edits`` Levenshtein edits of ``word``
    (the word itself excluded — suggestions are alternatives), ranked
    distance asc, df desc, term asc, top-n. JVM-side ``F.levenshtein``
    over the terms relation — bounded metadata, never postings."""
    q = tokenize_py(word)
    if len(q) != 1:
        return term_stats.sparkSession.createDataFrame(
            [], "term string, distance int, df long"
        )
    return (
        term_stats.withColumn("distance", F.levenshtein(F.col("term"), F.lit(q[0])))
        .filter((F.col("distance") <= max_edits) & (F.col("distance") > 0))
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(n)
        .select("term", "distance", F.col("df").cast("long").alias("df"))
    )


def grouped_topk(
    docs: DataFrame,
    scored: DataFrame,
    group_col: str,
    per_group: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Result grouping / field collapsing (Lucene grouping module): the
    top ``per_group`` hits per value of ``group_col``, ranked by score
    (doc_id tie-break) — the diversified result page ("best 3 per
    language/site"). ``scored`` is any (doc_id, score) relation — the
    exact scorer or the WAND serving path's output.

    Scale notes: the group attribute joins onto the SCORED set (top-k or
    match set, orders of magnitude under the corpus), then one window
    rank per group — a shuffle over scored rows only; the corpus-side
    join prunes by doc_id."""
    from pyspark.sql import Window as W

    g = scored.join(docs.select(id_col, group_col), id_col)
    w = W.partitionBy(group_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        g.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= per_group)
        .select(id_col, group_col, "score", "rank_in_group")
    )


def synonym_topk(
    tf: DataFrame,
    term_stats: DataFrame,
    stats: CorpusStats,
    synonyms: list[str],
    cfg: EngineConfig,
    k: int | None = None,
) -> DataFrame:
    """Lucene SynonymQuery semantics: a synonym group scores as ONE
    pseudo-term — per-doc tf is the SUM over the group's terms, df is the
    MAX over the group (not the union-doc count: Lucene's documented
    SynonymQuery/BlendedTermQuery contract, which keeps a rare synonym
    from inflating idf). One pass over the group's postings; shuffle
    bounded by those postings only."""
    k = k or cfg.top_k
    terms = sorted({t for s in synonyms for t in tokenize_py(s)})
    spark = tf.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    dfx = (
        term_stats.filter(F.col("term").isin(terms))
        .agg(F.max("df").alias("df"))
        .collect()[0]["df"]
    )
    if dfx is None:
        return spark.createDataFrame([], "doc_id long, score double")
    merged = (
        tf.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("tf"), F.first("dl").alias("dl"))
    )
    scored = merged.withColumn(
        "score",
        bm25_col(
            F.col("tf"),
            F.col("dl"),
            idf_col(F.lit(float(dfx)), float(stats.n_docs)),
            stats.avgdl,
            cfg.k1,
            cfg.b,
        ),
    )
    return (
        scored.select("doc_id", F.col("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
