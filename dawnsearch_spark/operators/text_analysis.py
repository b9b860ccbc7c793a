"""Text analysis for large-corpus pipelines: language-ID heuristic, quality
scoring, token counting, document fingerprinting.

Reference analogs: the ingest-time text predicates and projections
(/root/reference/src/search/page_source.rs:63-131 — length gates F4/F6,
truncation F5/F7, language filter F9 via whichlang) and URL-dedup-by-key
(/root/reference/src/search/search_provider.rs:253-263). All functions are
native Spark Column expressions (JVM codegen, no UDFs) and each has an
exact ANSI-SQL twin used by the DuckDB correctness oracle in
``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic English stopword list for the language heuristic and
# stopword-ratio quality feature (order matters nowhere; membership only).
EN_STOPWORDS = [
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "this",
]


def ws_token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of [A-Za-z] characters (0 for empty strings)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        alpha.cast("double") / total.cast("double")
    )


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    hits = F.size(F.filter(toks, lambda x: x.isin(EN_STOPWORDS)))
    n = ws_token_count(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: alpha-density + bounded
    stopword signal (stopword-free text reads as non-prose / spam)."""
    return F.round(
        F.lit(0.7) * alpha_ratio(col)
        + F.lit(0.3) * F.least(F.lit(1.0), stopword_ratio(col) * 5.0),
        6,
    )


def lang_guess(col: Column | str, threshold: float = 0.05) -> Column:
    """'en' if the stopword ratio clears the threshold, else 'other'
    (n-gram-style heuristic; reference analog F9 whichlang gate)."""
    return F.when(stopword_ratio(col) >= threshold, F.lit("en")).otherwise(F.lit("other"))


def normalized_fingerprint(col: Column | str) -> Column:
    """md5 of (lowercased, whitespace-collapsed, trimmed) text — the exact
    near-canonical-duplicate key."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(norm)


#: Rabin-Karp rolling-hash parameters: base 31, Mersenne-ish prime modulus
#: small enough that acc*31 + codepoint stays well inside int64 (no
#: overflow on either engine).
ROLLING_B = 31
ROLLING_M = 2_147_483_647

#: character trigrams over-represented in English prose — the n-gram
#: language-ID profile (a tiny fixed profile keeps the op SQL-expressible
#: and deterministic; a production profile would be learned per language).
EN_TRIGRAMS = (" th", "the", "ing", "ion", "and", " of", "ed ", " to")


def rolling_fingerprint(col: Column | str, prefix_len: int = 256) -> Column:
    """Rabin-Karp polynomial rolling hash over the codepoints of the text
    prefix: fold acc -> (acc * B + codepoint) mod M. Entirely native
    Column ops (split-to-chars + aggregate fold — JVM codegen, no UDF);
    the DuckDB twin folds ``unicode(substring(...))`` identically."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.substring(c, 1, prefix_len)
    chars = F.filter(F.split(s, ""), lambda ch: ch != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * ROLLING_B + F.ascii(ch)) % ROLLING_M,
    )


def en_trigram_chars(col: Column | str) -> Column:
    """Total characters covered by English-profile trigram occurrences in
    the lowercased text (occurrence count x 3, exact in both engines via
    length-delta after replace)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c)
    total = F.lit(0).cast("long")
    for g in EN_TRIGRAMS:
        total = total + (F.length(s) - F.length(F.replace(s, F.lit(g)))).cast("long")
    return total


def ngram_lang_guess(col: Column | str, min_chars: int = 15) -> Column:
    """'en' when the English trigram profile covers at least ``min_chars``
    characters — the brief's n-gram language-ID heuristic (complements the
    stopword-ratio gate in :func:`lang_guess`)."""
    return F.when(en_trigram_chars(col) >= min_chars, F.lit("en")).otherwise(
        F.lit("other")
    )


def repetition_stats(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals, all native Column exprs:

    * ``dup_line_ratio`` — fraction of non-blank lines that are repeats of
      an earlier line (boilerplate headers, generated code, spam padding);
    * ``dup_word_ratio`` — fraction of whitespace tokens that repeat.

    Documents heavy in either are the classic low-quality strata a
    training-data pipeline down-weights or drops; both ratios are exact
    and cheap (one pass, array ops inside codegen — no shuffle, no UDF).
    """
    c = F.col(col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n_lines = F.size(lines)
    words = F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)

    def dup_ratio(arr: Column, n: Column) -> Column:
        return F.when(n == 0, F.lit(0.0)).otherwise(
            (n - F.size(F.array_distinct(arr))).cast("double") / n.cast("double")
        )

    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        F.round(dup_ratio(lines, n_lines), 6).alias("dup_line_ratio"),
        n_words.cast("long").alias("n_words"),
        F.round(dup_ratio(words, n_words), 6).alias("dup_word_ratio"),
    )


def gopher_quality_filter(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alpha_ratio: float = 0.25,
    min_stop_hits: int = 2,
    max_dup_line_ratio: float = 0.30,
    max_dup_word_ratio: float = 0.60,
) -> DataFrame:
    """Composite Gopher/C4-style document quality filter — the standard
    pre-training corpus gate, emitted with PER-RULE flags so a pipeline
    can audit why each document passed or failed (and a driver oracle can
    check every rule independently):

    * ``ok_len``       token count within [min_tokens, max_tokens];
    * ``ok_word_len``  mean word length within bounds (symbol soup and
                       minified blobs fall outside);
    * ``ok_alpha``     alphabetic character ratio floor;
    * ``ok_stop``      at least ``min_stop_hits`` stopword tokens (the
                       Gopher "contains common words" prose signal);
    * ``ok_rep``       duplicate-line and duplicate-word ratios under
                       their caps (boilerplate / spam padding);
    * ``keep``         conjunction of all rules.

    One scan, all native Column expressions inside codegen — no UDF, no
    shuffle; at 100 TB this is a map-only pass whose output predicate
    pushes straight into the next stage's scan."""
    c = F.col(col)
    words = F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda w: w != F.lit(""))
    n = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mwl = F.when(n == 0, F.lit(0.0)).otherwise(
        sum_len.cast("double") / n.cast("double")
    )
    ar = alpha_ratio(c)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(EN_STOPWORDS)))
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)), lambda l: l != F.lit("")
    )
    n_lines = F.size(lines)
    dlr = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        (n_lines - F.size(F.array_distinct(lines))).cast("double")
        / n_lines.cast("double")
    )
    dwr = F.when(n == 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(words))).cast("double") / n.cast("double")
    )
    ok_len = (n >= min_tokens) & (n <= max_tokens)
    ok_word_len = (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
    ok_alpha = ar >= min_alpha_ratio
    ok_stop = stop_hits >= min_stop_hits
    ok_rep = (dlr <= max_dup_line_ratio) & (dwr <= max_dup_word_ratio)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(mwl, 6).alias("mean_word_len"),
        ok_len.cast("int").alias("ok_len"),
        ok_word_len.cast("int").alias("ok_word_len"),
        ok_alpha.cast("int").alias("ok_alpha"),
        ok_stop.cast("int").alias("ok_stop"),
        ok_rep.cast("int").alias("ok_rep"),
        (ok_len & ok_word_len & ok_alpha & ok_stop & ok_rep)
        .cast("int")
        .alias("keep"),
    )


def with_text_features(df: DataFrame, col: str = "text") -> DataFrame:
    """All features at once (single scan, codegen'd)."""
    return (
        df.withColumn("n_tokens", ws_token_count(col))
        .withColumn("alpha_ratio", F.round(alpha_ratio(col), 6))
        .withColumn("stop_ratio", F.round(stopword_ratio(col), 6))
        .withColumn("quality", quality_score(col))
        .withColumn("lang_guess", lang_guess(col))
        .withColumn("fingerprint", normalized_fingerprint(col))
    )
