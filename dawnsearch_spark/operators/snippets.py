"""Best-window snippet generation (Lucene highlighter analog).

For each candidate document, pick the window of ``window`` consecutive
tokens that contains the most DISTINCT query terms; ties break to the
earliest window. The snippet is the token window joined by single spaces
— a deterministic contract an exact SQL oracle can recompute, unlike
raw-text offsets (the code-aware tokenizer is not offset-preserving).

Reference analog: the reference hydrates a fixed-length text prefix per
result (the snippet truncation in F10 / operators/hydrate.py,
/root/reference/src/search/search_provider.rs — result rows carry the
page's stored excerpt). A query-aware best-window is the Lucene
Highlighter upgrade of that: show the user WHERE the match is.

Scale notes: this runs on candidate rows only — top-k results per query,
never the corpus (the entry joins the top-k ids into the doc scan, k
rows reach the scorer). Inside a row everything is native Column
expressions (sequence / transform / slice / array_intersect) evaluated
JVM-side in whole-stage codegen: O(dl · window) comparisons per doc, no
Python, no shuffle beyond the candidate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawnsearch_spark.functions.tokenizer import tokenize_py, tokens_col


def best_snippets(
    docs: DataFrame,
    query: str,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, snippet, n_matched) for every row of ``docs``.

    ``n_matched`` = distinct query terms inside the chosen window;
    ``snippet`` = that window's tokens joined by ' '. Earliest-window
    tie-break, so the result is unique and order-independent.
    """
    terms = sorted(set(tokenize_py(query)))
    terms_arr = F.array(*[F.lit(t) for t in terms])
    w = int(window)

    d = docs.select(F.col(id_col), tokens_col(text_col).alias("_toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.size("_toks") - F.lit(w - 1))
    )
    # score every window start: distinct query terms within the window
    scores = F.transform(
        starts,
        lambda s: F.size(
            F.array_distinct(F.array_intersect(F.slice("_toks", s, w), terms_arr))
        ),
    )
    pairs = F.zip_with(
        starts, scores, lambda s, sc: F.struct(sc.alias("sc"), s.alias("s"))
    )
    # left fold with strict > keeps the EARLIEST maximum
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("sc"), F.lit(1).alias("s")),
        lambda acc, p: F.when(p["sc"] > acc["sc"], p).otherwise(acc),
    )
    return (
        d.withColumn("_best", best)
        .select(
            F.col(id_col),
            F.array_join(F.slice("_toks", F.col("_best.s"), w), " ").alias("snippet"),
            F.col("_best.sc").cast("long").alias("n_matched"),
        )
    )
