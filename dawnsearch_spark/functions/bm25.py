"""BM25 scoring kernels (NumPy + Spark Column twins, tested equal).

Replaces the reference's vector distance kernels
(/root/reference/src/search/vector.rs:94-163: L2 / inner-product / cosine /
bounded / quantized variants) as the engine's ranking function, per the
north rule. Lucene-style positive IDF so scores are always >= 0:

    idf(t)        = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    score(t, d)   = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Constants k1/b/top_k are pinned in EngineConfig (BASELINE.md). All float
math is float64 for rank stability (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def idf_np(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_np(
    tf: np.ndarray,
    dl: np.ndarray,
    idf: np.ndarray | float,
    avgdl: float,
    k1: float,
    b: float,
) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def idf_col(df_col: Column, n_docs: Column | float) -> Column:
    n = F.lit(float(n_docs)) if not isinstance(n_docs, Column) else n_docs
    d = df_col.cast("double")
    return F.log((n - d + F.lit(0.5)) / (d + F.lit(0.5)) + F.lit(1.0))


def bm25_col(
    tf_col: Column,
    dl_col: Column,
    idf: Column,
    avgdl: Column | float,
    k1: float,
    b: float,
) -> Column:
    a = F.lit(float(avgdl)) if not isinstance(avgdl, Column) else avgdl
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    return idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / a))
