"""Deterministic dataset splitting: stable train/val/test assignment.

``randomSplit`` is the wrong tool for a training-data pipeline: its
assignment depends on partitioning and seed plumbing, so re-running the
pipeline (or running it at a different parallelism) can move documents
between splits — a leakage hazard. The standard remedy (public
practice in every large-corpus pipeline) is CONTENT-KEYED hashing:
``bucket = int(md5(key || salt)[:8], 16) % buckets`` and threshold the
bucket. The same row lands in the same split on any cluster, any
partitioning, any engine — the gate oracle recomputes every assignment
in DuckDB from the same formula and must agree exactly.

md5 (not xxhash64) is deliberate: it is bit-identical across Spark,
DuckDB, Python, and everything else that might ever need to re-derive
the split, and this is a once-per-row cost at ingest, not a hot loop.

Scale notes: one narrow projection — no shuffle, no UDF; the expression
(md5 / substring / conv / pmod) is whole-stage-codegen'd. Changing
``salt`` re-rolls the assignment; changing split fractions only moves
rows whose bucket crosses the moved threshold (consistent-hashing
property — adding val data does not reshuffle train/test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def split_bucket(key: Column, salt: str = "split-v1") -> Column:
    """Stable bucket in [0, BUCKETS): first 8 hex chars of
    md5(key || '|' || salt) as an integer, mod BUCKETS."""
    h = F.md5(F.concat(key.cast("string"), F.lit("|" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS


def assign_splits(
    df: DataFrame,
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Adds ``split`` (and the underlying ``bucket``) columns.

    ``fractions`` maps split name -> fraction, in the order thresholds
    are carved (insertion order; the last split absorbs rounding).
    Default: train 0.8 / val 0.1 / test 0.1.
    """
    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    out = df.withColumn("bucket", split_bucket(F.col(key_col), salt))
    expr = None
    lo = 0
    names = list(fractions)
    for name in names[:-1]:
        hi = lo + int(round(fractions[name] * BUCKETS))
        cond = (F.col("bucket") >= lo) & (F.col("bucket") < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return out.withColumn("split", expr)
