"""Deterministic dense docID assignment without a single global sort task.

Reference analog: the reference addresses documents by SQLite rowid
(/root/reference/src/search/search_provider.rs:84-93) and maps linear ids to
(segment, offset) arithmetic in ``linear_to_segmented``
(/root/reference/examples_old/document_embeddings.rs:81-92). Here docIDs are
a dense rank over the identity key (repo, path, commit):

  1. range-partition + sort-within-partition on the key (parallel sort,
     no global single-reducer stage);
  2. count rows per partition (tiny aggregate);
  3. broadcast-join cumulative offsets and add the within-partition
     row_number.

The intermediate is persisted so the range boundaries (sampled) are stable
across the two passes (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_doc_ids(
    df: DataFrame,
    id_cols: tuple[str, ...],
    parts: int | None = None,
    dedup_order_col: str | None = None,
) -> DataFrame:
    """Returns ``df`` + ``doc_id`` (long, dense 0..N-1, ordered by id_cols).

    With ``dedup_order_col`` set, identity-key duplicates are dropped first
    (keeper = smallest ``dedup_order_col`` per key) INSIDE the same range
    partitioning used for id assignment: equal keys land in one partition
    and sort adjacently, so dedup is a lag-compare over the partition sort
    — no extra shuffle versus a separate ``Window.partitionBy(id_cols)``
    pass (reference dedups on every insert, search_provider.rs:253-263).
    """
    parts = parts or df.sparkSession.sparkContext.defaultParallelism
    sort_cols = [*id_cols] + ([dedup_order_col] if dedup_order_col else [])
    ranged = (
        df.repartitionByRange(parts, *[F.col(c) for c in id_cols])
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    if dedup_order_col:
        w_d = Window.partitionBy("_pid").orderBy(*sort_cols)
        key = F.struct(*[F.col(c) for c in id_cols])
        ranged = (
            ranged.withColumn("_dup", F.lag(key).over(w_d) == key)
            .filter(~F.coalesce(F.col("_dup"), F.lit(False)))
            .drop("_dup")
        )
    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = ranged.groupBy("_pid").count()
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_off")
    )
    w_rn = Window.partitionBy("_pid").orderBy(*sort_cols)
    out = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("doc_id", (F.row_number().over(w_rn) + F.col("_off") - F.lit(1)).cast("long"))
        .drop("_pid", "_off")
    )
    return out
