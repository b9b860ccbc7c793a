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


def assign_doc_ids(df: DataFrame, id_cols: tuple[str, ...], parts: int | None = None) -> DataFrame:
    """Returns ``df`` + ``doc_id`` (long, dense 0..N-1, ordered by id_cols)."""
    parts = parts or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *[F.col(c) for c in id_cols])
        .sortWithinPartitions(*id_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = ranged.groupBy("_pid").count()
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_off")
    )
    w_rn = Window.partitionBy("_pid").orderBy(*id_cols)
    out = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("doc_id", (F.row_number().over(w_rn) + F.col("_off") - F.lit(1)).cast("long"))
        .drop("_pid", "_off")
    )
    return out
