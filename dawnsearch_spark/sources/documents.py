"""Document source layer: Iceberg-first with parquet fallback (S3 analog).

The brief's ``input_hint`` names the corpus an **Iceberg table of
source-code repositories** with columns (repo, path, commit, lang,
content). Reference analog: the durable row store the index is rebuilt
from (/root/reference/src/search/search_provider.rs:84-99, and the
load-else-rebuild boot path :111-120) — here the table of record the
engine scans, with the same "snapshot I can rebuild from" semantics
carried by Iceberg snapshot ids.

One read surface for build/bench/entry:

* ``format="iceberg"`` — ``spark.read.format("iceberg")`` over a catalog
  identifier (``db.tbl``) or a path-based table (hadoop catalog). Snapshot
  pinning (``snapshot_id`` / ``as_of_timestamp``) maps to the reference's
  checkpoint-load; partition pruning, column projection and doc_id-range
  predicates push into the Iceberg DSv2 scan exactly as they do for
  parquet (Catalyst sees both as v2 scans with pushdown).
* ``format="parquet"`` — plain parquet directory (this sandbox's path:
  no Iceberg runtime jars are baked into the container).
* ``format="auto"`` (default) — detect an Iceberg table layout
  (``metadata/*.metadata.json``) and use iceberg, else parquet.

Scale note: both sources are columnar + split-parallel, so nothing
downstream changes shape — ``build_index`` keeps pushing ``doc_id`` range
predicates and reading only (doc_id, content) whichever source is active.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def is_iceberg_table_path(location: str) -> bool:
    """True when ``location`` looks like an Iceberg table directory
    (a ``metadata/`` dir containing ``*.metadata.json``). Only meaningful
    for local/posix paths; catalog identifiers return False."""
    meta = os.path.join(location, "metadata")
    if not os.path.isdir(meta):
        return False
    return bool(glob.glob(os.path.join(meta, "*.metadata.json")))


def _iceberg_available(spark: SparkSession) -> bool:
    """Whether the Iceberg DSv2 connector is on the classpath."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — classpath probe, no data access
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_documents(
    spark: SparkSession,
    location: str,
    format: str = "auto",
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
) -> DataFrame:
    """Load the documents table from ``location``.

    ``location`` is an Iceberg catalog identifier, an Iceberg table path,
    or a parquet directory. ``snapshot_id`` / ``as_of_timestamp`` pin an
    Iceberg snapshot (ignored for parquet). Raises a clear error when an
    Iceberg source is requested (explicitly or detected) but the runtime
    has no Iceberg connector — silently reading an Iceberg table's bare
    ``data/`` files would ignore delete files and serve wrong rows.
    """
    fmt = format.lower()
    if fmt not in ("auto", "iceberg", "parquet"):
        raise ValueError(f"unknown source format {format!r}")
    looks_iceberg = fmt == "iceberg" or (fmt == "auto" and is_iceberg_table_path(location))
    if looks_iceberg:
        if not _iceberg_available(spark):
            raise RuntimeError(
                f"{location!r} is an Iceberg table but the Spark runtime has no "
                "Iceberg connector (add iceberg-spark-runtime to spark.jars.packages); "
                "refusing to read bare data files — that would ignore snapshot/"
                "delete metadata"
            )
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp))
        return reader.load(location)
    return spark.read.parquet(location)
