"""Index build orchestration: resumable, checkpointed, lineage-counted.

End-to-end build (SURVEY.md §3 E3 mapping):

    documents ──(stage 0)── docID assignment + forward index parquet
               ──(stage 1)── corpus stats + term dictionary (df/cf/heavy)
               ──(stage 2)── per-group posting runs   [checkpoint granule]
               ──(stage 3)── k-way merge -> block-max segments

Reference analogs: the ingestion loop feeding an ever-growing index with a
periodic Save (/root/reference/src/index/extraction_service.rs:34-61;
/root/reference/src/bin/dawnsearch.rs:80-88) becomes a partition-wise batch
build where each **build group** (a contiguous docID range) commits an
atomic manifest; a killed build re-runs only uncommitted groups
(load-else-rebuild, search_provider.rs:111-120). Lineage counters per
group/bucket (docs, postings, terms, bytes) are the stats the reference
serves via Announce (search_provider.rs:328-332).

Scale notes (100 TB thinking):
* stage 2 re-tokenizes its group instead of materializing a global TF
  table — tokenize is JVM-regex (cheap, codegen) while a TF parquet would
  be roughly index-sized write+read IO;
* the only wide shuffles are groupBy(term,doc) TF aggregation (map-side
  partial combine) and the salted (term, salt) run shuffle — both bounded
  per reducer by ``range_size`` for heavy terms;
* group scans push ``doc_id`` range predicates into the forward-index
  parquet (written range-partitioned by doc_id, so file pruning applies).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawnsearch_spark.config import EngineConfig
from dawnsearch_spark.manifest import (
    MANIFEST_DIR as MANIFEST_DIR_NAME,
    config_fingerprint,
    dir_bytes,
    is_committed,
    read_manifest,
    write_manifest,
)
from dawnsearch_spark.operators.docids import assign_doc_ids
from dawnsearch_spark.operators.postings import (
    build_posting_miniruns,
    reclassify_runs,
)
from dawnsearch_spark.operators.tf import (
    CorpusStats,
    document_frequencies_fast,
)


@dataclass(frozen=True)
class IndexPaths:
    root: str

    @property
    def documents(self) -> str:
        return os.path.join(self.root, "documents")

    @property
    def terms(self) -> str:
        return os.path.join(self.root, "terms")

    @property
    def runs(self) -> str:
        return os.path.join(self.root, "runs")

    @property
    def segments(self) -> str:
        return os.path.join(self.root, "segments")


def segment_generations(root: str) -> list[dict]:
    """The committed segment generation list from the segments manifest
    (empty for an empty index or a legacy/uncommitted one)."""
    m = read_manifest(root, "segments") or {}
    return list(m.get("generations") or [])


def read_segments(spark: SparkSession, root: str) -> DataFrame:
    """The serving segments relation = union of the MANIFEST-LISTED
    generation directories (partition columns ``gen`` and ``bucket`` are
    preserved via basePath, so bucket pruning still prunes files). Only
    manifest-listed generations are read — a crash between a compaction's
    manifest commit and its old-directory cleanup must not double-serve
    postings. Falls back to a root read for an empty index."""
    paths = IndexPaths(root)
    gens = segment_generations(root)
    if not gens:
        return spark.read.parquet(paths.segments)
    # rows == 0 generations (an all-empty-content append) have no
    # schema-bearing files — they carry nothing and are skipped
    dirs = [
        os.path.join(paths.segments, f"gen={int(g['gen'])}")
        for g in gens
        if int(g.get("rows", 0)) > 0
    ]
    if not dirs:
        from dawnsearch_spark.operators.merge import SEGMENT_SCHEMA

        return spark.createDataFrame([], SEGMENT_SCHEMA)
    return spark.read.option("basePath", paths.segments).parquet(*dirs)


def _ceil_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _has_success(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _doc_partitions(cfg: EngineConfig, n_groups: int, n_docs: int) -> int:
    """Forward-index file count. It bounds the task parallelism of every
    downstream tokenize stage (stage-2 group scans read a doc_id range = a
    subset of these files), so it scales up to ``build_partitions`` for a
    large corpus — but is also capped by the data (≈2.5k docs per file):
    on this host each write task costs whole seconds of fixed overhead, so
    32 near-empty files for a 20k-doc corpus measurably slow the build
    without adding any usable parallelism."""
    by_data = max(1, n_docs // 2500)
    return max(n_groups, min(cfg.build_partitions, by_data))


def _plan_groups(
    root: str, n_docs: int, n_groups: int, range_size: int, fp: str
) -> list[tuple[int, int, int, bool]]:
    """(group_id, doc_lo, doc_hi, committed) spans covering [0, n_docs).

    Committed groups (manifest present, same fingerprint) keep their
    recorded spans; uncovered docs get new range-aligned spans. Build
    groups are contiguous by construction, so coverage is a prefix."""
    from dawnsearch_spark.manifest import list_manifests

    committed = []
    for name, m in list_manifests(root).items():
        if name.startswith("runs_group_") and m.get("fingerprint") == fp:
            committed.append((int(m["group"]), int(m["doc_lo"]), int(m["doc_hi"])))
    committed.sort()
    plan = [(g, lo, hi, True) for g, lo, hi in committed]
    covered = max((hi for _, _, hi in committed), default=0)
    next_g = max((g for g, _, _ in committed), default=-1) + 1
    if covered < n_docs:
        remaining = n_docs - covered
        gsize = _ceil_to(max(1, (remaining + n_groups - 1) // n_groups), range_size)
        lo = covered
        while lo < n_docs:
            hi = min(lo + gsize, n_docs)
            plan.append((next_g, lo, hi, False))
            next_g += 1
            lo = hi
    return plan


def _pa_files(path: str) -> list[str] | None:
    """Local parquet part files of a directory, or None when the path is
    not a plain local directory (callers fall back to Spark)."""
    import glob as _glob

    if "://" in path or not os.path.isdir(path):
        return None
    return sorted(_glob.glob(os.path.join(path, "*.parquet")))


def _pa_read(path_or_files, columns=None):
    """Driver-side pyarrow table read (no Spark job), or None."""
    files = (
        _pa_files(path_or_files)
        if isinstance(path_or_files, str)
        else path_or_files
    )
    if files is None:
        return None
    import pyarrow as pa
    import pyarrow.dataset as pads

    if not files:
        return pa.table({c: [] for c in (columns or [])})
    return pads.dataset(files, format="parquet").to_table(columns=columns)


def _pa_count_max(path: str, col: str) -> tuple[int, int | None] | None:
    """(row count, max(col)) from parquet FOOTER metadata only — the
    exact values a Spark count/max job returns, read without a job.
    None when the directory is not local or any row group lacks
    statistics (caller falls back to Spark)."""
    files = _pa_files(path)
    if files is None:
        return None
    import pyarrow.parquet as papq

    total = 0
    mx: int | None = None
    for f in files:
        md = papq.ParquetFile(f).metadata
        total += md.num_rows
        if md.num_rows == 0:
            continue
        ci = None
        rg0 = md.row_group(0)
        for j in range(rg0.num_columns):
            if rg0.column(j).path_in_schema == col:
                ci = j
                break
        if ci is None:
            return None
        for rg in range(md.num_row_groups):
            c = md.row_group(rg).column(ci)
            st = c.statistics
            if st is None or not st.has_min_max:
                return None
            v = int(st.max)
            mx = v if mx is None else max(mx, v)
    return total, mx


def gc_run_dirs(root: str, log=lambda m: None) -> list[int]:
    """Delete run-group directories whose postings are fully recoverable
    from the index itself: the group is folded into the committed term
    dictionary AND merged into a committed segment generation. Compaction
    and the stage-1b dictionary fallback source from segment rows when a
    run dir is gone, so runs/ stops being load-bearing the moment its
    groups are merged — retaining it forever doubles index storage
    (the 100-TB cost-of-ownership flaw, VERDICT r4 #1). The runs_group_*
    manifests are KEPT: they drive the resume plan (committed spans).
    Returns the swept group ids."""
    import shutil

    paths = IndexPaths(root)
    terms_m = read_manifest(root, "terms") or {}
    seg_m = read_manifest(root, "segments") or {}
    if not terms_m or not seg_m or terms_m.get("fingerprint") != seg_m.get(
        "fingerprint"
    ):
        return []
    dict_groups = {int(g) for g in terms_m.get("groups", [])}
    gen_groups = {
        int(x) for g in (seg_m.get("generations") or []) for x in g["groups"]
    }
    eligible = dict_groups & gen_groups
    swept: list[int] = []
    if os.path.isdir(paths.runs):
        for d in sorted(os.listdir(paths.runs)):
            if d.startswith("group=") and int(d.split("=", 1)[1]) in eligible:
                shutil.rmtree(os.path.join(paths.runs, d), ignore_errors=True)
                swept.append(int(d.split("=", 1)[1]))
    if swept:
        log(f"gc_runs: reclaimed run dirs for groups {swept}")
    return swept


def load_stats(root: str) -> CorpusStats:
    m = read_manifest(root, "stats")
    if m is None:
        raise FileNotFoundError(f"no stats manifest in {root}")
    return CorpusStats(
        n_docs=int(m["n_docs"]), avgdl=float(m["avgdl"]), total_tokens=int(m["total_tokens"])
    )


#: Postings budget for the DRIVER-SIDE merge fast path (zero Spark jobs):
#: an append/compaction whose input fits decodes, merges and writes the
#: new generation in-process via pyarrow — the build-side twin of the
#: serving fast path (a ~10-stage Spark job costs whole seconds of fixed
#: overhead on inputs this small). Scale-dependent, so env-overridable;
#: inputs above the budget take the distributed merge unchanged.
DRIVER_MERGE_MAX_POSTINGS = int(
    os.environ.get("DAWNSEARCH_SPARK_DRIVER_MERGE_POSTINGS", 4_000_000)
)


def _driver_merge_to_generation(
    paths: IndexPaths,
    cfg: EngineConfig,
    group_ids: list[int],
    gen_id: int,
    source_gens: list[dict] | None = None,
    tombstones=None,
) -> dict | None:
    """In-process (pyarrow, zero-Spark-job) twin of the distributed
    stage-3 merge for budget-sized inputs. Emits EXACTLY the rows the
    distributed path emits — same reclassify split set (dictionary-heavy
    terms ∪ terms already salted in the input runs), same per-(term, salt)
    k-way merge kernel, same tombstone mask, same ``_make_segment_row``
    packing, same (term, range_id) file order per bucket — written as one
    parquet file per ``gen=K/bucket=B`` directory with ~1 MB row groups
    (the same term-pruning layout the distributed writer produces).
    Returns None when the input is not driver-readable (non-local URI) —
    the caller falls back to the distributed merge."""
    import glob as _glob

    import numpy as np

    if "://" in paths.root:
        return None
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as papq

    from dawnsearch_spark.operators.merge import (
        SEGMENT_COLS,
        merge_rows_columnar,
        segment_columns_to_rows,
    )

    # ---- input rows: runs-sourced, else segment-sourced (compaction/purge
    # after gc_runs), mirroring the distributed path's source selection ----
    gdirs = [os.path.join(paths.runs, f"group={g}") for g in group_ids]
    if source_gens is not None and not all(os.path.isdir(d) for d in gdirs):
        src_groups = sorted(int(x) for g in source_gens for x in g["groups"])
        if src_groups != sorted(int(g) for g in group_ids):
            return None  # let the distributed path raise its precise error
        files: list[str] = []
        for g in source_gens:
            if int(g.get("rows", 0)) > 0:
                files.extend(
                    sorted(
                        _glob.glob(
                            os.path.join(
                                paths.segments, f"gen={int(g['gen'])}",
                                "bucket=*", "*.parquet",
                            )
                        )
                    )
                )
        salt_col = "range_id"
    else:
        if not all(os.path.isdir(d) for d in gdirs):
            return None
        files = []
        for d in gdirs:
            files.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))))
        salt_col = "salt"

    cols = ["term", salt_col, "n_docs", "doc_blob", "tf_blob", "dl_blob"]
    if files:
        tbl = pads.dataset(files, format="parquet").to_table(columns=cols)
    else:
        tbl = pa.table({c: [] for c in cols})
    terms_v = tbl.column("term").to_numpy(zero_copy_only=False)
    salts_v = tbl.column(salt_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ndocs_v = tbl.column("n_docs").to_numpy(zero_copy_only=False).astype(np.int64)
    doc_v = tbl.column("doc_blob").to_pylist()
    tf_v = tbl.column("tf_blob").to_pylist()
    dl_v = tbl.column("dl_blob").to_pylist()

    # ---- split set: dictionary-heavy terms ∪ already-salted input terms ----
    heavy_set: set = set()
    if os.path.isdir(paths.terms):
        tfiles = sorted(_glob.glob(os.path.join(paths.terms, "*.parquet")))
        if tfiles:
            td = pads.dataset(tfiles, format="parquet").to_table(
                columns=["term", "heavy"],
                filter=pads.field("heavy") == True,  # noqa: E712
            )
            heavy_set = set(td.column("term").to_pylist())
    split_set = heavy_set | {t for t, s in zip(terms_v, salts_v) if s >= 0}

    # ---- reclassify + merge + pack, batched PER BUCKET and threaded ----
    # Keys never span buckets (bucket = crc32(term)), so the kernel is
    # separable by bucket: each thread merges + packs + writes one
    # bucket's rows (identical per-key output to the single global kernel
    # — the lexsort is fully determined by the posting keys). The NumPy
    # kernels release the GIL for their array passes, so a small pool
    # overlaps them; single-threaded this merge was the dominant phase of
    # a 10k-doc append (3-4 s) and of small compactions (7 s).
    tomb = None
    if tombstones is not None and len(tombstones):
        tomb = np.sort(np.asarray(tombstones, np.int64))
    import pandas as pd

    from dawnsearch_spark.operators.merge import term_bucket_py

    gdir = os.path.join(paths.segments, f"gen={gen_id}")
    if os.path.isdir(gdir):  # crash leftover from an uncommitted attempt
        import shutil

        shutil.rmtree(gdir, ignore_errors=True)

    uterms, tinv = np.unique(terms_v, return_inverse=True)
    ubuckets = np.fromiter(
        (term_bucket_py(str(t), cfg.num_term_buckets) for t in uterms),
        np.int64,
        len(uterms),
    )
    row_bucket = ubuckets[tinv]
    list_i64 = pa.list_(pa.int64())
    schema = pa.schema(
        [
            ("term", pa.string()),
            ("range_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("tf_sum", pa.int64()),
            ("doc_blob", pa.binary()),
            ("tf_blob", pa.binary()),
            ("dl_blob", pa.binary()),
            ("block_last", list_i64),
            ("block_doc_off", list_i64),
            ("block_tf_off", list_i64),
            ("block_dl_off", list_i64),
            ("front_tf", list_i64),
            ("front_dl", list_i64),
            ("front_off", list_i64),
            ("max_tf", pa.int64()),
            ("min_dl", pa.int64()),
        ]
    )
    file_cols = [c for c in SEGMENT_COLS if c != "bucket"]

    def _merge_one_bucket(bkt: int) -> tuple[int, int]:
        sel = np.flatnonzero(row_bucket == bkt)
        if not len(sel):
            return 0, 0
        cols_out = merge_rows_columnar(
            terms_v[sel],
            salts_v[sel],
            ndocs_v[sel],
            [doc_v[i] for i in sel],
            [tf_v[i] for i in sel],
            [dl_v[i] for i in sel],
            cfg,
            split_terms=split_set,
            tomb=tomb,
        )
        rows_map = segment_columns_to_rows(cols_out)
        grp = pd.DataFrame(rows_map)
        if not len(grp):
            return 0, 0
        grp = grp.sort_values(["term", "range_id"], ignore_index=True)
        bdir = os.path.join(gdir, f"bucket={bkt}")
        os.makedirs(bdir, exist_ok=True)
        btbl = pa.table({c: grp[c].tolist() for c in file_cols}, schema=schema)
        blob_bytes = int(
            sum(len(b) for b in grp["doc_blob"])
            + sum(len(b) for b in grp["tf_blob"])
            + sum(len(b) for b in grp["dl_blob"])
            + 200 * len(grp)
        )
        rg_rows = max(16, int(len(grp) * (1 << 20) / max(blob_bytes, 1)))
        papq.write_table(
            btbl,
            os.path.join(bdir, "part-00000.parquet"),
            row_group_size=min(rg_rows, len(grp)),
            compression="snappy",
        )
        return len(grp), int(grp["n_docs"].sum())

    present = sorted({int(b) for b in row_bucket})
    if present:
        os.makedirs(gdir, exist_ok=True)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(present))) as pool:
            results = list(pool.map(_merge_one_bucket, present))
    else:
        results = []
    n_rows = int(sum(r for r, _ in results))
    postings_out = int(sum(p for _, p in results))
    return {
        "gen": int(gen_id),
        "groups": [int(g) for g in group_ids],
        "rows": n_rows,
        "postings": postings_out,
        "bytes": dir_bytes(gdir),
    }


def _bucket_merge_to_generation(
    spark: SparkSession,
    paths: IndexPaths,
    cfg: EngineConfig,
    group_ids: list[int],
    gen_id: int,
    source_gens: list[dict],
    tombstones=None,
) -> dict | None:
    """Shuffle-free SEGMENT-SOURCED merge (compaction / purge): one task
    per term bucket, each reading its bucket's files across the source
    generations directly via pyarrow and running the same columnar merge
    kernel, then writing its bucket's output file in place.

    Why no exchange is needed: ``bucket = crc32(term) % num_term_buckets``
    is a pure function of the term, so ALL rows of a (term, range) — in
    every generation — already live under the same ``bucket=B`` partition
    directories; the distributed merge's (term, salt) repartition of every
    posting blob re-derived a grouping the on-disk layout already has
    (guide §2.4: remove shuffles the data's existing partitioning makes
    redundant). Row content is byte-identical to the other merge paths
    (same kernel, and the kernel's lexsort is fully determined by the
    posting keys); the per-bucket one-file layout matches the driver
    merge's. The per-bucket split set (dictionary-heavy terms plus terms
    already salted in that bucket's rows) equals the global split set
    restricted to the bucket, for the same reason the layout does.

    Returns None when the index is not a local filesystem path (the
    shuffle-based merge handles remote layouts)."""
    import glob as _glob

    import numpy as np

    if "://" in paths.root:
        return None
    gdirs = [os.path.join(paths.runs, f"group={g}") for g in group_ids]
    if all(os.path.isdir(d) for d in gdirs):
        return None  # runs-sourced merges keep the distributed path
    src_groups = sorted(int(x) for g in source_gens for x in g["groups"])
    if src_groups != sorted(int(g) for g in group_ids):
        return None  # let the distributed path raise its precise error

    bucket_files: dict[int, list[str]] = {}
    for g in source_gens:
        if int(g.get("rows", 0)) > 0:
            for bdir in _glob.glob(
                os.path.join(paths.segments, f"gen={int(g['gen'])}", "bucket=*")
            ):
                b = int(bdir.rsplit("=", 1)[1])
                bucket_files.setdefault(b, []).extend(
                    sorted(_glob.glob(os.path.join(bdir, "*.parquet")))
                )

    heavy_set: set = set()
    if os.path.isdir(paths.terms):
        import pyarrow.dataset as pads

        tfiles = sorted(_glob.glob(os.path.join(paths.terms, "*.parquet")))
        if tfiles:
            td = pads.dataset(tfiles, format="parquet").to_table(
                columns=["term", "heavy"],
                filter=pads.field("heavy") == True,  # noqa: E712
            )
            heavy_set = set(td.column("term").to_pylist())

    gdir = os.path.join(paths.segments, f"gen={gen_id}")
    if os.path.isdir(gdir):  # crash leftover from an uncommitted attempt
        import shutil

        shutil.rmtree(gdir, ignore_errors=True)
    os.makedirs(gdir, exist_ok=True)

    tomb = None
    if tombstones is not None and len(tombstones):
        tomb = np.sort(np.asarray(tombstones, np.int64))
    tomb_bc = spark.sparkContext.broadcast(tomb)
    heavy_bc = spark.sparkContext.broadcast(frozenset(heavy_set))
    files_bc = spark.sparkContext.broadcast(bucket_files)
    cfg_local = cfg
    gdir_local = gdir

    def gen(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as papq

        from dawnsearch_spark.operators.merge import (
            SEGMENT_COLS,
            merge_rows_columnar,
            segment_columns_to_rows,
        )

        cols_in = ["term", "range_id", "n_docs", "doc_blob", "tf_blob", "dl_blob"]
        list_i64 = pa.list_(pa.int64())
        schema = pa.schema(
            [
                ("term", pa.string()), ("range_id", pa.int64()),
                ("n_docs", pa.int64()), ("tf_sum", pa.int64()),
                ("doc_blob", pa.binary()), ("tf_blob", pa.binary()),
                ("dl_blob", pa.binary()),
                ("block_last", list_i64), ("block_doc_off", list_i64),
                ("block_tf_off", list_i64), ("block_dl_off", list_i64),
                ("front_tf", list_i64), ("front_dl", list_i64),
                ("front_off", list_i64),
                ("max_tf", pa.int64()), ("min_dl", pa.int64()),
            ]
        )
        file_cols = [c for c in SEGMENT_COLS if c != "bucket"]
        for pdf in batches:
            for b in pdf["id"].to_numpy():
                files = files_bc.value.get(int(b), [])
                if not files:
                    continue
                tbl = pads.dataset(files, format="parquet").to_table(columns=cols_in)
                terms_v = tbl.column("term").to_numpy(zero_copy_only=False)
                salts_v = (
                    tbl.column("range_id").to_numpy(zero_copy_only=False).astype(np.int64)
                )
                ndocs_v = (
                    tbl.column("n_docs").to_numpy(zero_copy_only=False).astype(np.int64)
                )
                split_set = frozenset(heavy_bc.value) | {
                    t for t, s in zip(terms_v, salts_v) if s >= 0
                }
                cols_out = merge_rows_columnar(
                    terms_v, salts_v, ndocs_v,
                    tbl.column("doc_blob").to_pylist(),
                    tbl.column("tf_blob").to_pylist(),
                    tbl.column("dl_blob").to_pylist(),
                    cfg_local, split_terms=split_set, tomb=tomb_bc.value,
                )
                rows_map = segment_columns_to_rows(cols_out)
                rows_df = pd.DataFrame(rows_map)
                n_rows = len(rows_df)
                if not n_rows:
                    yield pd.DataFrame({"bucket": [int(b)], "rows": [0], "postings": [0]})
                    continue
                rows_df = rows_df.sort_values(["term", "range_id"], ignore_index=True)
                bdir = os.path.join(gdir_local, f"bucket={int(b)}")
                os.makedirs(bdir, exist_ok=True)
                btbl = pa.table(
                    {c: rows_df[c].tolist() for c in file_cols}, schema=schema
                )
                blob_bytes = int(
                    sum(len(x) for x in rows_df["doc_blob"])
                    + sum(len(x) for x in rows_df["tf_blob"])
                    + sum(len(x) for x in rows_df["dl_blob"])
                    + 200 * n_rows
                )
                rg_rows = max(16, int(n_rows * (1 << 20) / max(blob_bytes, 1)))
                papq.write_table(
                    btbl,
                    os.path.join(bdir, "part-00000.parquet"),
                    row_group_size=min(rg_rows, n_rows),
                    compression="snappy",
                )
                yield pd.DataFrame(
                    {
                        "bucket": [int(b)],
                        "rows": [n_rows],
                        "postings": [int(rows_df["n_docs"].sum())],
                    }
                )

    n_b = cfg.num_term_buckets
    stats_rows = (
        spark.range(0, n_b, 1, numPartitions=n_b)
        .mapInPandas(gen, "bucket long, rows long, postings long")
        .collect()
    )
    tomb_bc.destroy()
    heavy_bc.destroy()
    files_bc.destroy()
    return {
        "gen": int(gen_id),
        "groups": [int(g) for g in group_ids],
        "rows": int(sum(r["rows"] for r in stats_rows)),
        "postings": int(sum(r["postings"] for r in stats_rows)),
        "bytes": dir_bytes(gdir),
    }


def merge_groups_to_generation(
    spark: SparkSession,
    paths: IndexPaths,
    cfg: EngineConfig,
    heavy_terms: DataFrame,
    group_ids: list[int],
    gen_id: int,
    source_gens: list[dict] | None = None,
    tombstones=None,
) -> dict:
    """Merge the given run groups into segments/gen=<gen_id>.

    ``source_gens`` (committed generation dicts covering exactly
    ``group_ids``) lets the merge source from the POSTINGS ALREADY IN
    those generations' segment rows instead of runs/: a segment row's
    doc/tf/dl blobs are valid run blobs (same delta+varbyte streams —
    block-leading gaps are plain gaps, see codec.decode_all_postings),
    so the rows reinterpret as runs with salt = range_id and
    group = gen, zero re-encoding. The runs-sourced path is kept
    whenever every group's run dir still exists (byte-identical
    output either way: both decode to the same disjoint docID-sorted
    posting sets, and the merge + block pack are deterministic); with
    ``cfg.gc_runs`` the dirs are gone and compaction runs entirely
    off the index itself — runs/ storage is reclaimed instead of
    doubling the index forever (VERDICT r4 #1).

    ``tombstones`` (sorted int64 doc_ids) drops those docs' postings
    during the merge — the purge path of the delete lifecycle
    (Lucene-style: deletes are tombstones until a merge rewrites the
    affected rows)."""
    # Budget-sized inputs (appends, small compactions/purges) merge on
    # the driver with zero Spark jobs — identical output rows, ~10 Spark
    # stages of fixed overhead saved (dominant at O(batch) input sizes).
    if source_gens is not None:
        _in_postings = sum(int(g.get("postings", 0) or 0) for g in source_gens)
    else:
        _in_postings = sum(
            int((read_manifest(paths.root, f"runs_group_{g}") or {}).get("postings", 0) or 0)
            for g in group_ids
        )
    if _in_postings <= DRIVER_MERGE_MAX_POSTINGS:
        gd = _driver_merge_to_generation(
            paths, cfg, group_ids, gen_id, source_gens=source_gens,
            tombstones=tombstones,
        )
        if gd is not None:
            return gd
    elif source_gens is not None:
        # big segment-sourced merge (purge / large compaction): the
        # bucket layout already groups every (term, range) — merge per
        # bucket with zero exchanges instead of re-shuffling every blob
        gd = _bucket_merge_to_generation(
            spark, paths, cfg, group_ids, gen_id, source_gens,
            tombstones=tombstones,
        )
        if gd is not None:
            return gd

    gdirs = [os.path.join(paths.runs, f"group={g}") for g in group_ids]
    if source_gens is not None and not all(os.path.isdir(d) for d in gdirs):
        src_dirs = [
            os.path.join(paths.segments, f"gen={int(g['gen'])}")
            for g in source_gens
            if int(g.get("rows", 0)) > 0
        ]
        src_groups = sorted(int(x) for g in source_gens for x in g["groups"])
        if src_groups != sorted(int(g) for g in group_ids):
            raise RuntimeError(
                f"segment-sourced merge needs generations covering exactly "
                f"the requested groups (gens cover {src_groups}, "
                f"requested {sorted(group_ids)})"
            )
        if src_dirs:
            runs_raw = (
                spark.read.option("basePath", paths.segments)
                .parquet(*src_dirs)
                .select(
                    "term",
                    F.col("range_id").alias("salt"),
                    "n_docs",
                    "tf_sum",
                    "doc_blob",
                    "tf_blob",
                    "dl_blob",
                    F.col("gen").cast("long").alias("group"),
                )
            )
        else:  # all-empty source generations
            from dawnsearch_spark.operators.postings import RUN_SCHEMA

            runs_raw = spark.createDataFrame([], RUN_SCHEMA + ", group long")
    else:
        runs_raw = spark.read.option("basePath", paths.runs).parquet(*gdirs)
    # Within ONE generation a term is served either as one light row
    # or as range rows, never both (uniform layout per gen keeps the
    # merge single-pass); ACROSS generations a term may be mixed —
    # the query layer treats every row as an additive disjoint
    # posting set. Split set = globally-heavy terms plus any term
    # already salted in these runs.
    split_terms = (
        heavy_terms.select("term")
        .union(runs_raw.filter(F.col("salt") >= 0).select("term"))
        .distinct()
    )
    tomb_bc = None
    if tombstones is not None and len(tombstones):
        import numpy as np

        tomb_bc = spark.sparkContext.broadcast(
            np.sort(np.asarray(tombstones, np.int64))
        )
    # Size the merge to its INPUT, not the cluster: an append merges one
    # small generation's worth of runs, and 32 near-empty shuffle tasks
    # cost whole seconds of fixed overhead on tiny input (the same
    # rationale as _doc_partitions). ~250k postings per merge task; a
    # full build still fans out to build_partitions.
    if source_gens is not None:
        in_postings = sum(int(g.get("postings", 0) or 0) for g in source_gens)
    else:
        in_postings = sum(
            int((read_manifest(paths.root, f"runs_group_{g}") or {}).get("postings", 0) or 0)
            for g in group_ids
        )
    merge_parts = max(1, min(cfg.build_partitions, in_postings // 250_000 + 1))
    runs = reclassify_runs(runs_raw, split_terms, cfg)
    # one (term, salt)-keyed exchange merges light AND salted keys (light
    # keys have constant salt = -1, so the unified key loses nothing) —
    # the former two-branch plan paid two exchanges + two Python stages
    # plus a persist of the reclassified runs to feed both branches
    from dawnsearch_spark.operators.merge import merge_runs_segments

    seg = merge_runs_segments(runs, cfg, merge_parts, tombstones_bc=tomb_bc)
    gdir = os.path.join(paths.segments, f"gen={gen_id}")
    (
        seg.repartition(merge_parts, "bucket")
        .sortWithinPartitions("term", "range_id")
        # term-sorted files + small row groups = every row group's
        # (min_term, max_term) stats span a narrow slice, so a
        # query-term filter prunes to 1-2 row groups per bucket —
        # parquet footers become the term directory pages of a
        # classical inverted index (drives both the pyarrow serving
        # reads and Spark's scan-level row-group skipping)
        .write.mode("overwrite")
        .option("parquet.block.size", str(1 << 20))
        .partitionBy("bucket")
        .parquet(gdir)
    )
    import glob as _glob

    # an all-empty-content batch produces ZERO segment rows: the
    # partitionBy write then leaves no schema-bearing file, so the
    # read-back would fail — record a 0-row generation instead
    # (readers skip rows == 0 generations entirely)
    files = _glob.glob(os.path.join(gdir, "bucket=*", "*.parquet"))
    if files:
        _bt = _pa_read(sorted(files), columns=["n_docs"]) if "://" not in gdir else None
        if _bt is not None:
            rows = _bt.num_rows
            postings = (
                int(_bt.column("n_docs").to_numpy(zero_copy_only=False).sum())
                if rows
                else 0
            )
        else:
            agg = (
                spark.read.parquet(gdir)
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum("n_docs").alias("postings"),
                )
                .collect()[0]
            )
            rows, postings = int(agg["rows"]), int(agg["postings"] or 0)
    else:
        rows, postings = 0, 0
    return {
        "gen": int(gen_id),
        "groups": [int(g) for g in group_ids],
        "rows": rows,
        "postings": postings,
        "bytes": dir_bytes(gdir),
    }


#: Metadata-row budget for the DRIVER-SIDE stage-1b dictionary path: the
#: dictionary update is a pure metadata aggregate (term, n_docs, tf_sum
#: over runs/segment rows), so under the budget it runs in-process via
#: pyarrow + pandas — identical sums, no Spark jobs. Larger corpora (or
#: remote indexes) take the distributed aggregation unchanged.
DRIVER_DICT_MAX_ROWS = int(
    os.environ.get("DAWNSEARCH_SPARK_DRIVER_DICT_ROWS", 6_000_000)
)


def _write_stats_manifest(
    paths: IndexPaths, fp: str, eff_heavy: int, n_docs_total: int,
    n_terms: int, n_heavy: int, n_postings: int, total_tokens: int, log,
) -> None:
    write_manifest(
        paths.root,
        "stats",
        {
            "fingerprint": fp,
            "n_docs": n_docs_total,
            "avgdl": total_tokens / n_docs_total if n_docs_total else 0.0,
            "total_tokens": total_tokens,
            "n_terms": int(n_terms),
            "n_heavy_terms": int(n_heavy),
            "n_postings": int(n_postings),
            "heavy_df_threshold": eff_heavy,
        },
    )
    log(
        f"stage1b stats committed: n_docs={n_docs_total} "
        f"total_tokens={total_tokens} heavy={int(n_heavy)}"
    )


def _stage1b_driver(
    spark: SparkSession,
    paths: IndexPaths,
    cfg: EngineConfig,
    fp: str,
    eff_heavy: int,
    all_ids: set,
    t_covered: set | None,
    n_docs_total: int,
    log,
) -> bool:
    """Driver-side (zero-Spark-job) stage-1b: dictionary update + stats
    from metadata read via pyarrow, pandas-aggregated. Sums over disjoint
    doc sets are exact, so df/cf/heavy/bucket come out value-identical to
    the distributed aggregation. Returns False (fall back to
    :func:`_stage1b_spark`) for remote indexes or over-budget inputs."""
    import glob as _glob

    import numpy as np

    if "://" in paths.root:
        return False
    import pandas as pd

    from dawnsearch_spark.operators.merge import term_bucket_py

    def _run_dir(g: int) -> str:
        return os.path.join(paths.runs, f"group={g}")

    def _finish_and_commit(agg: "pd.DataFrame") -> bool:
        """agg: index=term, columns df/cf -> write dict + manifests."""
        import pyarrow as pa
        import pyarrow.parquet as papq
        import shutil

        agg = agg.sort_index()
        terms = agg.index.to_numpy(dtype=object)
        df_v = agg["df"].to_numpy(np.int64)
        cf_v = agg["cf"].to_numpy(np.int64)
        heavy_v = df_v > eff_heavy
        bucket_v = np.fromiter(
            (term_bucket_py(str(t), cfg.num_term_buckets) for t in terms),
            np.int64,
            len(terms),
        )
        schema = pa.schema(
            [
                ("term", pa.string()),
                ("df", pa.int64()),
                ("cf", pa.int64()),
                ("heavy", pa.bool_()),
                ("bucket", pa.int64()),
            ]
        )
        tbl = pa.table(
            {
                "term": terms, "df": df_v, "cf": cf_v,
                "heavy": heavy_v, "bucket": bucket_v,
            },
            schema=schema,
        )
        tmp = paths.terms + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        papq.write_table(
            tbl, os.path.join(tmp, "part-00000.parquet"), compression="snappy"
        )
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        shutil.rmtree(paths.terms, ignore_errors=True)
        os.rename(tmp, paths.terms)
        spark.catalog.refreshByPath(paths.terms)
        write_manifest(
            paths.root,
            "terms",
            {"fingerprint": fp, "groups": sorted(int(g) for g in all_ids)},
        )
        _write_stats_manifest(
            paths, fp, eff_heavy, n_docs_total,
            n_terms=len(terms), n_heavy=int(heavy_v.sum()),
            n_postings=int(df_v.sum()), total_tokens=int(cf_v.sum()), log=log,
        )
        return True

    meta_cols = ["term", "n_docs", "tf_sum"]

    if t_covered == all_ids and _has_success(paths.terms):
        # dictionary already current: stats recount only
        tb = _pa_read(paths.terms, columns=["df", "cf", "heavy"])
        if tb is None:
            return False
        df_v = tb.column("df").to_numpy(zero_copy_only=False)
        cf_v = tb.column("cf").to_numpy(zero_copy_only=False)
        hv = tb.column("heavy").to_numpy(zero_copy_only=False)
        log("stage1b dictionary already covers the plan; stats recount only")
        _write_stats_manifest(
            paths, fp, eff_heavy, n_docs_total,
            n_terms=tb.num_rows, n_heavy=int(hv.sum()),
            n_postings=int(df_v.sum()), total_tokens=int(cf_v.sum()), log=log,
        )
        return True

    if (
        t_covered is not None
        and t_covered
        and t_covered < all_ids
        and _has_success(paths.terms)
    ):
        new_ids = sorted(all_ids - t_covered)
        delta_rows = sum(
            int((read_manifest(paths.root, f"runs_group_{g}") or {}).get("rows", 0) or 0)
            for g in new_ids
        )
        if delta_rows > DRIVER_DICT_MAX_ROWS:
            return False
        old = _pa_read(paths.terms, columns=["term", "df", "cf"])
        if old is None or old.num_rows > DRIVER_DICT_MAX_ROWS:
            return False
        dfiles: list[str] = []
        for g in new_ids:
            fl = _pa_files(_run_dir(g))
            if fl is None:
                return False
            dfiles.extend(fl)
        delta = _pa_read(dfiles, columns=meta_cols)
        dpd = delta.to_pandas()
        dagg = dpd.groupby("term", sort=False).agg(
            df=("n_docs", "sum"), cf=("tf_sum", "sum")
        )
        opd = old.to_pandas().set_index("term")[["df", "cf"]]
        agg = opd.add(dagg, fill_value=0).astype(np.int64)
        log(
            f"stage1b dictionary updated incrementally: groups {new_ids} "
            "folded into the committed dictionary (old runs untouched)"
        )
        return _finish_and_commit(agg)

    # full re-aggregation (first build / purge / crash recovery): same
    # per-generation-all-or-nothing source selection as the Spark path
    seg_m_now = read_manifest(paths.root, "segments") or {}
    gen_list = (
        list(seg_m_now.get("generations") or [])
        if seg_m_now.get("fingerprint") == fp
        else []
    )
    used_gens: list[dict] = []
    gen_covered: set = set()
    for gdict in gen_list:
        gids = {int(x) for x in gdict["groups"]}
        if not all(os.path.isdir(_run_dir(g)) for g in gids):
            used_gens.append(gdict)
            gen_covered |= gids
    runs_groups = sorted(g for g in all_ids if g not in gen_covered)
    if any(not os.path.isdir(_run_dir(g)) for g in runs_groups):
        return False  # let the Spark path raise its precise error
    src_rows = sum(
        int((read_manifest(paths.root, f"runs_group_{g}") or {}).get("rows", 0) or 0)
        for g in runs_groups
    ) + sum(int(g.get("rows", 0) or 0) for g in used_gens)
    if src_rows > DRIVER_DICT_MAX_ROWS:
        return False
    files: list[str] = []
    for g in runs_groups:
        fl = _pa_files(_run_dir(g))
        if fl is None:
            return False
        files.extend(fl)
    for gdict in used_gens:
        if int(gdict.get("rows", 0) or 0) > 0:
            files.extend(
                sorted(
                    _glob.glob(
                        os.path.join(
                            paths.segments, f"gen={int(gdict['gen'])}",
                            "bucket=*", "*.parquet",
                        )
                    )
                )
            )
    meta = _pa_read(files, columns=meta_cols)
    mpd = meta.to_pandas()
    if len(mpd):
        agg = mpd.groupby("term", sort=False).agg(
            df=("n_docs", "sum"), cf=("tf_sum", "sum")
        )
    else:
        agg = pd.DataFrame(
            {"df": pd.Series(dtype="int64"), "cf": pd.Series(dtype="int64")}
        )
        agg.index.name = "term"
    if used_gens:
        log(
            "stage1b dictionary rebuilt from segment rows for GC'd groups "
            f"{sorted(gen_covered)}"
            + (f" + run groups {runs_groups}" if runs_groups else "")
        )
    return _finish_and_commit(agg)


def _stage1b_spark(
    spark: SparkSession,
    paths: IndexPaths,
    cfg: EngineConfig,
    fp: str,
    eff_heavy: int,
    all_ids: set,
    t_covered: set | None,
    n_docs_total: int,
    log,
) -> None:
    """Distributed stage-1b dictionary + stats commit (fallback when the
    driver-side metadata path is over budget or the index is remote)."""
    agg_cols = [
        F.sum("n_docs").cast("long").alias("df"),
        F.sum("tf_sum").cast("long").alias("cf"),
    ]
    finish = lambda df_: (
        df_.withColumn("heavy", F.col("df") > F.lit(eff_heavy)).withColumn(
            "bucket", F.pmod(F.crc32(F.col("term")), F.lit(cfg.num_term_buckets))
        )
    )
    if t_covered == all_ids and _has_success(paths.terms):
        # dictionary already current (crash after the dict swap but
        # before the stats manifest): only recompute the stats below
        log("stage1b dictionary already covers the plan; stats recount only")
    elif (
        t_covered is not None
        and t_covered
        and t_covered < all_ids
        and _has_success(paths.terms)
    ):
        new_ids = sorted(all_ids - t_covered)
        delta = (
            spark.read.option("basePath", paths.runs)
            .parquet(*[os.path.join(paths.runs, f"group={g}") for g in new_ids])
            .select("term", "n_docs", "tf_sum")
            .groupBy("term")
            .agg(*agg_cols)
        )
        old = spark.read.parquet(paths.terms).select("term", "df", "cf")
        dict_df = finish(
            old.unionByName(delta.selectExpr("term", "df", "cf"))
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"), F.sum("cf").cast("long").alias("cf"))
        )
        tmp = paths.terms + "_tmp"
        dict_df.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(paths.terms, ignore_errors=True)
        os.rename(tmp, paths.terms)
        spark.catalog.refreshByPath(paths.terms)
        log(
            f"stage1b dictionary updated incrementally: groups {new_ids} "
            f"folded into the committed dictionary (old runs untouched)"
        )
    else:
        # Full re-aggregation. Sources per GENERATION all-or-nothing
        # (a generation's segment rows cannot be attributed to
        # individual groups): any generation with a GC'd member group
        # contributes its segment rows — df = Σ n_docs and
        # cf = Σ tf_sum hold identically there (disjoint doc sets,
        # rows carry the same tf_sum partial as runs) — and every
        # group outside those generations must still have its run dir.
        def _run_dir(g: int) -> str:
            return os.path.join(paths.runs, f"group={g}")

        seg_m_now = read_manifest(paths.root, "segments") or {}
        gen_list = (
            list(seg_m_now.get("generations") or [])
            if seg_m_now.get("fingerprint") == fp
            else []
        )
        used_gens: list[dict] = []
        gen_covered: set[int] = set()
        for gdict in gen_list:
            gids = {int(x) for x in gdict["groups"]}
            if not all(os.path.isdir(_run_dir(g)) for g in gids):
                used_gens.append(gdict)
                gen_covered |= gids
        runs_groups = sorted(g for g in all_ids if g not in gen_covered)
        missing = [g for g in runs_groups if not os.path.isdir(_run_dir(g))]
        if missing:
            raise FileNotFoundError(
                f"dictionary rebuild: run groups {missing} have neither "
                "run dirs nor a committed segment generation"
            )
        parts = []
        if runs_groups:
            parts.append(
                spark.read.option("basePath", paths.runs)
                .parquet(*[_run_dir(g) for g in runs_groups])
                .select("term", "n_docs", "tf_sum")
            )
        seg_dirs = [
            os.path.join(paths.segments, f"gen={int(g['gen'])}")
            for g in used_gens
            if int(g.get("rows", 0)) > 0
        ]
        if seg_dirs:
            parts.append(
                spark.read.option("basePath", paths.segments)
                .parquet(*seg_dirs)
                .select("term", "n_docs", "tf_sum")
            )
        if parts:
            runs_meta = parts[0]
            for p in parts[1:]:
                runs_meta = runs_meta.unionByName(p)
            if used_gens:
                log(
                    "stage1b dictionary rebuilt from segment rows for "
                    f"GC'd groups {sorted(gen_covered)}"
                    + (f" + run groups {runs_groups}" if runs_groups else "")
                )
        else:  # empty corpus: no runs were written
            runs_meta = spark.createDataFrame(
                [], "term string, n_docs long, tf_sum long"
            )
        dict_df = finish(runs_meta.groupBy("term").agg(*agg_cols))
        dict_df.write.mode("overwrite").parquet(paths.terms)
    write_manifest(
        paths.root,
        "terms",
        {"fingerprint": fp, "groups": sorted(int(g) for g in all_ids)},
    )
    tstats = spark.read.parquet(paths.terms).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("heavy").cast("int")).alias("n_heavy"),
        F.sum("df").alias("n_postings"),
        F.sum("cf").alias("total_tokens"),
    ).collect()[0]
    total_tokens = int(tstats["total_tokens"] or 0)
    write_manifest(
        paths.root,
        "stats",
        {
            "fingerprint": fp,
            "n_docs": n_docs_total,
            "avgdl": total_tokens / n_docs_total if n_docs_total else 0.0,
            "total_tokens": total_tokens,
            "n_terms": int(tstats["n_terms"]),
            "n_heavy_terms": int(tstats["n_heavy"] or 0),
            "n_postings": int(tstats["n_postings"] or 0),
            "heavy_df_threshold": eff_heavy,
        },
    )
    log(
        f"stage1b stats committed: n_docs={n_docs_total} total_tokens={total_tokens} "
        f"heavy={int(tstats['n_heavy'] or 0)}"
    )


def build_index(
    spark: SparkSession,
    source_docs: DataFrame,
    out_dir: str,
    cfg: EngineConfig,
    n_groups: int = 8,
    parallel_groups: int = 1,
    log=lambda msg: None,
) -> dict:
    """Build (or resume) the full index under ``out_dir``. Returns counters."""
    paths = IndexPaths(out_dir)
    fp = config_fingerprint(cfg)
    os.makedirs(out_dir, exist_ok=True)

    # ---- stage 0: forward index (docID-assigned documents) ----
    if not is_committed(paths.root, "documents", fp):
        if read_manifest(paths.root, "documents") is None and _has_success(
            paths.documents
        ):
            # Crash recovery (append_documents invalidates the documents
            # manifest BEFORE mutating the parquet): the parquet is the
            # source of truth — recount and re-commit instead of
            # overwriting the forward index. Rows appended right before a
            # crash simply join the corpus here (their doc_ids are dense by
            # construction, asserted below).
            back = spark.read.parquet(paths.documents)
            agg = back.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("doc_id").alias("nd"),
                F.max("doc_id").alias("mx"),
            ).collect()[0]
            n = int(agg["n"])
            id_space = int(agg["mx"] if agg["mx"] is not None else -1) + 1
            if n != int(agg["nd"]):
                raise RuntimeError(
                    f"forward index at {paths.documents} has duplicate "
                    f"doc_ids (count={n}, distinct={agg['nd']}); refusing "
                    "to adopt"
                )
            # n < id_space is legal: purge_deletes leaves docID holes —
            # the dupe check above is the real corruption guard
            write_manifest(
                paths.root,
                "documents",
                {
                    "fingerprint": fp,
                    "n_docs": n,
                    "id_space": id_space,
                    "bytes": dir_bytes(paths.documents),
                    "recovered": True,
                },
            )
            log(f"stage0 documents recovered from parquet: {n} docs")
        else:
            docs = source_docs
            if "doc_id" not in docs.columns:
                if "content_sha" not in docs.columns:
                    docs = docs.withColumn(
                        "content_sha", F.sha2(F.col(cfg.content_col), 256)
                    )
                # Pre-dedup source count only sizes the file layout: on a
                # parquet source it is footer-metadata-only (sha and every
                # other expression is pruned away).
                n0 = source_docs.count()
                # identity-key dedup on the FIRST build too, not only on
                # appends (deterministic keeper = smallest content_sha per
                # key), fused into assign_doc_ids' Arrow pass — stage 0 has
                # exactly ONE full-data shuffle (the docID range sort); the
                # assigned output partitions are contiguous sorted doc_id
                # ranges, so they are written as-is (no repartitionByRange
                # before the write, no WindowExec hash exchange)
                docs = assign_doc_ids(
                    docs,
                    cfg.id_cols,
                    parts=_doc_partitions(cfg, n_groups, n0),
                    dedup_order_col="content_sha",
                )
                docs.write.mode("overwrite").parquet(paths.documents)
                # the written parquet is now the source of truth — release
                # the assignment shuffle's cached copy of the corpus
                cached = getattr(docs, "_dawnsearch_persisted", None)
                if cached is not None:
                    cached.unpersist()
                # exact post-dedup count from parquet footers (metadata-only)
                n = spark.read.parquet(paths.documents).count()
            else:
                if "content_sha" not in docs.columns:
                    docs = docs.withColumn(
                        "content_sha", F.sha2(F.col(cfg.content_col), 256)
                    )
                n = docs.count()
                (
                    docs.repartitionByRange(
                        _doc_partitions(cfg, n_groups, n), "doc_id"
                    )
                    .sortWithinPartitions("doc_id")
                    .write.mode("overwrite")
                    .parquet(paths.documents)
                )
            write_manifest(
                paths.root,
                "documents",
                {"fingerprint": fp, "n_docs": n, "id_space": n,
                 "bytes": dir_bytes(paths.documents)},
            )
            log(f"stage0 documents committed: {n} docs")
    documents = spark.read.parquet(paths.documents)

    docs_m = read_manifest(paths.root, "documents")
    n_docs_total = int(docs_m["n_docs"])
    # docID space may exceed the live count after purge_deletes (holes);
    # group planning covers the ID SPACE, stats use the live count
    id_space = int(docs_m.get("id_space", n_docs_total))
    eff_heavy = cfg.effective_heavy_df_threshold(n_docs_total)

    # ---- stage 1a: group plan + SAMPLED heavy-term detection ----
    # The build makes exactly ONE full pass over document content (stage
    # 2): salting decisions come from a cheap sampled tokenize here, and
    # the exact term dictionary + BM25 globals are derived later from run
    # METADATA (stage 1b) at no extra content cost. Sampling noise at the
    # heavy boundary is safe in both directions: sampled-heavy-but-light
    # terms simply serve from salted rows, sampled-light-but-heavy runs
    # are re-salted at merge (reclassify_runs). The sample is seeded and
    # the forward index is immutable between resumes, so resumed builds
    # make identical salting decisions (segment byte-identity holds).
    plan = _plan_groups(paths.root, id_space, n_groups, cfg.range_size, fp)
    actual_groups = len(plan)
    pending = [(g, lo, hi) for g, lo, hi, committed in plan if not committed]

    # Drop run dirs that are not part of this plan (e.g. left by a build
    # under a different config fingerprint): stage 1b and stage 3 read the
    # whole runs directory, so stale groups would poison the dictionary.
    if os.path.isdir(paths.runs):
        import shutil

        plan_ids = {g for g, _, _, _ in plan}
        for d in os.listdir(paths.runs):
            if d.startswith("group=") and int(d.split("=", 1)[1]) not in plan_ids:
                shutil.rmtree(os.path.join(paths.runs, d), ignore_errors=True)
                log(f"stage1a: removed stale run dir {d}")

    heavy_bc = None
    use_join_salting = False
    sampled_heavy = None
    # Detection scope: salting only affects the PENDING groups' runs (a
    # misclassification either way is repaired at merge by
    # reclassify_runs), so on an APPEND the committed dictionary supplies
    # the old corpus's heavy set EXACTLY — one column-pruned read of the
    # (bounded, ~avgdl/heavy_df_ratio) heavy terms — and only the NEW doc
    # range is ever sampled. Detection cost is O(batch), never O(corpus):
    # the pre-round-5 behavior sampled the WHOLE corpus per append (the
    # min-docs floor drove the fraction toward 1.0 — a full re-tokenize
    # of the index to salt one batch).
    committed_heavy: frozenset = frozenset()
    pending_lo = min((lo for _, lo, _ in pending), default=0)
    terms_m0 = read_manifest(paths.root, "terms")
    # the range restriction applies only when the committed dictionary
    # actually covers the committed groups (a real append). A partial
    # FIRST build resumed after a crash has no dictionary yet — it keeps
    # the whole-corpus sample, so a resumed build makes the SAME salting
    # decisions as a never-crashed one (segment byte-identity on resume).
    dict_ok = (
        bool(pending)
        and pending_lo > 0
        and terms_m0 is not None
        and terms_m0.get("fingerprint") == fp
        and {int(x) for x in terms_m0.get("groups", [])}
        == {g for g, _, _, c in plan if c}
        and _has_success(paths.terms)
    )
    if dict_ok:
        _tb = _pa_read(paths.terms, columns=["term", "heavy"])
        if _tb is not None:  # driver-side read: no Spark job per append
            _hv = _tb.column("heavy").to_numpy(zero_copy_only=False)
            _tv = _tb.column("term").to_numpy(zero_copy_only=False)
            committed_heavy = frozenset(_tv[_hv])
        else:
            committed_heavy = frozenset(
                r["term"]
                for r in spark.read.parquet(paths.terms)
                .filter(F.col("heavy"))
                .select("term")
                .collect()
            )
        sample_lo = pending_lo
        n_sample_docs = max(0, id_space - pending_lo)
    else:
        sample_lo = 0
        n_sample_docs = n_docs_total
    if pending and n_sample_docs <= cfg.heavy_sample_min_docs:
        # Small pending range: the "sampled" detection would run at
        # frac ≈ 1.0, i.e. a full tokenize pass over the pending content
        # (this was the round-2 bench regression at exactly 20k docs).
        # Skip the pass — pending runs salt by the committed heavy set
        # alone (empty on a first build), and the merge re-salts the
        # exactly-heavy remainder from the exact dictionary
        # (reclassify_runs): identical final layout, since a term is
        # served salted iff its exact df exceeds the threshold.
        heavy_bc = spark.sparkContext.broadcast(committed_heavy)
        log(
            f"stage1a: pending range <= heavy_sample_min_docs — detection "
            f"pass skipped; {len(committed_heavy)} committed heavy terms "
            "pre-salt, merge-time reclassify covers the rest"
        )
    elif pending:
        frac = max(
            cfg.heavy_sample_fraction, cfg.heavy_sample_min_docs / n_sample_docs
        )
        sample = (
            documents.filter(F.col("doc_id") >= sample_lo) if sample_lo else documents
        ).sample(fraction=frac, seed=42)
        sampled_heavy = document_frequencies_fast(sample, cfg.content_col).filter(
            F.col("df") > F.lit(max(1.0, eff_heavy * frac))
        ).select("term")
        probe = sampled_heavy.limit(cfg.max_broadcast_heavy_terms + 1).collect()
        if len(probe) + len(committed_heavy) <= cfg.max_broadcast_heavy_terms:
            # tiny (stopword-like terms only): ship once per executor as a
            # Spark broadcast, NOT captured in each task closure
            heavy_set = frozenset(r["term"] for r in probe) | committed_heavy
            heavy_bc = spark.sparkContext.broadcast(heavy_set)
            log(
                f"stage1a sampled heavy terms: {len(heavy_set)} "
                f"(fraction={frac:.4f} over docs >= {sample_lo}, "
                f"threshold={eff_heavy})"
            )
        else:
            # the heavy set itself is too large to ship — fall back to the
            # fully-distributed join-based salting (with_salt shuffle join)
            use_join_salting = True
            if committed_heavy:
                sampled_heavy = sampled_heavy.unionByName(
                    spark.createDataFrame(
                        [(t,) for t in committed_heavy], "term string"
                    )
                ).distinct()
            log(
                f"stage1a: > {cfg.max_broadcast_heavy_terms} sampled heavy terms; "
                "using join-based salting"
            )

    def _build_group(g: int, lo: int, hi: int) -> None:
        name = f"runs_group_{g}"
        group_docs = documents.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        if use_join_salting:
            from dawnsearch_spark.operators.postings import build_posting_runs, with_salt
            from dawnsearch_spark.operators.tf import term_frequencies

            tf = term_frequencies(group_docs, cfg.content_col)
            salted = with_salt(tf, sampled_heavy, cfg.range_size, broadcast=False)
            runs = build_posting_runs(salted, cfg.build_partitions)
        else:
            runs = build_posting_miniruns(
                group_docs, heavy_bc, cfg.range_size, cfg.content_col
            )
        gdir = os.path.join(paths.runs, f"group={g}")
        runs.write.mode("overwrite").parquet(gdir)
        # counters: rows + postings only (countDistinct(term) would be an
        # extra full shuffle just for a lineage counter; run-rows-per-term
        # is recoverable from the terms dictionary if ever needed).
        # Driver-side pyarrow read of the one metadata column — the Spark
        # readback job was pure fixed overhead per append.
        _rt = _pa_read(gdir, columns=["n_docs"])
        if _rt is not None:
            agg = {
                "rows": _rt.num_rows,
                "postings": int(
                    _rt.column("n_docs").to_numpy(zero_copy_only=False).sum()
                ) if _rt.num_rows else 0,
            }
        else:
            agg = (
                spark.read.parquet(gdir)
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum("n_docs").alias("postings"),
                )
                .collect()[0]
            )
        write_manifest(
            paths.root,
            name,
            {
                "fingerprint": fp,
                "group": g,
                "doc_lo": lo,
                "doc_hi": hi,
                "rows": int(agg["rows"]),
                "postings": int(agg["postings"] or 0),
                "bytes": dir_bytes(gdir),
            },
        )
        log(f"stage2 group {g} committed: docs [{lo},{hi}) postings={int(agg['postings'] or 0)}")

    # Groups are independent Spark jobs (disjoint doc ranges, own manifest
    # granule) — with parallel_groups > 1 they are submitted concurrently
    # so the scheduler can fill the cluster when one group's stage has
    # fewer tasks than cores (sequential submission serializes per-group
    # tail latency). Resume semantics are unchanged: each group commits
    # its own manifest; a crash leaves whichever groups finished.
    if parallel_groups > 1 and len(pending) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(parallel_groups, len(pending))) as pool:
            list(pool.map(lambda args: _build_group(*args), pending))
    else:
        for g, lo, hi in pending:
            _build_group(g, lo, hi)

    # ---- stage 1b: exact stats + term dictionary from run METADATA ----
    # df = sum of run lengths (doc sets are disjoint across batches/groups),
    # cf = sum of per-run tf sums, total_tokens = sum(cf) — all exact, from
    # the compact run rows; the corpus content is never re-tokenized. The
    # BM25 globals follow (avgdl = total_tokens / n_docs; integer-exact
    # before the one float division, identical to avg(doclen)).
    #
    # INCREMENTAL on append: the ``terms`` manifest records which run
    # groups the committed dictionary covers. When only new groups are
    # uncovered, the new dictionary = old dictionary ⊕ (aggregation of
    # the NEW groups' run metadata alone), summed per term — df/cf sums
    # over disjoint doc sets are exact, and the heavy flag is recomputed
    # from the summed df under the CURRENT (n_docs-scaled) threshold. An
    # append therefore reads O(dict + new-group metadata), never the
    # whole runs directory (which at 10^12 docs is billions of rows of
    # per-group term metadata per append). Crash-safe by construction:
    # tmp-write → swap → manifest; any crash falls back to the full
    # re-aggregation path on the next build.
    if not is_committed(paths.root, "stats", fp):
        all_ids = {g for g, _, _, _ in plan}
        terms_m = read_manifest(paths.root, "terms")
        t_covered = None
        if (
            terms_m is not None
            and terms_m.get("fingerprint") == fp
            and "groups" in terms_m
        ):
            t_covered = {int(x) for x in terms_m["groups"]}
        if not _stage1b_driver(
            spark, paths, cfg, fp, eff_heavy, all_ids, t_covered,
            n_docs_total, log,
        ):
            _stage1b_spark(
                spark, paths, cfg, fp, eff_heavy, all_ids, t_covered,
                n_docs_total, log,
            )
    stats = load_stats(paths.root)
    terms_dict = spark.read.parquet(paths.terms)
    heavy_terms = terms_dict.filter(F.col("heavy"))

    # ---- stage 3: merge runs -> block-max segment generations ----
    # Tiered layout (Lucene-style): segments/gen=K/bucket=B/*.parquet.
    # The first build merges every run group into gen=0. An APPEND merges
    # only its NEW groups' runs into a new generation — O(batch) IO, not
    # O(index) — which the stats-free row format makes safe: rows carry
    # (max_tf, min_dl) bounds and per-row n_docs, so query-time idf /
    # avgdl / block bounds are always derived from CURRENT stats and
    # nothing stored goes stale as N grows (reference analog: usearch
    # ``add`` + periodic save, search_provider.rs:250-286, :173-181 —
    # append is O(batch), persistence periodic). When the generation
    # count exceeds ``cfg.max_segment_generations``, one compaction job
    # re-merges ALL runs into a single fresh generation (bounded read
    # amplification at query time, amortized write amplification).
    all_group_ids = {g for g, _, _, _ in plan}
    seg_m = read_manifest(paths.root, "segments")
    generations: list[dict] = []
    if seg_m is not None and seg_m.get("fingerprint") == fp:
        generations = list(seg_m.get("generations") or [])
    covered: set[int] = set()
    for gd in generations:
        covered |= {int(x) for x in gd["groups"]}
    if covered - all_group_ids:
        # a generation references groups outside the current plan (stale
        # state under a config change raced with manifests): full rebuild
        generations, covered = [], set()
    pending_merge = sorted(all_group_ids - covered)

    def _clean_unlisted_gen_dirs() -> None:
        import shutil

        listed = {int(g["gen"]) for g in generations}
        if os.path.isdir(paths.segments):
            for d in os.listdir(paths.segments):
                if d.startswith("gen=") and int(d.split("=", 1)[1]) not in listed:
                    shutil.rmtree(os.path.join(paths.segments, d), ignore_errors=True)
                    log(f"stage3: removed uncommitted segment dir {d}")

    def _merge_groups_to_gen(
        group_ids: list[int], gen_id: int, source_gens: list[dict] | None = None
    ) -> dict:
        return merge_groups_to_generation(
            spark, paths, cfg, heavy_terms, group_ids, gen_id,
            source_gens=source_gens,
        )

    def _commit_segments(gens: list[dict]) -> None:
        write_manifest(
            paths.root,
            "segments",
            {
                "fingerprint": fp,
                "generations": gens,
                "rows": sum(g["rows"] for g in gens),
                "postings": sum(g["postings"] for g in gens),
                "bytes": dir_bytes(paths.segments),
                "n_groups": actual_groups,
            },
        )

    if not all_group_ids and not (
        seg_m is not None and seg_m.get("fingerprint") == fp
    ):
        # empty corpus: no build groups exist (and no runs were ever
        # written), so there is nothing to merge. Commit a
        # schema-bearing EMPTY segments parquet (non-partitioned — a
        # partitionBy write of 0 rows leaves no schema to read back)
        # so Engine boot and searches work and return no hits.
        from dawnsearch_spark.operators.merge import SEGMENT_SCHEMA

        spark.createDataFrame([], SEGMENT_SCHEMA).write.mode(
            "overwrite"
        ).parquet(paths.segments)
        write_manifest(
            paths.root,
            "segments",
            {"fingerprint": fp, "generations": [], "rows": 0, "postings": 0,
             "bytes": dir_bytes(paths.segments), "n_groups": actual_groups},
        )
        log("stage3 segments committed: 0 rows (empty corpus)")
        return {
            "n_docs": stats.n_docs,
            "avgdl": stats.avgdl,
            "n_groups": actual_groups,
            "segment_rows": 0,
            "postings": 0,
            "index_bytes": dir_bytes(paths.root),
        }

    if pending_merge:
        import shutil

        if not generations:
            # first build / full rebuild: wipe any stale layout (legacy
            # root files, fingerprint-mismatched gens), then gen=0
            if read_manifest(paths.root, "segments") is not None:
                os.remove(os.path.join(paths.root, MANIFEST_DIR_NAME, "segments.json"))
            if os.path.isdir(paths.segments):
                shutil.rmtree(paths.segments, ignore_errors=True)
            gd = _merge_groups_to_gen(sorted(all_group_ids), 0)
            generations = [gd]
            _commit_segments(generations)
            log(
                f"stage3 gen 0 committed: {gd['rows']} rows "
                f"({gd['postings']} postings, full merge)"
            )
        else:
            _clean_unlisted_gen_dirs()
            next_gen = max(int(g["gen"]) for g in generations) + 1
            gd = _merge_groups_to_gen(pending_merge, next_gen)
            generations = generations + [gd]
            _commit_segments(generations)
            log(
                f"stage3 gen {next_gen} committed: {gd['rows']} rows for "
                f"groups {pending_merge} (incremental append — "
                f"{gd['bytes']} bytes written, index untouched)"
            )
            if len(generations) > cfg.max_segment_generations:
                # SIZE-TIERED compaction (Lucene-style): merge only the
                # smallest generations — the minimum count that restores
                # the bound, greedily extended while the next-smallest is
                # no larger than everything taken so far (similar-sized
                # tiers merge together; the big old tiers are left
                # untouched). A full re-merge every time the cap is hit
                # would amortize to O(index) write IO per append; tiered
                # merging amortizes to O(log) rewrites per doc. Manifest
                # commits FIRST, then the old directories drop (readers
                # only follow the manifest, so a crash in between leaves
                # garbage dirs that the next build sweeps — never
                # double-served postings).
                by_size = sorted(generations, key=lambda g: (g["bytes"], g["gen"]))
                m = len(generations) - cfg.max_segment_generations + 1
                taken = by_size[:m]
                acc = sum(g["bytes"] for g in taken)
                for g in by_size[m:]:
                    if g["bytes"] <= acc:
                        taken.append(g)
                        acc += g["bytes"]
                    else:
                        break
                merge_groups = sorted(x for g in taken for x in g["groups"])
                comp_gen = next_gen + 1
                # source_gens: when the taken groups' run dirs are gone
                # (gc_runs), compaction re-reads the taken generations'
                # own segment rows — the index is self-sufficient
                gd = _merge_groups_to_gen(merge_groups, comp_gen, source_gens=taken)
                taken_ids = {int(g["gen"]) for g in taken}
                generations = [
                    g for g in generations if int(g["gen"]) not in taken_ids
                ] + [gd]
                generations.sort(key=lambda g: int(g["gen"]))
                _commit_segments(generations)
                for gid in taken_ids:
                    shutil.rmtree(
                        os.path.join(paths.segments, f"gen={gid}"),
                        ignore_errors=True,
                    )
                log(
                    f"stage3 size-tiered compaction: generations "
                    f"{sorted(taken_ids)} (groups {merge_groups}) -> gen "
                    f"{comp_gen} ({gd['rows']} rows); "
                    f"{len(generations)} generations remain"
                )

    if cfg.gc_runs:
        gc_run_dirs(paths.root, log=log)

    seg_m = read_manifest(paths.root, "segments") or {}
    return {
        "n_docs": stats.n_docs,
        "avgdl": stats.avgdl,
        "n_groups": actual_groups,
        "segment_rows": seg_m.get("rows"),
        "postings": seg_m.get("postings"),
        "index_bytes": dir_bytes(paths.root),
    }
