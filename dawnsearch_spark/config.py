"""Engine configuration.

Reference analog: ``Config`` loaded from TOML + env with env taking
precedence (/root/reference/src/config.rs:22-73). The reference has no BM25
constants (it is an embedding engine; its hardcoded internal k is 20 at
src/search/search_provider.rs:214 and the example CLIs display top-10 at
examples_old/search.rs:55-63); k1/b/top_k here are OUR pinned constants,
enforced by the exact-scan oracle (BASELINE.md).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields, replace

try:  # python >= 3.11
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None


@dataclass(frozen=True)
class EngineConfig:
    # --- BM25 scoring (pinned; see BASELINE.md) ---
    k1: float = 1.2
    b: float = 0.75
    top_k: int = 10
    # Internal over-fetch at the partition level, mirroring the reference's
    # internal k=20 vs displayed 10 (search_provider.rs:214).
    top_k_internal: int = 20

    # --- index layout ---
    # Number of term-hash buckets the final segments are partitioned by
    # (partition pruning unit for query-term lookups).
    num_term_buckets: int = 32
    # Docs per doc-range; heavy-term posting rows are chunked per range so a
    # single query task never touches more than one range of a heavy list.
    range_size: int = 65536
    # Postings per block inside a posting row (block-max WAND skip unit).
    block_size: int = 128

    # --- skew handling (north_rule: salted groupBy-term) ---
    # A term whose df exceeds the EFFECTIVE threshold is "heavy"
    # (stopword-like): its postings shuffle as (term, doc_id // range_size)
    # so no reducer group exceeds range_size postings. An absolute value
    # here overrides; the default None scales the threshold with the
    # corpus: clamp(n_docs * heavy_df_ratio, heavy_df_min, heavy_df_max).
    # Why a ratio: with threshold = r*N the heavy-set size is bounded by
    # total_postings / (r*N) = avgdl / r — INDEPENDENT of corpus size — so
    # the broadcast stays small from 10^5 to 10^12 docs, while a fixed
    # 100k threshold at 10^12 files makes millions of terms heavy.
    heavy_df_threshold: int | None = None
    heavy_df_ratio: float = 0.01
    heavy_df_min: int = 1024
    # Ceiling so no single unsalted (light) posting list can exceed one
    # reducer/task's memory regardless of corpus size (1M postings packs
    # to a few MB of varbyte).
    heavy_df_max: int = 1_000_000
    num_salts: int = 16
    # Query-time budget on postings decoded ON THE DRIVER (light lists +
    # the fast-path heavy rows + the θ-seed range). Light lists are taken
    # smallest-first until the budget is hit; the rest are range-split on
    # the executors and scored in the distributed range tasks, so a
    # 10-term query of mid-frequency terms (df just under heavy_df_max)
    # can never accumulate hundreds of MB of driver NumPy. 2M postings
    # varbyte-decode to ~50 MB of int64 arrays.
    max_driver_postings: int = 2_000_000
    # Phrase serving (operators/phrase_serve.py): max candidate docs whose
    # CONTENT the driver hydrates for the zero-job adjacency check. The
    # candidate set is bounded by the rarest phrase term's df; above this
    # cap the adjacency pass runs distributed over an id-pruned scan
    # instead (content rows are ~KBs each, so 4096 ≈ a few MB of driver
    # pandas — independent of corpus size).
    max_driver_phrase_docs: int = 4096
    # The Engine keeps the segment METADATA (term, range_id, n_docs,
    # max_tf, min_dl — no blobs) on the driver when the index's
    # segment-row count fits this bound: the in-RAM term dictionary of a
    # classical search engine. It removes the per-query metadata-planning
    # job (the query then costs exactly ONE Spark job on the driver fast
    # path). Indexes above the bound fall back to a column-pruned
    # metadata collect per query. The dictionary is COLUMNAR (one NumPy
    # array per column + a term->slice index, plans/query.py TermMeta):
    # 4 int64 columns = 32 B/row plus the unique-term strings, so 2M rows
    # ≈ 70-120 MB of driver heap (measured via TermMeta.nbytes; the
    # previous dict-of-dicts layout cost ~300+ B/row).
    max_driver_meta_rows: int = 2_000_000
    # Bound (in POSTINGS) of the Engine's light-list LRU: decoded light
    # posting lists for repeated serving terms stay resident between
    # queries (the reference keeps its whole index in RAM between
    # queries, search_provider.rs:111-120). 4M postings ≈ 100 MB of int64
    # arrays. 0 disables the cache.
    light_cache_postings: int = 4_000_000
    # Bound (in POSTINGS) of the Engine's heavy-row LRU: bound-attached,
    # doc-decoded heavy segment rows for repeated serving terms stay
    # resident between queries, exactly like the light-list LRU (bounds
    # and idf are fixed per index state, so cached rows are
    # query-independent; tf/dl blocks still decode lazily per query).
    # 0 disables the cache. NOT part of the config fingerprint. Sized
    # above the light LRU because one stopword-like term spans ~N/100
    # postings: a 25-query reference working set holds ~3-4M heavy
    # postings, and an LRU at exactly that size thrashes. 16M postings
    # ≈ 130 MB of int64 doc arrays + ~50 MB of blobs.
    heavy_cache_postings: int = 16_000_000
    # Tiered segment generations: an append merges only its new runs into
    # a fresh generation (O(batch) IO); above this many generations one
    # compaction job re-merges everything into a single generation.
    # Query-time read amplification is bounded by this count (a term adds
    # at most one light row per generation).
    max_segment_generations: int = 6
    # The heavy-term set ships to stage-2 tasks as a Spark broadcast while
    # it is small; above this size the build falls back to the join-based
    # salting path (postings.with_salt, shuffle join — slower, unbounded).
    max_broadcast_heavy_terms: int = 200_000
    # Heavy-term detection for SALTING runs on a sampled pass (exact df is
    # derived later from run metadata at zero extra cost): fraction of the
    # corpus tokenized, floored so at least `heavy_sample_min_docs` docs
    # are sampled (tiny corpora -> exact). Misclassification near the
    # boundary is safe either way: sampled-heavy-but-light terms serve
    # from salted rows, sampled-light-but-heavy runs are re-salted at
    # merge (reclassify_runs).
    heavy_sample_fraction: float = 0.01
    heavy_sample_min_docs: int = 20_000

    # --- build ---
    # Stage-1 shuffle partitions for the posting-run build.
    build_partitions: int = 32
    # Columns that define document identity / deterministic docID order.
    id_cols: tuple[str, ...] = ("repo", "path", "commit")
    content_col: str = "content"

    # Delete run-group directories once their postings are recoverable
    # from the index itself (group folded into the committed dictionary
    # AND merged into a committed generation). Compaction and the stage-1b
    # dictionary fallback re-read segment rows when runs are gone, so
    # nothing downstream needs them — retaining runs/ forever costs a
    # second copy of the index (~2x storage at 100 TB). Off by default:
    # retained runs let a fingerprint-change rebuild skip stage 2.
    # Deliberately NOT part of the config fingerprint (storage policy,
    # not index layout).
    gc_runs: bool = False

    # --- checkpoint / resume ---
    checkpoint_dir: str = ""

    # --- misc ---
    snippet_len: int = 500  # serve-time snippet truncation (web.rs:328 analog)

    def effective_heavy_df_threshold(self, n_docs: int) -> int:
        """The df above which a term is salted, for a corpus of n_docs."""
        if self.heavy_df_threshold is not None:
            return self.heavy_df_threshold
        return max(
            self.heavy_df_min, min(int(n_docs * self.heavy_df_ratio), self.heavy_df_max)
        )

    def scaled_for_tests(self) -> "EngineConfig":
        """Small-corpus variant: tiny ranges/thresholds so the heavy-term,
        multi-range and multi-block code paths are exercised at unit scale."""
        return replace(
            self,
            range_size=64,
            block_size=8,
            heavy_df_threshold=32,
            num_salts=4,
            num_term_buckets=8,
            build_partitions=8,
        )


_ENV_PREFIX = "DAWNSEARCH_SPARK_"


def load_config(toml_path: str | None = None) -> EngineConfig:
    """TOML file < environment variables, mirroring the reference's
    load precedence (config.rs:42-73: file then env overrides)."""
    values: dict[str, object] = {}
    if toml_path and tomllib is not None and os.path.exists(toml_path):
        with open(toml_path, "rb") as f:
            data = tomllib.load(f)
        values.update(data.get("engine", data))
    for f in fields(EngineConfig):
        env_key = _ENV_PREFIX + f.name.upper()
        if env_key in os.environ:
            raw = os.environ[env_key]
            ftype = str(f.type)
            if "bool" in ftype:
                values[f.name] = raw.strip().lower() in ("1", "true", "yes", "on")
            elif "float" in ftype:
                values[f.name] = float(raw)
            elif "int" in ftype:  # includes "int | None" (e.g. heavy_df_threshold)
                values[f.name] = None if raw.lower() in ("", "none") else int(raw)
            elif f.name == "id_cols":
                values[f.name] = tuple(raw.split(","))
            else:
                values[f.name] = raw
    known = {f.name for f in fields(EngineConfig)}
    values = {k: v for k, v in values.items() if k in known}
    if "id_cols" in values and not isinstance(values["id_cols"], tuple):
        values["id_cols"] = tuple(values["id_cols"])
    return EngineConfig(**values)  # type: ignore[arg-type]
