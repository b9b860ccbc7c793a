"""Block-max WAND top-k query executor.

Reference semantics being preserved (SURVEY.md §2.5 T1/T4, §4 P1/P2):
* local-then-scatter-gather with a shipped pruning threshold — the
  reference seeds a bounded top-k with local hits, captures its worst
  distance and ships it so peers filter before responding
  (/root/reference/src/search/search_service.rs:201-236;
  /root/reference/src/net/udp_service.rs:196-200). Here: the driver scores
  the small ("light") posting lists exactly, seeds θ, and the distributed
  range tasks prune candidates whose block-max upper bound is below θ;
* bounded top-k accumulator with (score desc, doc_id asc) final order
  (/root/reference/src/search/best_results.rs:28-79);
* per-search observability counters, the analog of the reference's
  ``servers_contacted`` / ``pages_searched``
  (/root/reference/src/search/search_provider.rs:44-59): ranges pruned,
  blocks decoded, postings scored, driver postings decoded, path taken;
* unlike the reference's 200 ms best-effort deadline gather
  (udp_service.rs:300-341), the Spark stage barrier makes our merge
  complete — results are exact, verified rank-identical to the full-scan
  oracle.

Execution shape (serving fast path: ZERO Spark jobs; distributed path:
one pruned scan job + a tiny collect):
  query terms -> bucket + term pruning; metadata comes from the Engine's
     COLUMNAR driver-resident term dictionary (plans/query.py TermMeta),
     else a column-pruned fetch. Global df per term = Σ n_docs over the
     term's rows (ranges and generations are disjoint doc sets), so idf
     is exact under incremental appends with nothing stats-dependent
     stored in the index
  -> pruned segment rows read driver-side via pyarrow.fs whenever it can
     mount the segments dir (local paths AND object-store URIs —
     reference S7 in-process segment scan, document_embeddings.rs:17-54);
     Spark collect otherwise. Only MANIFEST-LISTED generation dirs are
     read (never compaction leftovers)
  -> light rows decoded on the driver through the Engine's bounded
     LightListCache LRU (repeated serving terms skip fetch+decode),
     smallest-TERM-first under a hard ``max_driver_postings`` budget;
     overflow light lists are RANGE-SPLIT on the executors (mapInPandas
     decode -> per-doc-range re-pack) into rows shaped exactly like
     heavy range rows
  -> heavy + split rows grouped into range tasks (applyInPandas); each
     task derives EXACT per-block BM25 maxima from the rows' stats-free
     (tf, dl) Pareto fronts under current stats (_attach_bounds),
     processes its doc-ranges in descending upper-bound order, maintains
     a rising local θ (seeded from the driver's light pass PLUS a driver
     pre-score of the single best-upper-bound range), prunes whole
     ranges by Σ over terms of the per-term row-max bound, prunes
     candidates by per-block max, and decodes tf/dl only for blocks that
     still have survivors
  -> driver merges per-task top-k (dedup keep-max), final sort.

The per-doc score for any doc is computed whole inside exactly one range
task (all heavy/split rows of a doc-range carry the same range_id, and the
driver-resident light lists are sliced per range inside the task), so the
keep-max merge never adds partial scores — the merge is exact. With
tiered generations a (term, range) may span several rows holding
DISJOINT doc subsets: per-term bounds take the MAX over rows, exact
contributions accumulate row by row (each doc matches at most one row).

All per-posting work is NumPy-vectorized. Scores accumulate per doc in
ascending-term order in float64 — bitwise identical to the oracle's fold
(SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import zlib
from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawnsearch_spark.config import EngineConfig
from dawnsearch_spark.functions.bm25 import bm25_np, idf_np
from dawnsearch_spark.functions.codec import varbyte_decode
from dawnsearch_spark.functions.tokenizer import tokenize_py
from dawnsearch_spark.index_build import IndexPaths, load_stats
from dawnsearch_spark.operators.tf import CorpusStats

# Data rows carry doc_id >= 0 with zeroed counters; each task additionally
# emits ONE summary row (doc_id = -1) whose counter columns hold the task's
# totals — the driver splits on the sign and sums the summaries.
RESULT_SCHEMA = (
    "doc_id long, score double, "
    "ranges_pruned long, blocks_decoded long, postings_scored long"
)

_CTR_KEYS = ("ranges_pruned", "blocks_decoded", "postings_scored")


def new_counters() -> dict:
    return {
        "path": "",
        "terms": 0,
        "light_terms_driver": 0,
        "light_terms_overflow": 0,
        "heavy_rows": 0,
        "driver_postings_decoded": 0,
        "ranges_pruned": 0,
        "blocks_decoded": 0,
        "postings_scored": 0,
        # θ-seed pre-pass work (driver-side, distributed branch only) —
        # kept separate so blocks_decoded stays comparable to the index's
        # block directory totals
        "seed_blocks_decoded": 0,
        "seed_postings_scored": 0,
        "theta_seed": 0.0,
        # "range" when the best range fit the driver budget and was scored
        # whole, "block" when it did not and the single best block of its
        # best row seeded θ instead (the 100x-index shape), "" otherwise
        "theta_seed_mode": "",
        # light-list LRU (Engine serving only; 0/0 when no cache in play)
        "light_cache_hits": 0,
        "light_cache_misses": 0,
        # active tombstoned docIDs filtered from this search (Lucene-style
        # deletes pending purge)
        "tombstones": 0,
    }


@dataclass
class LightList:
    term: str
    qtf: float
    idf: float
    docs: np.ndarray
    tfs: np.ndarray
    dls: np.ndarray


class LightListCache:
    """Bounded LRU of DECODED light posting lists, keyed by term.

    The reference keeps its whole index resident in RAM between queries
    (load once, serve many — search_provider.rs:111-120); our driver
    analog is this cache: repeated serving terms skip the fetch+varbyte
    decode entirely. It caches only the query-independent arrays
    (docs/tfs/dls per generation row) — qtf and idf are query-time.
    Bounded by total cached POSTINGS (the actual memory driver), evicted
    LRU. One cache belongs to ONE immutable segment state: the Engine
    rebuilds it on ``refresh()`` (appends rewrite the generation list, so
    a stale cache could serve dropped rows)."""

    def __init__(self, max_postings: int = 4_000_000):
        import threading
        from collections import OrderedDict

        self._d: "OrderedDict[str, list[tuple]]" = OrderedDict()
        self._postings: dict[str, int] = {}
        self._total = 0
        self.max_postings = int(max_postings)
        self.hits = 0
        self.misses = 0
        # one Engine serves many in-flight searches (the reference's
        # ActiveSearch table, udp_service.rs:296-341); the LRU reorder in
        # get() and the evict loop in put() are the only cross-search
        # mutations — a lock keeps them safe and costs ~100ns against a
        # cache hit that saves a fetch + varbyte decode
        self._lock = threading.Lock()

    def get(self, term: str):
        with self._lock:
            rows = self._d.get(term)
            if rows is None:
                self.misses += 1
                return None
            self._d.move_to_end(term)
            self.hits += 1
            return rows

    def drop_terms(self, terms) -> int:
        """Evict specific terms (incremental refresh: only terms that
        gained a light row in a NEW generation go stale — every other
        cached list still matches the on-disk rows). Returns evictions."""
        n = 0
        with self._lock:
            for t in terms:
                if t in self._d:
                    del self._d[t]
                    self._total -= self._postings.pop(t)
                    n += 1
        return n

    def put(self, term: str, rows: list[tuple], n_postings: int) -> None:
        if n_postings > self.max_postings:
            return  # never let one giant term flush the whole cache
        with self._lock:
            if term in self._d:
                self._total -= self._postings[term]
            self._d[term] = rows
            self._postings[term] = int(n_postings)
            self._total += int(n_postings)
            self._d.move_to_end(term)
            while self._total > self.max_postings and self._d:
                old_term, _ = self._d.popitem(last=False)
                self._total -= self._postings.pop(old_term)


def _term_bucket(term: str, num_buckets: int) -> int:
    return (zlib.crc32(term.encode("utf-8")) & 0xFFFFFFFF) % num_buckets


def _decode_row_docs(row: dict) -> np.ndarray:
    gaps = varbyte_decode(row["doc_blob"], int(row["n_docs"]))
    return np.cumsum(gaps.astype(np.int64))


def _row_to_dict(r) -> dict:
    return {
        "term": r["term"],
        "range_id": int(r["range_id"]),
        "n_docs": int(r["n_docs"]),
        "doc_blob": bytes(r["doc_blob"]),
        "tf_blob": bytes(r["tf_blob"]),
        "dl_blob": bytes(r["dl_blob"]),
        "block_last": np.asarray(r["block_last"], np.int64),
        "block_doc_off": np.asarray(r["block_doc_off"], np.int64),
        "block_tf_off": np.asarray(r["block_tf_off"], np.int64),
        "block_dl_off": np.asarray(r["block_dl_off"], np.int64),
        "front_tf": np.asarray(r["front_tf"], np.int64),
        "front_dl": np.asarray(r["front_dl"], np.int64),
        "front_off": np.asarray(r["front_off"], np.int64),
    }


def _attach_bounds(rd: dict, idf: float, stats: CorpusStats, cfg: EngineConfig) -> dict:
    """Derive the EXACT per-block BM25 maxima for one segment row under
    the CURRENT corpus stats. Rows store the stats-free Pareto front of
    (tf, dl) per block; BM25 is monotone increasing in tf and decreasing
    in dl, so the block max over the front equals the block max over all
    member postings for ANY (idf, avgdl) — full pruning power no matter
    how many appends happened since the row was written."""
    fvals = bm25_np(rd["front_tf"], rd["front_dl"], idf, stats.avgdl, cfg.k1, cfg.b)
    rd["block_ub"] = np.maximum.reduceat(fvals, rd["front_off"][:-1])
    rd["row_ub"] = float(rd["block_ub"].max())
    return rd


def _meta_row_ub(r, idf: float, stats: CorpusStats, cfg: EngineConfig) -> float:
    """Row-level upper bound from the scalar (max_tf, min_dl) metadata."""
    tf = float(r["max_tf"])
    dl = float(r["min_dl"])
    return float(
        idf * (tf * (cfg.k1 + 1.0)) / (tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / stats.avgdl))
    )


def _decode_blocks_tf_dl(
    row: dict, blocks: np.ndarray, block_size: int, ctr: dict | None = None
) -> dict[int, tuple]:
    """Decode tf/dl streams only for the given block ids (BMW's saving).

    Consecutive needed blocks are decoded as ONE varbyte call per stream
    (their byte ranges are adjacent by construction of the directory) and
    sliced per block afterwards: the per-call NumPy overhead, not the
    bytes, dominates at block_size-sized payloads, and candidates usually
    hit runs of adjacent blocks. Only the needed blocks' bytes are ever
    touched either way."""
    out = {}
    n = int(row["n_docs"])
    if ctr is not None:
        ctr["blocks_decoded"] += len(blocks)
    tf_off = row["block_tf_off"]
    dl_off = row["block_dl_off"]
    tf_mv = memoryview(row["tf_blob"])
    dl_mv = memoryview(row["dl_blob"])
    i = 0
    m = len(blocks)
    while i < m:
        j = i
        while j + 1 < m and int(blocks[j + 1]) == int(blocks[j]) + 1:
            j += 1
        b0, b1 = int(blocks[i]), int(blocks[j])
        s = b0 * block_size
        cnt = min((b1 + 1) * block_size, n) - s
        tfs = varbyte_decode(tf_mv[tf_off[b0] : tf_off[b1 + 1]], cnt).astype(np.int64)
        dls = varbyte_decode(dl_mv[dl_off[b0] : dl_off[b1 + 1]], cnt).astype(np.int64)
        for b in range(b0, b1 + 1):
            a = (b - b0) * block_size
            out[b] = (tfs[a : a + block_size], dls[a : a + block_size])
        i = j + 1
    return out


def _exact_light_scores(
    lights: list[LightList], stats: CorpusStats, cfg: EngineConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Exact TAAT scoring over fully-decoded light lists (ascending-term
    accumulation). Returns (doc_ids, scores)."""
    if not lights:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    all_docs = np.unique(np.concatenate([l.docs for l in lights]))
    acc = np.zeros(len(all_docs), np.float64)
    for l in sorted(lights, key=lambda x: x.term):
        pos = np.searchsorted(all_docs, l.docs)
        acc[pos] += l.qtf * bm25_np(l.tfs, l.dls, l.idf, stats.avgdl, cfg.k1, cfg.b)
    return all_docs, acc


def _topk_merge(doc_ids, scores, k: int) -> list[tuple[int, float]]:
    """Dedup keep-max, then (score desc, doc_id asc) top-k."""
    best: dict[int, float] = {}
    for d, s in zip(doc_ids, scores):
        d = int(d)
        if s > best.get(d, -1.0):
            best[d] = float(s)
    return sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _topk_unique(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> list[tuple[int, float]]:
    """(score desc, doc_id asc) top-k for ALREADY-UNIQUE doc ids —
    vectorized (the per-doc Python dict of :func:`_topk_merge` costs more
    than the whole scoring pass on corpus-sized result sets). Exact same
    ordering contract: boundary ties resolved by doc_id ascending via a
    full lexsort of every row tied with the kth score."""
    n = len(doc_ids)
    if n <= k:
        idx = np.lexsort((doc_ids, -scores))
        return [(int(doc_ids[i]), float(scores[i])) for i in idx]
    thresh = np.partition(scores, n - k)[n - k]
    cand = np.flatnonzero(scores >= thresh)
    order = np.lexsort((doc_ids[cand], -scores[cand]))[:k]
    sel = cand[order]
    return [(int(doc_ids[i]), float(scores[i])) for i in sel]


def _score_one_range(
    lo: int,
    hi: int,
    heavy_rows: dict[str, list[dict]],
    lights: list[LightList],
    qmeta: list[tuple[str, float, float]],  # (term, qtf, idf) ascending term
    theta: float,
    stats: CorpusStats,
    cfg: EngineConfig,
    ctr: dict | None = None,
    tomb: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact scores for surviving docs of one doc-range.

    ``heavy_rows`` maps term -> LIST of segment rows: with tiered segment
    generations a (term, range) can have one row per generation, holding
    DISJOINT doc sets (a doc is indexed by exactly one generation). A
    term's upper bound for a doc is therefore the MAX over its rows'
    block bounds (never the sum), and exact contributions accumulate row
    by row — each doc matches in at most one row. Rows must arrive with
    ``block_ub``/``row_ub`` attached (see :func:`_attach_bounds`)."""
    # light slices restricted to this range, scored exactly (cheap, small)
    slices: dict[str, list[tuple]] = {}
    light_ub = 0.0
    term_slice_max: dict[str, float] = {}
    for l in lights:
        a, b_ = np.searchsorted(l.docs, lo), np.searchsorted(l.docs, hi)
        if a == b_:
            continue
        sc = l.qtf * bm25_np(l.tfs[a:b_], l.dls[a:b_], l.idf, stats.avgdl, cfg.k1, cfg.b)
        slices.setdefault(l.term, []).append((l.docs[a:b_], sc))
        # several light rows of one term (one per generation) hold
        # disjoint docs -> per-term bound is the max over rows
        term_slice_max[l.term] = max(term_slice_max.get(l.term, 0.0), float(sc.max()))
    light_ub = sum(term_slice_max.values())
    # range-level screen before any heavy decode
    heavy_ub = sum(
        qtf * max(r["row_ub"] for r in heavy_rows[t])
        for t, qtf, _ in qmeta
        if t in heavy_rows
    )
    if heavy_ub + light_ub < theta:
        if ctr is not None:
            ctr["ranges_pruned"] += 1
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    heavy_docs = {
        t: [
            r["_docs"] if "_docs" in r else _decode_row_docs(r)
            for r in rows
        ]
        for t, rows in heavy_rows.items()
    }
    cand_parts = [d for ds in heavy_docs.values() for d in ds] + [
        s[0] for lst in slices.values() for s in lst
    ]
    cand = np.unique(np.concatenate(cand_parts))
    if tomb is not None and len(tomb):
        # tombstoned docs leave the candidate set BEFORE any bound or θ
        # is derived — a deleted doc must neither appear in results nor
        # inflate θ (heavy_docs stay unmasked: positions into them drive
        # the block-offset arithmetic below). Light slices are already
        # tombstone-free (masked at LightList construction).
        from dawnsearch_spark.operators.merge import _tombstone_mask

        cand = cand[_tombstone_mask(cand, tomb)]
        if not len(cand):
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
    # per-doc upper bound: block-max for heavy, exact for light
    ub = np.zeros(len(cand), np.float64)
    for t, qtf, _idf in qmeta:
        if t in heavy_rows:
            tub = None
            for row in heavy_rows[t]:
                blk = np.searchsorted(row["block_last"], cand)
                valid = blk < len(row["block_last"])
                cur = np.zeros(len(cand), np.float64)
                cur[valid] = row["block_ub"][blk[valid]]
                tub = cur if tub is None else np.maximum(tub, cur)
            ub += qtf * tub
        if t in slices:
            for sdocs, ssc in slices[t]:
                ub[np.searchsorted(cand, sdocs)] += ssc
    keep = ub >= theta
    if not keep.any():
        if ctr is not None:
            ctr["ranges_pruned"] += 1
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    surv = cand[keep]
    acc = np.zeros(len(surv), np.float64)
    if ctr is not None:
        ctr["postings_scored"] += int(len(surv))
    for t, qtf, idf in qmeta:  # ascending-term fold (rank determinism)
        for row, docs_t in zip(heavy_rows.get(t, ()), heavy_docs.get(t, ())):
            pos = np.searchsorted(docs_t, surv)
            m = (pos < len(docs_t)) & (docs_t[np.minimum(pos, len(docs_t) - 1)] == surv)
            if m.any():
                p = pos[m]
                blocks = np.unique(p // cfg.block_size)
                tfdl = _decode_blocks_tf_dl(row, blocks, cfg.block_size, ctr)
                tf_v = np.empty(len(p), np.int64)
                dl_v = np.empty(len(p), np.int64)
                for b in blocks:
                    sel = (p // cfg.block_size) == b
                    off = p[sel] - b * cfg.block_size
                    tf_v[sel] = tfdl[int(b)][0][off]
                    dl_v[sel] = tfdl[int(b)][1][off]
                acc[m] += qtf * bm25_np(tf_v, dl_v, idf, stats.avgdl, cfg.k1, cfg.b)
        for sdocs, ssc in slices.get(t, ()):
            pos = np.searchsorted(surv, sdocs)
            m = (pos < len(surv)) & (surv[np.minimum(pos, len(surv) - 1)] == sdocs)
            acc[pos[m]] += ssc[m]
    return surv, acc


def _result_frame(top: list[tuple[float, int]], ctr: dict) -> pd.DataFrame:
    """Data rows + one doc_id=-1 summary row carrying the task counters."""
    zeros = [0] * len(top)
    return pd.DataFrame(
        {
            "doc_id": [d for _, d in top] + [-1],
            "score": [s for s, _ in top] + [0.0],
            "ranges_pruned": zeros + [ctr["ranges_pruned"]],
            "blocks_decoded": zeros + [ctr["blocks_decoded"]],
            "postings_scored": zeros + [ctr["postings_scored"]],
        }
    )


def _group_rows_by_range(
    rows, qmeta, stats: CorpusStats, cfg: EngineConfig
) -> dict[int, dict[str, list[dict]]]:
    """range_id -> term -> [bound-attached row dicts] (one per generation)."""
    idf_by_term = {t: idf for t, _qtf, idf in qmeta}
    by_range: dict[int, dict[str, list[dict]]] = {}
    for r in rows:
        rd = _attach_bounds(_row_to_dict(r), idf_by_term[r["term"]], stats, cfg)
        by_range.setdefault(int(r["range_id"]), {}).setdefault(r["term"], []).append(rd)
    return by_range


def _score_ranges(
    by_range: dict[int, dict[str, list[dict]]],
    lights: list[LightList],
    qmeta: list[tuple[str, float, float]],
    theta0: float,
    k: int,
    stats: CorpusStats,
    cfg: EngineConfig,
    ctr: dict,
    tomb: np.ndarray | None = None,
) -> list[tuple[float, int]]:
    """Shared WAND core for both the driver fast path and the range
    tasks: visit doc-ranges in descending upper-bound order so the local
    θ rises fast (reference analog: local top-k first, then pruned
    remote merge, search_service.rs:201-236). Per term the range bound
    is the MAX over its generation rows (disjoint doc sets), never the
    sum. Returns the bounded (score, doc_id) top list."""
    import heapq

    theta = theta0
    # survivors accumulate as (scores, docs) array chunks; ordering and
    # truncation run vectorized (lexsort on (-score, doc) — the exact
    # final tie rule) instead of per-tuple key lambdas, which were ~15%
    # of driver-path serving latency at 200 ranges/query
    chunks: list[tuple[np.ndarray, np.ndarray]] = []
    n_found = 0
    # min-heap of the k best scores seen so far: θ = heap root, updated in
    # O(log k) per survivor instead of a full sort per range
    heap: list[float] = []

    def _best(limit: int | None) -> tuple[np.ndarray, np.ndarray]:
        s = np.concatenate([c[0] for c in chunks]) if chunks else np.zeros(0)
        d = (
            np.concatenate([c[1] for c in chunks])
            if chunks
            else np.zeros(0, np.int64)
        )
        idx = np.lexsort((d, -s))
        if limit is not None:
            idx = idx[:limit]
        return s[idx], d[idx]

    order = sorted(
        by_range.items(),
        key=lambda kv: -sum(
            qtf * max(r["row_ub"] for r in kv[1][t])
            for t, qtf, _ in qmeta
            if t in kv[1]
        ),
    )
    for range_id, heavy_rows in order:
        lo = range_id * cfg.range_size
        hi = lo + cfg.range_size
        surv, acc = _score_one_range(
            lo, hi, heavy_rows, lights, qmeta, theta, stats, cfg, ctr, tomb
        )
        if len(surv):
            chunks.append((acc, surv))
            n_found += len(surv)
            for fs in acc.tolist():
                if len(heap) < k:
                    heapq.heappush(heap, fs)
                elif fs > heap[0]:
                    heapq.heapreplace(heap, fs)
        if n_found > 4096:
            # bound memory only — retaining the best 4k by the final key
            # keeps the top-k set exact regardless of truncation schedule
            s, d = _best(4 * k)
            chunks = [(s, d)]
            n_found = len(s)
        if len(heap) >= k and heap[0] > theta:
            theta = heap[0]
    s, d = _best(None)
    return list(zip(s.tolist(), d.tolist()))


def make_range_scorer(
    lights: list[LightList],
    qmeta: list[tuple[str, float, float]],
    theta0: float,
    k: int,
    stats: CorpusStats,
    cfg: EngineConfig,
    tomb=None,
):
    """applyInPandas wrapper over :func:`_score_ranges`. ``tomb`` (sorted
    tombstoned docIDs, plain array or ``pyspark.Broadcast`` of one) is
    bounded by the tombstone set between purges — the same budget
    Lucene's per-segment live-docs bitmaps carry; callers pass a
    Broadcast so the set ships once per executor, not once per task."""

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        t = tomb.value if hasattr(tomb, "value") else tomb
        ctr = {key: 0 for key in _CTR_KEYS}
        by_range = _group_rows_by_range(pdf.to_dict("records"), qmeta, stats, cfg)
        found = _score_ranges(
            by_range, lights, qmeta, theta0, k, stats, cfg, ctr, t
        )
        return _result_frame(found[:k], ctr)

    return scorer


def _split_light_rows_gen(cfg: EngineConfig):
    """mapInPandas generator: range-split overflow light rows into rows
    shaped exactly like heavy range rows (same blocked varbyte layout,
    block-bound directory recomputed per slice; idf is unaffected — the
    driver derives global df from the METADATA rows before splitting, so
    scores are identical to the unsplit list). This is the executor
    half of the driver-postings budget: the decode of a big light list
    happens here, bounded per row by ``heavy_df_max``, never on the
    driver. Reference analog: the bounded accumulator + shipped threshold
    (best_results.rs:28-65) — overflow lists join the same pruned
    distributed merge as heavy terms instead of a driver hot spot."""
    from dawnsearch_spark.functions.codec import decode_all_postings
    from dawnsearch_spark.operators.merge import SEGMENT_COLS, _make_segment_row

    range_size = cfg.range_size

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                row = {
                    "n_docs": int(r.n_docs),
                    "doc_blob": bytes(r.doc_blob),
                    "tf_blob": bytes(r.tf_blob),
                    "dl_blob": bytes(r.dl_blob),
                }
                docs, tfs, dls = decode_all_postings(row, cfg.block_size)
                ranges = docs // range_size
                bounds = np.concatenate(
                    ([0], np.flatnonzero(ranges[1:] != ranges[:-1]) + 1, [len(docs)])
                )
                for s, e in zip(bounds[:-1], bounds[1:]):
                    out.append(
                        _make_segment_row(
                            r.term,
                            int(ranges[s]),
                            docs[s:e],
                            tfs[s:e],
                            dls[s:e],
                            cfg,
                        )
                    )
            if out:
                yield pd.DataFrame({c: [o[c] for o in out] for c in SEGMENT_COLS})

    return gen


def search_index(
    spark: SparkSession,
    index_root: str,
    query: str | dict[str, float],
    cfg: EngineConfig,
    k: int | None = None,
    task_groups: int = 64,
    max_driver_heavy_rows: int = 4096,
    seg_df=None,
    stats: CorpusStats | None = None,
    counters: dict | None = None,
    meta_by_term=None,
    light_cache: "LightListCache | None" = None,
    heavy_cache: "LightListCache | None" = None,
    tombstones: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for a query string or a {term: weight} bag.

    Gathers ``top_k_internal`` candidates internally and returns ``k``
    (reference: internal k=20, displayed 10 — search_provider.rs:214,
    examples_old/search.rs:55-63).

    Driver memory is bounded by ``cfg.max_driver_postings``: light lists
    are decoded on the driver smallest-first under that budget (they seed
    θ); overflow light lists are range-split on the executors and scored
    in the distributed range tasks. The heavy-row fast path (score on the
    driver, the reference's local-search-first shape) is taken only when
    the TOTAL postings it would decode also fit the budget.

    ``counters``: pass a dict to receive per-search observability counters
    (see :func:`new_counters`) — the reference's servers_contacted /
    pages_searched analog (search_provider.rs:44-59).
    """
    ctr = counters if counters is not None else new_counters()
    for key, v in new_counters().items():
        ctr.setdefault(key, v)
    if tombstones is not None and not len(tombstones):
        tombstones = None
    ctr["tombstones"] = int(len(tombstones)) if tombstones is not None else 0
    k_out = k or cfg.top_k
    k = max(k_out, cfg.top_k_internal)
    paths = IndexPaths(index_root)
    stats = stats if stats is not None else load_stats(index_root)
    if isinstance(query, str):
        bag = Counter(tokenize_py(query))
    else:
        # float weights are Lucene-style boosts; they flow
        # multiplicatively through every scoring and bound path
        bag = {t: float(w) for t, w in query.items()}
    terms = sorted(bag)
    ctr["terms"] = len(terms)
    if not terms:
        return []
    buckets = sorted({_term_bucket(t, cfg.num_term_buckets) for t in terms})
    from dawnsearch_spark.index_build import read_segments
    from dawnsearch_spark.manifest import read_manifest

    # Spark relations are built LAZILY: the serving fast path (pyarrow
    # reads) never touches them, and even constructing a .filter() costs
    # py4j round-trips per query
    _rel: dict[str, DataFrame] = {}

    def _seg_all() -> DataFrame:
        if "all" not in _rel:
            _rel["all"] = (
                seg_df if seg_df is not None else read_segments(spark, index_root)
            )
        return _rel["all"]

    def _seg() -> DataFrame:
        if "seg" not in _rel:
            _rel["seg"] = _seg_all().filter(
                F.col("bucket").isin(buckets) & F.col("term").isin(terms)
            )
        return _rel["seg"]

    # manifest-listed generation dirs only (a compaction crash may leave
    # unlisted garbage dirs — serving must never double-read postings)
    seg_manifest = read_manifest(index_root, "segments")
    if seg_manifest is not None and "generations" in seg_manifest:
        gens = [
            int(g["gen"])
            for g in (seg_manifest.get("generations") or [])
            if int(g.get("rows", 0)) > 0  # empty gens have no files
        ]
    else:
        gens = None  # legacy layout: autodetect

    from dawnsearch_spark.operators.segment_reader import (
        META_COLUMNS,
        read_segment_rows,
    )

    def _fetch(columns=None, range_id=None, only_terms=None, heavy_only=False) -> list[dict]:
        """Pruned segment rows as plain dicts. Serving fast path: a direct
        pyarrow read of the pruned bucket files on the driver (reference
        S7 — in-process segment scan, document_embeddings.rs:17-54) —
        covers local dirs and pyarrow.fs-mountable URIs (s3://, hdfs://);
        falls back to a Spark collect job otherwise."""
        want = terms if only_terms is None else sorted(only_terms)
        rows = read_segment_rows(
            paths.segments, buckets, want, columns=columns, range_id=range_id,
            gens=gens, heavy_only=heavy_only,
        )
        if rows is not None:
            return rows
        q = _seg() if only_terms is None else _seg_all().filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(want)
        )
        if range_id is not None:
            q = q.filter(F.col("range_id") == range_id)
        if heavy_only:
            q = q.filter(F.col("range_id") >= 0)
        if columns is not None:
            q = q.select(*columns)
        return [r.asDict() for r in q.collect()]

    # ---- metadata-only plan (column-pruned: no blobs leave the scan) ----
    # ``meta_by_term`` (the Engine's driver-resident term dictionary)
    # replaces the planning read entirely when the dictionary fits driver
    # RAM; otherwise this is one cheap column-pruned fetch.
    if meta_by_term is not None:
        meta = [m for t in terms for m in meta_by_term.get(t, ())]
    else:
        meta = _fetch(columns=META_COLUMNS)
    light_meta = [r for r in meta if int(r["range_id"]) == -1]
    heavy_meta = [r for r in meta if int(r["range_id"]) >= 0]
    ctr["heavy_rows"] = len(heavy_meta)
    budget = cfg.max_driver_postings

    # idf inputs: global df per term = sum of n_docs over ALL the term's
    # segment rows — ranges partition the doc space and generations hold
    # disjoint doc sets, so the sum is exact under incremental appends
    # (rows are stats-free; nothing stored goes stale)
    term_df: dict[str, int] = {}
    for r in meta:
        term_df[r["term"]] = term_df.get(r["term"], 0) + int(r["n_docs"])
    qmeta = [
        (t, bag[t], float(idf_np(float(term_df[t]), float(stats.n_docs))))
        for t in terms
        if t in term_df
    ]
    idf_by_term = {t: idf for t, _qtf, idf in qmeta}

    # driver-resident light lists: smallest TERM first, under the budget.
    # The budget decision is per term, not per row — a term may have one
    # light row per generation and they are fetched/decoded together.
    light_total: dict[str, int] = {}
    for r in light_meta:
        light_total[r["term"]] = light_total.get(r["term"], 0) + int(r["n_docs"])
    driver_terms: list[str] = []
    overflow_terms: list[str] = []
    cum = 0
    for t in sorted(light_total, key=lambda t: (light_total[t], t)):
        if cum + light_total[t] <= budget:
            cum += light_total[t]
            driver_terms.append(t)
        else:
            overflow_terms.append(t)
    ctr["light_terms_driver"] = len(driver_terms)
    ctr["light_terms_overflow"] = len(overflow_terms)

    def _decode_light(r) -> LightList:
        rd = _row_to_dict(r)
        gaps = varbyte_decode(rd["doc_blob"], rd["n_docs"])
        return LightList(
            term=rd["term"],
            qtf=bag[rd["term"]],
            idf=idf_by_term[rd["term"]],
            docs=np.cumsum(gaps.astype(np.int64)),
            tfs=varbyte_decode(rd["tf_blob"], rd["n_docs"]).astype(np.int64),
            dls=varbyte_decode(rd["dl_blob"], rd["n_docs"]).astype(np.int64),
        )

    def _light_pass(lights: list[LightList]) -> tuple[np.ndarray, np.ndarray, float]:
        ldocs, lscores = _exact_light_scores(lights, stats, cfg)
        theta0 = 0.0
        if len(lscores) >= k:
            theta0 = float(np.partition(lscores, -k)[-k])
        return ldocs, lscores, theta0

    cache_base = (
        (light_cache.hits, light_cache.misses) if light_cache is not None else (0, 0)
    )

    def _mask_light(ll: LightList) -> LightList:
        """Tombstone-filter one decoded light list (the cache stores the
        UNMASKED arrays — they match the immutable segment rows; masking
        is per-query state)."""
        if tombstones is None:
            return ll
        from dawnsearch_spark.operators.merge import _tombstone_mask

        m = _tombstone_mask(ll.docs, tombstones)
        if m.all():
            return ll
        return LightList(ll.term, ll.qtf, ll.idf, ll.docs[m], ll.tfs[m], ll.dls[m])

    def _get_lights(wanted: list[str]) -> list[LightList]:
        """Decoded light lists for the given terms, through the Engine's
        LRU when present: cache hits skip both the segment fetch and the
        varbyte decode (driver_postings_decoded counts ACTUAL decodes, so
        repeated serving terms show up as zero decode). Counters report
        THIS search's hits/misses (delta vs the cache's running totals)."""
        out: list[LightList] = []
        missing: list[str] = []
        for t in wanted:
            cached = light_cache.get(t) if light_cache is not None else None
            if cached is None:
                missing.append(t)
            else:
                out.extend(
                    LightList(t, bag[t], idf_by_term[t], docs, tfs, dls)
                    for docs, tfs, dls in cached
                )
        if missing:
            by_term: dict[str, list[tuple]] = {}
            for r in _fetch(range_id=-1, only_terms=missing):
                ll = _decode_light(r)
                ctr["driver_postings_decoded"] += len(ll.docs)
                by_term.setdefault(ll.term, []).append((ll.docs, ll.tfs, ll.dls))
                out.append(ll)
            if light_cache is not None:
                for t, rows in by_term.items():
                    light_cache.put(t, rows, sum(len(d) for d, _, _ in rows))
        if light_cache is not None:
            ctr["light_cache_hits"] = light_cache.hits - cache_base[0]
            ctr["light_cache_misses"] = light_cache.misses - cache_base[1]
        return [_mask_light(ll) for ll in out]

    heavy_postings = sum(int(r["n_docs"]) for r in heavy_meta)

    if not heavy_meta and not overflow_terms:
        ctr["path"] = "light_only"
        lights = _get_lights(driver_terms)
        ldocs, lscores, _ = _light_pass(lights)
        return _topk_unique(ldocs, lscores, k)[:k_out]

    if (
        not overflow_terms
        and len(heavy_meta) <= max_driver_heavy_rows
        and cum + heavy_postings <= budget
    ):
        # driver-side scoring (reference's local-search-first, E1 step 3):
        # overflow is empty so every matching row fits the budget.
        # Exact TAAT over FULLY-DECODED lists instead of the block-max
        # range walk: when every posting already fits driver RAM, the
        # WAND machinery (per-range candidate building, block-bound
        # screens, lazy per-block tf/dl decodes) is pure overhead —
        # profiled at ~190 range iterations and ~1k small varbyte calls
        # per query at 200k docs, ~50x the cost of one vectorized
        # ascending-term accumulation over the same postings. Decoded
        # (docs, tfs, dls) arrays per heavy term ride the Engine's LRU
        # (the reference keeps its whole index RAM-resident between
        # queries, search_provider.rs:111-120), so warm queries decode
        # nothing at all. Scores are bit-identical to the range walk:
        # same per-(doc, term) BM25 inputs, same ascending-term float64
        # fold (each doc matches a term in exactly one generation row).
        # Block-max pruning still carries the distributed branch below —
        # the path that exists for indexes that outgrow driver budgets.
        ctr["path"] = "driver"
        lights = _get_lights(driver_terms)
        heavy_terms_q = sorted({r["term"] for r in heavy_meta})
        heavy_lights: list[LightList] = []
        missing: list[str] = []
        for t in heavy_terms_q:
            cached = heavy_cache.get(t) if heavy_cache is not None else None
            if cached is None:
                missing.append(t)
            else:
                heavy_lights.extend(
                    LightList(t, bag[t], idf_by_term[t], docs, tfs, dls)
                    for docs, tfs, dls in cached
                )
        if missing:
            by_term: dict[str, list[tuple]] = {}
            for r in _fetch(heavy_only=True, only_terms=missing):
                rd = _row_to_dict(r)
                from dawnsearch_spark.functions.codec import decode_all_postings

                docs_t, tfs_t, dls_t = decode_all_postings(rd, cfg.block_size)
                ctr["driver_postings_decoded"] += int(rd["n_docs"])
                by_term.setdefault(rd["term"], []).append((docs_t, tfs_t, dls_t))
            for t, parts in by_term.items():
                # one sorted merged list per term: generation rows hold
                # disjoint doc sets, so a stable sort of the concatenation
                # is the term's full docID-ascending posting list
                if len(parts) == 1:
                    docs_t, tfs_t, dls_t = parts[0]
                else:
                    docs_t = np.concatenate([p[0] for p in parts])
                    order = np.argsort(docs_t, kind="stable")
                    docs_t = docs_t[order]
                    tfs_t = np.concatenate([p[1] for p in parts])[order]
                    dls_t = np.concatenate([p[2] for p in parts])[order]
                merged = [(docs_t, tfs_t, dls_t)]
                if heavy_cache is not None:
                    heavy_cache.put(t, merged, int(len(docs_t)))
                heavy_lights.append(
                    LightList(t, bag[t], idf_by_term[t], docs_t, tfs_t, dls_t)
                )
        all_lights = lights + [_mask_light(ll) for ll in heavy_lights]
        ldocs, lscores = _exact_light_scores(all_lights, stats, cfg)
        ctr["postings_scored"] += int(sum(len(l.docs) for l in all_lights))
        return _topk_unique(ldocs, lscores, k)[:k_out]

    # ---- distributed branch ----
    ctr["path"] = "distributed"
    lights = _get_lights(driver_terms) if driver_terms else []
    ldocs, lscores, theta0 = _light_pass(lights)
    seed_docs = np.zeros(0, np.int64)
    seed_scores = np.zeros(0, np.float64)
    if heavy_meta:
        # θ pre-seed: driver-score the single best-upper-bound range so
        # every task group starts from a tight θ instead of re-deriving it
        # (reference analog: the LOCAL top-k's worst distance is shipped as
        # the remote filter, search_service.rs:214-222). Conservative in
        # both directions: seed scores are true partial-or-full scores, so
        # θ stays a lower bound of the kth best.
        # per (range, term) the bound is the max over generation rows
        rt_ub: dict[tuple[int, str], float] = {}
        range_postings: dict[int, int] = {}
        for r in heavy_meta:
            rid = int(r["range_id"])
            key_rt = (rid, r["term"])
            ub_r = bag[r["term"]] * _meta_row_ub(
                r, idf_by_term[r["term"]], stats, cfg
            )
            rt_ub[key_rt] = max(rt_ub.get(key_rt, 0.0), ub_r)
            range_postings[rid] = range_postings.get(rid, 0) + int(r["n_docs"])
        range_ub: dict[int, float] = {}
        for (rid, _t), v in rt_ub.items():
            range_ub[rid] = range_ub.get(rid, 0.0) + v
        best_rid = max(sorted(range_ub), key=lambda rid: range_ub[rid])
        if cum + range_postings[best_rid] <= budget:
            ctr["theta_seed_mode"] = "range"
            ctr["driver_postings_decoded"] += range_postings[best_rid]
            seed_rows = _fetch(range_id=best_rid)
            seed_dict: dict[str, list[dict]] = {}
            for r in seed_rows:
                seed_dict.setdefault(r["term"], []).append(
                    _attach_bounds(
                        _row_to_dict(r), idf_by_term[r["term"]], stats, cfg
                    )
                )
            seed_ctr = {key: 0 for key in _CTR_KEYS}
            seed_docs, seed_scores = _score_one_range(
                best_rid * cfg.range_size,
                (best_rid + 1) * cfg.range_size,
                seed_dict,
                lights,
                qmeta,
                theta0,
                stats,
                cfg,
                seed_ctr,
                tombstones,
            )
            ctr["seed_blocks_decoded"] += seed_ctr["blocks_decoded"]
            ctr["seed_postings_scored"] += seed_ctr["postings_scored"]
            merged_seed = _topk_merge(
                np.concatenate([ldocs, seed_docs]),
                np.concatenate([lscores, seed_scores]),
                k,
            )
            if len(merged_seed) >= k:
                theta0 = max(theta0, merged_seed[k - 1][1])
        else:
            # The best range exceeds the driver budget — the shape of a
            # 100x index, where the hottest range outgrows any fixed
            # driver budget (with no seed the fan-out started at θ≈0 and
            # ranges_pruned stayed 0 two rounds running). Seed from the
            # single best BLOCK instead: fetch only the highest-bound row
            # of the best range and exactly score its best block
            # (≤ block_size postings — always affordable, whatever the
            # budget). A single-term block score is a LOWER bound of the
            # doc's full score (BM25 contributions are nonnegative), so
            # θ = kth best of (light ∪ block) stays admissible, and the
            # final keep-max merge is safe: a doc the tasks score keeps
            # its exact score (≥ the partial), and a doc the tasks prune
            # has full score < θ, which its partial ≤ full can never
            # displace from the top-k.
            ctr["theta_seed_mode"] = "block"
            best_meta = max(
                (r for r in heavy_meta if int(r["range_id"]) == best_rid),
                key=lambda r: (
                    bag[r["term"]]
                    * _meta_row_ub(r, idf_by_term[r["term"]], stats, cfg),
                    r["term"],
                ),
            )
            seed_term = best_meta["term"]
            best_row, best_b, best_ub = None, -1, -1.0
            for r in _fetch(range_id=best_rid, only_terms=[seed_term]):
                rd = _attach_bounds(
                    _row_to_dict(r), idf_by_term[seed_term], stats, cfg
                )
                b = int(np.argmax(rd["block_ub"]))
                if float(rd["block_ub"][b]) > best_ub:
                    best_row, best_b, best_ub = rd, b, float(rd["block_ub"][b])
            if best_row is not None:
                from dawnsearch_spark.functions.codec import decode_block

                docs_b, tfs_b, dls_b = decode_block(best_row, best_b, cfg.block_size)
                if tombstones is not None:
                    from dawnsearch_spark.operators.merge import _tombstone_mask

                    mb = _tombstone_mask(docs_b, tombstones)
                    docs_b, tfs_b, dls_b = docs_b[mb], tfs_b[mb], dls_b[mb]
                seed_docs = docs_b
                seed_scores = bag[seed_term] * bm25_np(
                    tfs_b, dls_b, idf_by_term[seed_term], stats.avgdl, cfg.k1, cfg.b
                )
                # bounded seed work is tracked under the seed_* counters
                # (a deliberate ≤ block_size exception to the budget)
                ctr["seed_blocks_decoded"] += 1
                ctr["seed_postings_scored"] += int(len(docs_b))
                merged_seed = _topk_merge(
                    np.concatenate([ldocs, seed_docs]),
                    np.concatenate([lscores, seed_scores]),
                    k,
                )
                if len(merged_seed) >= k:
                    theta0 = max(theta0, merged_seed[k - 1][1])
    ctr["theta_seed"] = theta0

    from dawnsearch_spark.operators.merge import SEGMENT_COLS, SEGMENT_SCHEMA

    rows_df = _seg().filter(F.col("range_id") >= 0).select(*SEGMENT_COLS)
    if overflow_terms:
        ov = _seg().filter(
            (F.col("range_id") == -1) & F.col("term").isin(overflow_terms)
        ).select(*SEGMENT_COLS)
        split = ov.mapInPandas(_split_light_rows_gen(cfg), SEGMENT_SCHEMA)
        rows_df = rows_df.unionByName(split)

    tomb_ship = (
        spark.sparkContext.broadcast(tombstones) if tombstones is not None else None
    )
    scorer = make_range_scorer(lights, qmeta, theta0, k, stats, cfg, tomb_ship)
    result = (
        rows_df.withColumn("task_group", F.pmod(F.col("range_id"), F.lit(task_groups)))
        .groupBy("task_group")
        .applyInPandas(scorer, RESULT_SCHEMA)
        .collect()
    )
    data = [r for r in result if int(r["doc_id"]) >= 0]
    for r in result:
        if int(r["doc_id"]) < 0:
            for key in _CTR_KEYS:
                ctr[key] += int(r[key])
    all_docs = np.concatenate(
        [ldocs, seed_docs, np.array([r["doc_id"] for r in data], np.int64)]
    )
    all_scores = np.concatenate(
        [lscores, seed_scores, np.array([r["score"] for r in data], np.float64)]
    )
    return _topk_merge(all_docs, all_scores, k)[:k_out]
