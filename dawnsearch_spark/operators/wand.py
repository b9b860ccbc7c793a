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
* unlike the reference's 200 ms best-effort deadline gather
  (udp_service.rs:300-341), the Spark stage barrier makes our merge
  complete — results are exact, verified rank-identical to the full-scan
  oracle.

Execution shape (one pruned segment scan + one tiny collect):
  query terms -> bucket + term predicate pushdown into the segment parquet
  -> light rows (bounded by heavy_df_threshold) decoded on the driver
  -> heavy rows grouped into range tasks (applyInPandas); each task
     processes its doc-ranges in descending upper-bound order, maintains a
     rising local θ (seeded from the driver's light pass), prunes whole
     ranges by Σ max_impact, prunes candidates by per-block max impact,
     and decodes tf/dl only for blocks that still have surviving docs
  -> driver merges per-task top-k (dedup keep-max), final sort.

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

RESULT_SCHEMA = "doc_id long, score double"


@dataclass
class LightList:
    term: str
    qtf: int
    idf: float
    docs: np.ndarray
    tfs: np.ndarray
    dls: np.ndarray


def _term_bucket(term: str, num_buckets: int) -> int:
    return (zlib.crc32(term.encode("utf-8")) & 0xFFFFFFFF) % num_buckets


def _decode_row_docs(row: dict) -> np.ndarray:
    gaps = varbyte_decode(row["doc_blob"], int(row["n_docs"]))
    return np.cumsum(gaps.astype(np.int64))


def _row_to_dict(r) -> dict:
    return {
        "term": r["term"],
        "range_id": int(r["range_id"]),
        "df": int(r["df"]),
        "n_docs": int(r["n_docs"]),
        "doc_blob": bytes(r["doc_blob"]),
        "tf_blob": bytes(r["tf_blob"]),
        "dl_blob": bytes(r["dl_blob"]),
        "block_last": np.asarray(r["block_last"], np.int64),
        "block_doc_off": np.asarray(r["block_doc_off"], np.int64),
        "block_tf_off": np.asarray(r["block_tf_off"], np.int64),
        "block_dl_off": np.asarray(r["block_dl_off"], np.int64),
        "block_max_impact": np.asarray(r["block_max_impact"], np.float64),
        "max_impact": float(r["max_impact"]),
    }


def _decode_blocks_tf_dl(row: dict, blocks: np.ndarray, block_size: int) -> dict[int, tuple]:
    """Decode tf/dl streams only for the given block ids (BMW's saving)."""
    out = {}
    n = int(row["n_docs"])
    for b in blocks:
        b = int(b)
        s = b * block_size
        cnt = min(block_size, n - s)
        tfs = varbyte_decode(
            memoryview(row["tf_blob"])[row["block_tf_off"][b] : row["block_tf_off"][b + 1]], cnt
        )
        dls = varbyte_decode(
            memoryview(row["dl_blob"])[row["block_dl_off"][b] : row["block_dl_off"][b + 1]], cnt
        )
        out[b] = (tfs.astype(np.int64), dls.astype(np.int64))
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


def _score_one_range(
    lo: int,
    hi: int,
    heavy_rows: dict[str, dict],
    lights: list[LightList],
    qmeta: list[tuple[str, int, float]],  # (term, qtf, idf) ascending term
    theta: float,
    stats: CorpusStats,
    cfg: EngineConfig,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact scores for surviving docs of one doc-range."""
    # light slices restricted to this range, scored exactly (cheap, small)
    slices: dict[str, tuple] = {}
    light_ub = 0.0
    for l in lights:
        a, b_ = np.searchsorted(l.docs, lo), np.searchsorted(l.docs, hi)
        if a == b_:
            continue
        sc = l.qtf * bm25_np(l.tfs[a:b_], l.dls[a:b_], l.idf, stats.avgdl, cfg.k1, cfg.b)
        slices[l.term] = (l.docs[a:b_], sc)
        light_ub += float(sc.max())
    # range-level screen before any heavy decode
    heavy_ub = sum(
        qtf * heavy_rows[t]["max_impact"] for t, qtf, _ in qmeta if t in heavy_rows
    )
    if heavy_ub + light_ub < theta:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    heavy_docs = {t: _decode_row_docs(r) for t, r in heavy_rows.items()}
    cand_parts = [d for d in heavy_docs.values()] + [s[0] for s in slices.values()]
    cand = np.unique(np.concatenate(cand_parts))
    # per-doc upper bound: block-max for heavy, exact for light
    ub = np.zeros(len(cand), np.float64)
    for t, qtf, _idf in qmeta:
        if t in heavy_rows:
            row = heavy_rows[t]
            blk = np.searchsorted(row["block_last"], cand)
            valid = blk < len(row["block_last"])
            ub[valid] += qtf * row["block_max_impact"][blk[valid]]
        if t in slices:
            sdocs, ssc = slices[t]
            ub[np.searchsorted(cand, sdocs)] += ssc
    keep = ub >= theta
    if not keep.any():
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    surv = cand[keep]
    acc = np.zeros(len(surv), np.float64)
    for t, qtf, idf in qmeta:  # ascending-term fold (rank determinism)
        if t in heavy_rows:
            row = heavy_rows[t]
            docs_t = heavy_docs[t]
            pos = np.searchsorted(docs_t, surv)
            m = (pos < len(docs_t)) & (docs_t[np.minimum(pos, len(docs_t) - 1)] == surv)
            if m.any():
                p = pos[m]
                blocks = np.unique(p // cfg.block_size)
                tfdl = _decode_blocks_tf_dl(row, blocks, cfg.block_size)
                tf_v = np.empty(len(p), np.int64)
                dl_v = np.empty(len(p), np.int64)
                for b in blocks:
                    sel = (p // cfg.block_size) == b
                    off = p[sel] - b * cfg.block_size
                    tf_v[sel] = tfdl[int(b)][0][off]
                    dl_v[sel] = tfdl[int(b)][1][off]
                acc[m] += qtf * bm25_np(tf_v, dl_v, idf, stats.avgdl, cfg.k1, cfg.b)
        if t in slices:
            sdocs, ssc = slices[t]
            pos = np.searchsorted(surv, sdocs)
            m = (pos < len(surv)) & (surv[np.minimum(pos, len(surv) - 1)] == sdocs)
            acc[pos[m]] += ssc[m]
    return surv, acc


def make_range_scorer(
    lights: list[LightList],
    qmeta: list[tuple[str, int, float]],
    theta0: float,
    k: int,
    stats: CorpusStats,
    cfg: EngineConfig,
):
    """applyInPandas function: scores every doc-range in its task group,
    visiting ranges in descending upper-bound order so the local θ rises
    fast (reference analog: local top-k first, then pruned remote merge,
    search_service.rs:201-236)."""

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        theta = theta0
        found: list[tuple[float, int]] = []  # (score, doc_id)
        by_range: dict[int, dict[str, dict]] = {}
        for _, r in pdf.iterrows():
            by_range.setdefault(int(r["range_id"]), {})[r["term"]] = _row_to_dict(r)
        # descending potential
        order = sorted(
            by_range.items(),
            key=lambda kv: -sum(
                qtf * kv[1][t]["max_impact"] for t, qtf, _ in qmeta if t in kv[1]
            ),
        )
        for range_id, heavy_rows in order:
            lo = range_id * cfg.range_size
            hi = lo + cfg.range_size
            surv, acc = _score_one_range(
                lo, hi, heavy_rows, lights, qmeta, theta, stats, cfg
            )
            for d, s in zip(surv, acc):
                found.append((float(s), int(d)))
            if len(found) > 4 * k:
                found.sort(key=lambda x: (-x[0], x[1]))
                del found[4 * k :]
            if len(found) >= k:
                theta = max(theta, sorted((s for s, _ in found), reverse=True)[k - 1])
        found.sort(key=lambda x: (-x[0], x[1]))
        top = found[:k]
        return pd.DataFrame(
            {"doc_id": [d for _, d in top], "score": [s for s, _ in top]}
        )

    return scorer


def search_index(
    spark: SparkSession,
    index_root: str,
    query: str | dict[str, int],
    cfg: EngineConfig,
    k: int | None = None,
    task_groups: int = 64,
    max_driver_heavy_rows: int = 256,
    seg_df=None,
    stats: CorpusStats | None = None,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for a query string or a {term: weight} bag.

    Gathers ``top_k_internal`` candidates internally and returns ``k``
    (reference: internal k=20, displayed 10 — search_provider.rs:214,
    examples_old/search.rs:55-63). If the pruned heavy-row set is small
    (<= ``max_driver_heavy_rows``) the range scoring runs on the driver —
    the reference's local-search-first shape — avoiding a distributed job
    for small/medium indexes; larger row sets fan out as range tasks.
    """
    k_out = k or cfg.top_k
    k = max(k_out, cfg.top_k_internal)
    paths = IndexPaths(index_root)
    stats = stats if stats is not None else load_stats(index_root)
    if isinstance(query, str):
        bag = Counter(tokenize_py(query))
    else:
        bag = {t: int(w) for t, w in query.items()}
    terms = sorted(bag)
    if not terms:
        return []
    buckets = sorted({_term_bucket(t, cfg.num_term_buckets) for t in terms})
    seg_all = seg_df if seg_df is not None else spark.read.parquet(paths.segments)
    seg = seg_all.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))

    # One collect covers the whole query when the pruned row set is small
    # (the common case: light lists + a handful of range-chunked heavy
    # rows) — the reference's local-search-first shape, E1 step 3.
    probe_all = seg.limit(max_driver_heavy_rows + 1).collect()
    if len(probe_all) <= max_driver_heavy_rows:
        light_rows = [r for r in probe_all if int(r["range_id"]) == -1]
        heavy_probe = [r for r in probe_all if int(r["range_id"]) >= 0]
    else:
        light_rows = seg.filter(F.col("range_id") == -1).collect()
        heavy_probe = None
    lights: list[LightList] = []
    for r in light_rows:
        rd = _row_to_dict(r)
        gaps = varbyte_decode(rd["doc_blob"], rd["n_docs"])
        docs = np.cumsum(gaps.astype(np.int64))
        tfs = varbyte_decode(rd["tf_blob"], rd["n_docs"]).astype(np.int64)
        dls = varbyte_decode(rd["dl_blob"], rd["n_docs"]).astype(np.int64)
        lights.append(
            LightList(
                term=rd["term"],
                qtf=bag[rd["term"]],
                idf=float(idf_np(float(rd["df"]), float(stats.n_docs))),
                docs=docs,
                tfs=tfs,
                dls=dls,
            )
        )
    # driver light pass: exact partial scores -> θ seed + candidates
    ldocs, lscores = _exact_light_scores(lights, stats, cfg)
    theta0 = 0.0
    if len(lscores) >= k:
        theta0 = float(np.partition(lscores, -k)[-k])

    def _qmeta(heavy_info: dict[str, int]) -> list[tuple[str, int, float]]:
        return [
            (t, bag[t], float(idf_np(float(heavy_info.get(t, 0)), float(stats.n_docs))))
            for t in terms
            if t in heavy_info or any(l.term == t for l in lights)
        ]

    if heavy_probe is not None:
        if not heavy_probe:
            return _topk_merge(ldocs, lscores, k)[:k_out]
        # driver-side scoring (reference's local-search-first, E1 step 3)
        heavy_info = {r["term"]: int(r["df"]) for r in heavy_probe}
        scorer = make_range_scorer(lights, _qmeta(heavy_info), theta0, k, stats, cfg)
        result_pdf = scorer(pd.DataFrame([r.asDict() for r in heavy_probe]))
        rdocs = result_pdf["doc_id"].to_numpy(np.int64)
        rscores = result_pdf["score"].to_numpy(np.float64)
        return _topk_merge(
            np.concatenate([ldocs, rdocs]), np.concatenate([lscores, rscores]), k
        )[:k_out]

    heavy = seg.filter(F.col("range_id") >= 0)
    heavy_info = {r["term"]: int(r["df"]) for r in heavy.select("term", "df").distinct().collect()}
    scorer = make_range_scorer(lights, _qmeta(heavy_info), theta0, k, stats, cfg)
    result = (
        heavy.withColumn("task_group", F.pmod(F.col("range_id"), F.lit(task_groups)))
        .groupBy("task_group")
        .applyInPandas(scorer, RESULT_SCHEMA)
        .collect()
    )
    all_docs = np.concatenate([ldocs, np.array([r["doc_id"] for r in result], np.int64)])
    all_scores = np.concatenate(
        [lscores, np.array([r["score"] for r in result], np.float64)]
    )
    return _topk_merge(all_docs, all_scores, k)[:k_out]
