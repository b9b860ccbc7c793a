"""Extra benchmarks for the optimization round (bench.py is FROZEN for
measurement — this file isolates individual operators per the guide's
§1.4 noop-sink methodology and captures .explain("formatted") plans).

Usage:
  python bench_extra.py ops  [name ...]   # operator-suite entries (collect, like bench.py)
  python bench_extra.py plans [name ...]  # write plans/r07/<name>_{before|after}.txt
  python bench_extra.py dedup             # stage-by-stage dedup_clusters breakdown
  python bench_extra.py serve             # engine serving profile (build + search timings)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), PLAN_TAG (before|after, default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TAG = os.environ.get("PLAN_TAG", "before")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def _spark(app="dawnsearch-bench-extra"):
    from dawnsearch_spark.session import get_spark

    return get_spark(app, master=f"local[{CPUS}]")


def run_ops(names: list[str], repeats: int = 1) -> None:
    spark = _spark()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in names:
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).collect()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
        print(json.dumps({"op": name, "sec": samples, "sf_dir": SF_DIR}), flush=True)
    print(json.dumps({"bench_extra_ops": out, "sf_dir": SF_DIR}))


def write_plans(names: list[str]) -> None:
    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = _spark()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        p = os.path.join(PLAN_DIR, f"{name}_{TAG}.txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"plan -> {p}")


def run_dedup() -> None:
    """Stage-by-stage breakdown of q_dedup_clusters' pipeline."""
    from pyspark.sql import functions as F

    from dawnsearch_spark.operators.dedup import (
        capped_pair_candidates,
        connected_components,
        jaccard_pairs_exact,
        shingle_sets,
    )

    spark = _spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"dedup:{name}")
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        print(json.dumps({name: t[name]}), flush=True)
        return r

    base = shingle_sets(docs, "text", "doc_id", 3)
    from pyspark.storagelevel import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    timed("shingle_sets_materialize", lambda: base.count())
    ex = base.select("_id", F.explode("_sh").alias("_s"))
    timed("exploded_count", lambda: ex.count())
    cand = capped_pair_candidates(ex, ["_s"], 1000)
    n_cand = timed("candidates_count", lambda: cand.count())
    print(json.dumps({"n_candidates": n_cand}))
    pairs = jaccard_pairs_exact(docs, col="text", threshold=0.12)
    n_pairs = timed("verified_pairs_count", lambda: pairs.count())
    print(json.dumps({"n_pairs": n_pairs}))
    pairs2 = jaccard_pairs_exact(docs, col="text", threshold=0.12)
    comp = timed("connected_components", lambda: connected_components(pairs2))
    timed("components_count", lambda: comp.count())
    print(json.dumps({"dedup_breakdown": t, "sf_dir": SF_DIR}))


def run_serve() -> None:
    """Engine build + serving-latency profile at the bench's engine scale."""
    import cProfile
    import pstats
    import shutil
    import tempfile

    from dawnsearch_spark.config import EngineConfig
    from dawnsearch_spark.corpus import REFERENCE_QUERIES, generate_corpus
    from dawnsearch_spark.index_build import build_index
    from dawnsearch_spark.plans.query import Engine
    from dawnsearch_spark.sources import read_documents

    spark = _spark()
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    n_docs = max(2000, int(200_000 * sf))
    cfg = EngineConfig(
        heavy_df_threshold=max(1000, n_docs // 8),
        range_size=1024,
        num_term_buckets=32,
        build_partitions=int(CPUS),
    )
    work = tempfile.mkdtemp(prefix="dawnsearch_serve_prof_")
    try:
        corpus_path = os.path.join(work, "corpus")
        generate_corpus(spark, n_docs, seed=42).write.parquet(corpus_path)
        docs = read_documents(spark, corpus_path)
        idx = os.path.join(work, "idx")
        t0 = time.time()
        build_index(spark, docs, idx, cfg, n_groups=4, parallel_groups=4)
        print(json.dumps({"index_build_sec": round(time.time() - t0, 3),
                          "n_docs": n_docs}), flush=True)
        engine = Engine(spark, idx, cfg)
        all_q = [REFERENCE_QUERIES[q] for q in REFERENCE_QUERIES]
        # cold pass per query
        lat = []
        for q in all_q:
            s0 = time.time()
            engine.search(q, counters={})
            lat.append(round(time.time() - s0, 4))
        print(json.dumps({"cold_lat": lat, "avg": round(sum(lat) / len(lat), 4)}),
              flush=True)
        # warm pass
        lat2 = []
        for q in all_q:
            s0 = time.time()
            engine.search(q, counters={})
            lat2.append(round(time.time() - s0, 4))
        print(json.dumps({"warm_lat": lat2, "avg": round(sum(lat2) / len(lat2), 4)}),
              flush=True)
        # profile 2 warm rounds
        prof = cProfile.Profile()
        prof.enable()
        for _ in range(2):
            for q in all_q:
                engine.search(q, counters={})
        prof.disable()
        st = pstats.Stats(prof)
        st.sort_stats("cumulative")
        st.print_stats(40)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _procpool_worker(idx_dir: str, rounds: int, barrier, out_q) -> None:
    """One serving process: own SparkSession + Engine (the reference's
    scale-out unit — process per engine, page cache shared by the OS),
    warm the caches, wait at the barrier, run the timed loop."""
    os.environ["DAWNSEARCH_DRIVER_MEM"] = "2g"
    from dawnsearch_spark.config import EngineConfig
    from dawnsearch_spark.corpus import REFERENCE_QUERIES
    from dawnsearch_spark.plans.query import Engine
    from dawnsearch_spark.session import get_spark

    spark = get_spark(f"serve-proc-{os.getpid()}", master="local[2]")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    n_docs = max(2000, int(200_000 * sf))
    cfg = EngineConfig(
        heavy_df_threshold=max(1000, n_docs // 8), range_size=1024,
        num_term_buckets=32, build_partitions=int(CPUS),
    )
    engine = Engine(spark, idx_dir, cfg)
    all_q = [REFERENCE_QUERIES[q] for q in REFERENCE_QUERIES]
    for q in all_q:  # warm the light/heavy LRUs
        engine.search(q, counters={})
    barrier.wait()
    lat = []
    t0 = time.time()
    for _ in range(rounds):
        for q in all_q:
            s0 = time.time()
            engine.search(q, counters={})
            lat.append(time.time() - s0)
    wall = time.time() - t0
    lat.sort()
    out_q.put(
        {
            "pid": os.getpid(),
            "searches": len(lat),
            "wall_sec": round(wall, 3),
            "p50_sec": round(lat[len(lat) // 2], 4),
            "p95_sec": round(lat[int(len(lat) * 0.95)], 4),
        }
    )
    spark.stop()


def run_procpool(n_procs: int = 4, rounds: int = 4) -> None:
    """Serving-QPS with N engine PROCESSES over one on-disk index — the
    scale-out axis the single-loop bench names (bench.py's thread sweep
    measures the GIL convoy; processes are the fix: one Engine per
    process, OS page cache shared). Builds the bench-scale index once,
    then forks N workers that warm independently and race the same
    25-query reference set from a barrier."""
    import multiprocessing as mp
    import shutil
    import tempfile

    from dawnsearch_spark.config import EngineConfig
    from dawnsearch_spark.corpus import generate_corpus
    from dawnsearch_spark.index_build import build_index
    from dawnsearch_spark.sources import read_documents

    spark = _spark("procpool-build")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    n_docs = max(2000, int(200_000 * sf))
    cfg = EngineConfig(
        heavy_df_threshold=max(1000, n_docs // 8), range_size=1024,
        num_term_buckets=32, build_partitions=int(CPUS),
    )
    work = tempfile.mkdtemp(prefix="dawnsearch_procpool_")
    try:
        corpus_path = os.path.join(work, "corpus")
        generate_corpus(spark, n_docs, seed=42).write.parquet(corpus_path)
        idx = os.path.join(work, "idx")
        build_index(
            spark, read_documents(spark, corpus_path), idx, cfg,
            n_groups=4, parallel_groups=4,
        )
        spark.stop()  # free the build JVM before the serving processes
        ctx = mp.get_context("spawn")
        barrier = ctx.Barrier(n_procs)
        out_q = ctx.Queue()
        procs = [
            ctx.Process(target=_procpool_worker, args=(idx, rounds, barrier, out_q))
            for _ in range(n_procs)
        ]
        t0 = time.time()
        for p in procs:
            p.start()
        # bounded gets: a worker that dies before the barrier (session
        # startup failure) must fail the bench loudly, not hang it
        results = []
        for _ in procs:
            results.append(out_q.get(timeout=600))
        for p in procs:
            p.join(timeout=60)
        total = sum(r["searches"] for r in results)
        wall = max(r["wall_sec"] for r in results)
        print(json.dumps({"workers": results}, sort_keys=True))
        print(
            json.dumps(
                {
                    "serving_qps_procpool": round(total / wall, 1),
                    "n_procs": n_procs,
                    "rounds": rounds,
                    "searches_total": total,
                    "wall_sec": wall,
                    "p95_sec_max": max(r["p95_sec"] for r in results),
                    "n_docs": n_docs,
                    "note": "N engine processes over one index dir; "
                            "barrier-started; QPS = total searches / "
                            "slowest worker wall",
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ops"
    args = sys.argv[2:]
    if mode == "ops":
        run_ops(args or ["bm25_topk_1"])
    elif mode == "plans":
        write_plans(args)
    elif mode == "dedup":
        run_dedup()
    elif mode == "serve":
        run_serve()
    elif mode == "procpool":
        run_procpool(
            n_procs=int(args[0]) if args else 4,
            rounds=int(args[1]) if len(args) > 1 else 4,
        )
    else:
        raise SystemExit(f"unknown mode {mode}")
