"""Capture .explain("formatted") output for declared queries.

Usage: python scripts/capture_plans.py <suffix> [name ...]
Writes plans/r07/<name>_<suffix>.txt for each query name (default: the
bench-timed operator suite). DataFrame-returning queries only — engine
(list-returning) entries are skipped automatically.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dawnsearch_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r07")

DEFAULT = [
    "bm25_topk_1", "doc_freq", "tpch_q1_like", "broadcast_dim_join",
    "events_daily", "window_rank", "topk_orders", "phrase_topk", "bool_topk",
    "facet_counts", "text_features", "quality_filter", "fingerprints",
    "cosine_topk", "sha_integrity", "repetition", "decontaminate",
    "sessionize", "asof_join", "dedup_clusters", "snippets", "dataset_split",
    "jaccard_pairs", "minhash_pairs", "simhash_pairs", "term_tf",
    "doclen_stats", "curation_pipeline",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r07-plans")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"skip {name}: not in queries()")
            continue
        try:
            df = qs[name](spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            print(f"skip {name}: build failed: {e}")
            continue
        if not hasattr(df, "_jdf"):
            print(f"skip {name}: not a DataFrame")
            continue
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
