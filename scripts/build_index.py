"""spark-submit entry: build (or resume) an index, then run sanity queries.

Usage:
  spark-submit --py-files dawnsearch_spark.zip scripts/build_index.py \
      --docs /path/to/documents_parquet --out /path/to/index \
      [--synthetic N] [--groups 8] [--master local[32]]

(BASELINE.json: "launched via spark-submit --py-files"; packaging helper:
  cd /root/repo && zip -r /tmp/dawnsearch_spark.zip dawnsearch_spark)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

try:  # on a cluster the package arrives via --py-files (zip on sys.path)
    import dawnsearch_spark  # noqa: F401
except ImportError:  # local dev convenience: resolve from the repo checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dawnsearch_spark.config import EngineConfig, load_config
from dawnsearch_spark.corpus import REFERENCE_QUERIES, generate_corpus
from dawnsearch_spark.plans.query import Engine
from dawnsearch_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--docs",
        help="documents source: Iceberg table (catalog id or table path) or "
        "parquet dir, columns (repo,path,commit,lang,content)",
    )
    ap.add_argument(
        "--format",
        default="auto",
        choices=["auto", "iceberg", "parquet"],
        help="source format (auto detects an Iceberg table layout)",
    )
    ap.add_argument("--snapshot-id", type=int, default=None, help="Iceberg snapshot to pin")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N synthetic docs instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--master", default=None)
    ap.add_argument("--config", default=None, help="TOML config path")
    ap.add_argument("--queries", type=int, default=5, help="sanity queries to run after build")
    args = ap.parse_args()

    cfg = load_config(args.config) if args.config else EngineConfig()
    spark = get_spark("dawnsearch-build", master=args.master)
    if args.synthetic:
        docs = generate_corpus(spark, args.synthetic)
    else:
        from dawnsearch_spark.sources import read_documents

        docs = read_documents(
            spark, args.docs, format=args.format, snapshot_id=args.snapshot_id
        )

    t0 = time.time()
    engine = Engine.build(spark, docs, args.out, cfg, n_groups=args.groups, log=print)
    build_s = time.time() - t0
    n = engine.stats_.n_docs
    print(json.dumps({"build_sec": round(build_s, 2), "docs": n, "docs_per_sec": round(n / build_s, 1)}))

    for qid in list(REFERENCE_QUERIES)[: args.queries]:
        q = REFERENCE_QUERIES[qid]
        t0 = time.time()
        hits = engine.search(q)
        print(f"q{qid:02d} {q!r}: {len(hits)} hits in {time.time() - t0:.3f}s; top={hits[:3]}")
    spark.stop()


if __name__ == "__main__":
    main()
