"""SparkSession construction tuned for this engine.

Local-mode defaults match the sandbox (local[32], single JVM); on a real
cluster the same code runs unchanged — only master/memory submit args change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dawnsearch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        n = n.split(",")[0] if "," in n else n  # local-cluster[n,c,m]
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local-cluster / standalone executors spawn their own Python
        # workers; make the package importable there (a real multi-host
        # cluster ships it via spark-submit --py-files instead).
        .config("spark.executorEnv.PYTHONPATH", repo_root)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("DAWNSEARCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Split packing caps task parallelism: the default 128 MB split +
        # 4 MB open-cost packs a build group's ~6 MB forward-index files
        # into 1-2 splits, starving the Arrow tokenize stages (task count =
        # split count) no matter how many cores exist. 16 MB keeps split
        # count >= file count at bench scale; at 100-TB scale files are
        # row-group-sized and this conf is the standard knob to retune.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
    )
    # Local mode funnels every shuffle through one disk, which serializes
    # the build no matter how many cores run — on a real cluster shuffle IO
    # scales with the node count. Spill to tmpfs when available so local
    # shuffle behaves like distributed shuffle for scaling measurements.
    if os.path.isdir("/dev/shm") and "spark.local.dir" not in (extra_conf or {}):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Spawn the session's Python workers (and their pandas/pyarrow
    imports) eagerly at session creation instead of inside the first
    Arrow-stage query: one trivial mapInPandas over every core. On a
    32-core session the lazy spawn costs ~3-4 s and lands on whatever
    query happens to run first; on an already-warm session this is a
    ~0.1 s no-op job. Startup work belongs to startup — the engine-path
    benchmark warms the JVM the same way with a throwaway build."""
    try:
        import pandas as pd  # noqa: F401 - verifies the driver-side dep

        n = max(1, spark.sparkContext.defaultParallelism)

        def gen(batches):
            import numpy  # noqa: F401
            import pyarrow  # noqa: F401

            for pdf in batches:
                yield pdf

        spark.range(n, numPartitions=n).mapInPandas(gen, "id long").count()
    except Exception:  # pragma: no cover - warmup must never break boot
        pass
