"""Similarity search over embedding columns: exact brute-force top-k and
two approximate scale paths (random-hyperplane LSH, IVF coarse quantizer).

Reference analogs: the reference's serving index is HNSW over 384-d unit
vectors (/root/reference/src/search/search_provider.rs:35-42, :214) with a
brute-force exact scan kept as the oracle
(/root/reference/examples_old/search.rs:44-72), an IVF-like bucket index
with multi-assignment (/root/reference/examples_old/search_bucket.rs:15-90)
and an NSW graph (/root/reference/examples_old/search_nsw.rs:31-189). Here:

* ``cosine_topk``        — exact oracle (native higher-order functions,
                           TakeOrderedAndProject; reference search.rs:44-72)
* ``lsh_bucket_topk``    — sign-of-hyperplane buckets; probes only matching
                           buckets (reference bucket index analog)
* ``ivf_topk``           — deterministic seeded centroids, NumPy matmul
                           assignment in a vectorized pandas UDF, nprobe
                           cells scanned (bucket multi-assign analog)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawnsearch_spark.operators.dedup import cosine_sim_col


def _query_lit(qvec: list[float]):
    return F.array(*[F.lit(float(x)) for x in qvec])


def cosine_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k (score desc, id asc)."""
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine_sim_col(F.col(vec_col), _query_lit(qvec)), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_id(vec_col, planes: np.ndarray):
    """Bucket = bit-pattern of sign(plane . v), built from native folds."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**i).cast("long")).otherwise(0)
    return bucket


def lsh_assign(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign-of-hyperplane bucket per vector — one NumPy
    matmul per Arrow batch (replaces ``n_planes`` separate JVM fold passes;
    same Arrow substrate as the index-build hot path). At cluster scale
    this runs once at WRITE time and ``bucket`` becomes a partition column,
    turning every query into a partition-pruned scan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                planes = _hyperplanes(mat.shape[1], n_planes, seed)
            bits = (mat @ planes.T) > 0
            yield pd.DataFrame(
                {id_col: pdf[id_col], "bucket": (bits * weights).sum(axis=1)}
            )

    return emb.select(id_col, vec_col).mapInPandas(gen, f"{id_col} long, bucket long")


def lsh_query_bucket(qvec: list[float], n_planes: int = 8, seed: int = 42) -> int:
    planes = _hyperplanes(len(qvec), n_planes, seed)
    q = np.asarray(qvec, np.float64)
    return int(sum(2**i for i, p in enumerate(planes) if float(p @ q) > 0))


def lsh_bucket_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket. At cluster
    scale the bucket id is a write-time partition column (see
    :func:`lsh_assign`), so this becomes a partition-pruned scan instead
    of a full pass."""
    qbucket = lsh_query_bucket(qvec, n_planes, seed)
    assigned = lsh_assign(emb, n_planes, seed, id_col, vec_col)
    sel = emb.join(
        F.broadcast(assigned.filter(F.col("bucket") == qbucket).select(id_col)),
        id_col,
        "left_semi",
    )
    return cosine_topk(sel, qvec, k, id_col, vec_col)


def _centroids(dim: int, n_cells: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed + 1)
    c = rng.standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    sample_size: int = 4096,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seeded spherical k-means over a deterministic sample -> (n_cells,
    dim) unit centroids.

    Random gaussian centroids (round 1-2) make recall at a given nprobe
    luck, not design: cells don't follow the data density, so a query's
    true neighbors scatter across arbitrary cells. A few k-means
    iterations put ~equal data mass per cell and co-locate neighbors,
    making nprobe/n_cells a real recall knob (reference analog: the
    bucket index this replaces, examples_old/search_bucket.rs:15-90).

    Driver-side on a bounded sample (``sample_size`` rows via
    deterministic orderBy-limit — one small collect); at 100-TB scale the
    sample is still a constant-size collect and the trained centroids
    ship to executors inside the assignment closure (a few KB).
    Determinism: seeded init from sample points, stable argmax/argsort,
    empty cells re-seeded to the worst-fit points."""
    rows = emb.orderBy(F.col(id_col)).limit(sample_size).select(vec_col).collect()
    if not rows:
        raise ValueError("cannot train IVF centroids on an empty relation")
    X = np.stack([np.asarray(r[0], np.float64) for r in rows])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Xn = X / norms
    rng = np.random.default_rng(seed + 2)
    if len(Xn) >= n_cells:
        C = Xn[rng.choice(len(Xn), n_cells, replace=False)].copy()
    else:
        C = _centroids(Xn.shape[1], n_cells, seed)
        C[: len(Xn)] = Xn
    for _ in range(iters):
        sims = Xn @ C.T
        a = sims.argmax(axis=1)
        M = np.zeros_like(C)
        np.add.at(M, a, Xn)
        counts = np.bincount(a, minlength=n_cells)
        fit = sims[np.arange(len(Xn)), a]  # for empty-cell reseeding
        worst = np.argsort(fit, kind="stable")
        wi = 0
        for c in range(n_cells):
            if counts[c] == 0:
                if wi < len(worst):
                    M[c] = Xn[worst[wi]]
                    wi += 1
                else:
                    # more empty cells than sample points (tiny relation):
                    # keep the cell at its current centroid instead of
                    # indexing past the sample
                    M[c] = C[c]
        nm = np.linalg.norm(M, axis=1, keepdims=True)
        nm[nm == 0] = 1.0
        C = M / nm
    return C


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Assign each vector to its nearest (cosine) coarse centroid — one
    vectorized NumPy matmul per Arrow batch (no per-row Python). Pass the
    ``centroids`` from :func:`train_ivf_centroids` for data-aware cells
    (they ship once in the closure — a few KB); default falls back to the
    seeded random quantizer."""
    fixed = None if centroids is None else np.ascontiguousarray(centroids, np.float64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = fixed
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if cents is None:
                cents = _centroids(M.shape[1], n_cells, seed)
            norms = np.linalg.norm(M, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (M / norms) @ cents.T
            yield pd.DataFrame({id_col: pdf[id_col], "cell": sims.argmax(axis=1)})

    return emb.mapInPandas(gen, f"{id_col} long, cell int")


def ivf_probe_cells(
    qvec: list[float],
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> list[int]:
    """The ``nprobe`` cells nearest (cosine) to the query vector."""
    q = np.asarray(qvec, np.float64)
    cents = (
        np.asarray(centroids, np.float64)
        if centroids is not None
        else _centroids(len(qvec), n_cells, seed)
    )
    qn = q / (np.linalg.norm(q) or 1.0)
    return [int(c) for c in np.argsort(-(cents @ qn), kind="stable")[:nprobe]]


def ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    train: bool = True,
) -> DataFrame:
    """IVF search: score only vectors in the nprobe nearest cells.
    (At scale the cell is a write-time partition column -> pruned scan;
    reference analog: bucket multi-assignment INSERT_COUNT=3,
    examples_old/search_bucket.rs:15-90.) Centroids are k-means-trained by
    default (``train=False`` restores the seeded random quantizer)."""
    if centroids is None and train:
        centroids = train_ivf_centroids(
            emb, n_cells, seed, id_col=id_col, vec_col=vec_col
        )
    probe = ivf_probe_cells(qvec, n_cells, nprobe, seed, centroids)
    assigned = ivf_assign(emb, n_cells, seed, id_col, vec_col, centroids)
    sel = emb.join(
        F.broadcast(assigned.filter(F.col("cell").isin(probe)).select(id_col)),
        id_col,
        "left_semi",
    )
    return cosine_topk(sel, qvec, k, id_col, vec_col)
