"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Reference analog: the only dedup in the reference is exact-key
(URL-existence check before insert,
/root/reference/src/search/search_provider.rs:253-263, backed by the
``find_by_url`` index :94-99) and result-id dedup in the top-k accumulator
(/root/reference/src/search/best_results.rs:45-58). The near-dup family is
the large-corpus extension a training-data pipeline needs (task brief);
everything is expressed with native Spark ops (shingling, hashing, band
join) — no Python in the candidate-generation hot path.

Scale notes: exact + fingerprint dedup are one hash-aggregate;
shared-shingle and LSH candidate pairs are self-equi-joins on a hash key
(AQE-skew-join tolerant); pair verification only touches candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dawnsearch_spark.operators.text_analysis import normalized_fingerprint


# ---------- exact ----------

def exact_duplicate_groups(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_dups, keep_id): groups of byte-near-identical docs
    (normalized md5), keeper = smallest id (J2/F11 analog)."""
    return (
        df.select(F.col(id_col), normalized_fingerprint(col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest-id doc per normalized fingerprint."""
    w = df.select(F.col(id_col), normalized_fingerprint(col).alias("fingerprint"))
    keep = w.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), id_col, "left_semi")


# ---------- shingles + n-gram Jaccard ----------

def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct, sorted n-word shingles of the lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    shingles = F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return F.array_sort(F.array_distinct(shingles))


def jaccard_pairs_exact(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for every pair with shingle-Jaccard >= threshold.

    Exact: any pair with J > 0 shares >= 1 shingle, so candidates come from
    a self-equi-join on exploded shingles (skew guard: ``max_shingle_df``
    drops ubiquitous shingles from candidate *generation* only — with a
    threshold t, a pair is still found via its rarer shared shingles as
    long as it shares at least one shingle below the cap; at threshold 0
    exactness requires the cap disabled).
    """
    base = df.select(
        F.col(id_col).alias("_id"), word_shingles(col, n).alias("_sh")
    ).filter(F.size("_sh") > 0)
    ex = base.select("_id", F.explode("_sh").alias("_s"))
    if max_shingle_df is not None:
        heavy = ex.groupBy("_s").count().filter(F.col("count") > max_shingle_df)
        ex = ex.join(F.broadcast(heavy.select("_s")), "_s", "left_anti")
    cand = (
        ex.alias("a")
        .join(ex.alias("b"), "_s")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sh = base
    pairs = (
        cand.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(F.col("inter").cast("double") / F.col("uni"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


# ---------- MinHash + LSH ----------

def minhash_signature(col_shingles: Column, num_hashes: int) -> Column:
    """MinHash signature: per hash function j, min over shingles of
    xxhash64(shingle, j) — all JVM-side."""
    return F.array(
        *[
            F.array_min(
                F.transform(col_shingles, lambda s: F.xxhash64(s, F.lit(j)))
            )
            for j in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id_a, id_b, jaccard) near-dup pairs via MinHash banding: docs whose
    signatures collide in >= 1 band become candidates; candidates are then
    verified with the exact shingle Jaccard (so output precision is exact;
    recall is the standard LSH S-curve at the chosen bands x rows)."""
    num_hashes = bands * rows_per_band
    base = (
        df.select(F.col(id_col).alias("_id"), word_shingles(col, n).alias("_sh"))
        .filter(F.size("_sh") > 0)
        .withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))
    )
    band_rows = base.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice("_sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bhash")
    cand = (
        band_rows.alias("a")
        .join(band_rows.alias("b"), ["band", "bhash"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sh = base.select("_id", "_sh")
    return (
        cand.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(F.col("inter").cast("double") / F.col("uni"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------- SimHash ----------

def simhash64(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash): 64-bit SimHash over whitespace tokens, built from
    native xxhash64 bit votes (explode -> 64 conditional sums -> repack)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(F.col(col))), r"\s+")).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return votes.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within Hamming distance, candidates via
    4x16-bit band blocking (a pair within distance 3 matches >= 1 band)."""
    sh = simhash64(df, col, id_col).withColumnRenamed(id_col, "_id")
    bands = sh.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bkey"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.bkey")
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bkey"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------- embedding cosine near-dup ----------

def cosine_sim_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed with
    native higher-order functions in float64 (sequential fold — matches
    DuckDB's list_cosine_similarity evaluation order)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine >= threshold — brute-force
    all-pairs (exact baseline; at scale use similarity.lsh_bucket_pairs
    for candidate generation instead)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine_sim_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
