"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract run as Arrow-batched pandas UDFs
over ``mapInPandas``. The actual codec step is STUBBED (no image/audio
libraries in this container — ``decode_media`` raises NotImplementedError
with a clear marker) while everything Spark-side is real and tested:
schema, partitioning, UDF signatures, batch shapes, and a deterministic
byte-level feature extractor standing in for the real one.

Reference analog: the reference stores embeddings as opaque BLOBs next to
row data and reinterprets bytes at the boundary
(/root/reference/src/search/search_provider.rs:84-93, :270-274;
/root/reference/src/search/vector.rs:199-216) — the same opaque-payload +
typed-view pattern used here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, "
    "meta struct<width:int, height:int, n_bytes:long>"
)

FEATURE_DIM = 16  # byte-histogram buckets of the stub extractor


def synthesize_media(docs: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table: payload = UTF-8 bytes of the content
    prefix (stands in for encoded image bytes); metadata derived from it."""
    payload = F.encode(F.substring(F.col(content_col), 1, 4096), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("media"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            (F.length(payload) % 640).cast("int").alias("width"),
            (F.length(payload) % 480).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str):
    """STUB: real decoders (PIL/ffmpeg/librosa) are not in this container.

    The Spark-side contract (binary in, array out, Arrow batching) is
    exercised via ``extract_features``' deterministic fake path.
    """
    raise NotImplementedError(
        "media decode is stubbed in this environment: no image/audio codec "
        f"libraries available (requested type: {media_type!r})"
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """(doc_id, features array<double>, n_bytes): deterministic byte-level
    features (16-bucket byte histogram, L1-normalized) as a stand-in for a
    real decoder+CNN. Vectorized: one numpy pass per Arrow batch using a
    flattened concat + segmented bincount — no per-row decode loop."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            blobs = pdf["media"].to_numpy()
            lens = np.array([len(b) for b in blobs], np.int64)
            flat = np.frombuffer(b"".join(blobs), np.uint8)
            seg = np.repeat(np.arange(len(blobs)), lens)
            hist = np.zeros((len(blobs), FEATURE_DIM), np.float64)
            np.add.at(hist, (seg, flat >> 4), 1.0)
            denom = np.maximum(lens, 1).astype(np.float64)[:, None]
            hist /= denom
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": list(np.round(hist, 6)),
                    "n_bytes": lens,
                }
            )

    return media.select("doc_id", "media").mapInPandas(
        gen, "doc_id long, features array<double>, n_bytes long"
    )


def extract_feature_counts(media: DataFrame) -> DataFrame:
    """Scalar-column variant of :func:`extract_features` for oracle-checked
    contracts: (doc_id, n_bytes, c0..c15) where ``ck`` is the exact count
    of payload bytes whose high nibble equals ``k``. Integer-exact (no
    normalization), so a SQL engine can reproduce it bit-for-bit from the
    hex expansion of the payload. Same segmented-bincount NumPy pass as
    ``extract_features``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            blobs = pdf["media"].to_numpy()
            lens = np.array([len(b) for b in blobs], np.int64)
            flat = np.frombuffer(b"".join(blobs), np.uint8)
            seg = np.repeat(np.arange(len(blobs)), lens)
            hist = np.zeros((len(blobs), FEATURE_DIM), np.int64)
            np.add.at(hist, (seg, flat >> 4), 1)
            out = {"doc_id": pdf["doc_id"], "n_bytes": lens}
            for k in range(FEATURE_DIM):
                out[f"c{k}"] = hist[:, k]
            yield pd.DataFrame(out)

    schema = "doc_id long, n_bytes long, " + ", ".join(
        f"c{k} long" for k in range(FEATURE_DIM)
    )
    return media.select("doc_id", "media").mapInPandas(gen, schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing demo: emit up to ``max_frames`` fixed-stride
    byte windows per payload as (doc_id, frame_no, frame binary) — the
    shape a video frame sampler would have; windowing is native Spark.

    The window is taken on the binary column directly (``substring`` on
    BinaryType slices bytes) — no string round-trip, so arbitrary non-UTF-8
    payloads (real image/audio bytes) keep exact byte boundaries."""
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    return (
        media.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.transform(
                        idx,
                        lambda i: F.struct(
                            i.alias("frame_no"),
                            F.substring(
                                F.col("media"), i * every_n_bytes + 1, every_n_bytes
                            ).alias("frame"),
                        ),
                    ),
                    lambda s: F.length(s["frame"]) > 0,
                )
            ).alias("fr"),
        )
        .select(
            "doc_id",
            F.col("fr.frame_no").alias("frame_no"),
            F.col("fr.frame").alias("frame"),
        )
    )
