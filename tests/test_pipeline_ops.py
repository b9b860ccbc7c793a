"""Training-data pipeline operators: dedup family, similarity search,
text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dawnsearch_spark.operators.dedup import (
    dedup_exact,
    embedding_near_duplicates,
    exact_duplicate_groups,
    jaccard_pairs_exact,
    minhash_lsh_pairs,
    simhash_near_pairs,
    simhash64,
)
from dawnsearch_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)
from dawnsearch_spark.operators.similarity import cosine_topk, ivf_topk, lsh_bucket_topk
from dawnsearch_spark.operators.text_analysis import with_text_features


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.upper() + "  "),  # normalized dup of 0
        (3, base.replace("dog", "cat")),  # near dup (1-word change)
        (4, "def main return value for the loop in this file"),
        (5, "completely different text about spark shuffles and partitions"),
        (6, "xqz9 zzk1 qqpla mmx87 vvnot realwords here"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, docs):
    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 3 and groups[0]["keep_id"] == 0
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [0, 3, 4, 5, 6, 7]


def test_jaccard_pairs_exact(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_exact(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (0, 3) in pairs and 0.5 <= pairs[(0, 3)] < 1.0
    assert not any({a, b} & {5, 6} for a, b in pairs)


def test_minhash_lsh_finds_planted_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # identical docs collide in every band; the near-dup with J~0.66 should
    # be caught at 16 bands x 4 rows (collision prob ~1-(1-0.66^4)^16 ~ 0.97)
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert (0, 3) in pairs


def test_minhash_band_rows_batch_invariant(spark, docs):
    """A doc's signature must not depend on which Arrow batch / partition
    it lands in (reused work buffers or segment bookkeeping bugs would
    surface exactly here)."""
    from dawnsearch_spark.operators.dedup import minhash_band_rows, shingle_sets

    sh = shingle_sets(docs, "text", "doc_id", 3)
    one = {
        (r["_id"], r["band"], r["bhash"])
        for r in minhash_band_rows(sh.repartition(1)).collect()
    }
    many = {
        (r["_id"], r["band"], r["bhash"])
        for r in minhash_band_rows(sh.repartition(8)).collect()
    }
    assert one and one == many


def test_rolling_fingerprint_matches_python_reference(spark, docs):
    """The native Column fold equals a pure-Python Rabin-Karp over the
    same prefix (codepoint-for-codepoint)."""
    from dawnsearch_spark.operators.text_analysis import (
        ROLLING_B,
        ROLLING_M,
        rolling_fingerprint,
    )

    got = {
        r["doc_id"]: r["rfp"]
        for r in docs.select("doc_id", rolling_fingerprint("text", 64).alias("rfp")).collect()
    }
    for row in docs.collect():
        acc = 0
        for ch in row["text"][:64]:
            acc = (acc * ROLLING_B + ord(ch)) % ROLLING_M
        assert got[row["doc_id"]] == acc, row["doc_id"]


def test_simhash(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs.filter("text != ''")).collect()}
    assert sh[0] == sh[1]  # identical text -> identical simhash
    near = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(docs.filter("text != ''"), max_hamming=8).collect()
    }
    assert near[(0, 1)] == 0
    assert (0, 3) in near  # one-word change stays within hamming 8


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[7] = vecs[3] * 0.999 + 0.001 * vecs[5]  # planted near-dup of 3
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    return df, vecs


def test_embedding_near_duplicates(spark, emb):
    df, vecs = emb
    pairs = embedding_near_duplicates(df, threshold=0.98).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(3, 7)}


def test_cosine_topk_exact(spark, emb):
    df, vecs = emb
    q = [float(x) for x in vecs[3]]
    got = [(r["vec_id"], r["cos"]) for r in cosine_topk(df, q, k=5).collect()]
    sims = (vecs @ vecs[3]) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[3]))
    want_ids = np.lexsort((np.arange(40), -np.round(sims, 6)))[:5].tolist()
    assert [g[0] for g in got] == want_ids
    assert got[0][0] == 3 and got[1][0] == 7


def test_ann_recall(spark, emb):
    """Approximate paths return a subset of the exact ranking (recall > 0
    and the planted near-dup is found from its own bucket/cell)."""
    df, vecs = emb
    q = [float(x) for x in vecs[3]]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    lsh = [r["vec_id"] for r in lsh_bucket_topk(df, q, k=5, n_planes=4).collect()]
    ivf = [r["vec_id"] for r in ivf_topk(df, q, k=5, n_cells=8, nprobe=3).collect()]
    assert lsh and set(lsh) <= set(r["vec_id"] for r in cosine_topk(df, q, k=40).collect())
    assert 3 in lsh, "query vector's own near neighborhood found by LSH"
    assert 3 in ivf and 7 in ivf, "IVF with nprobe=3 finds the planted pair"
    assert len(set(exact) & set(ivf)) >= 3


def test_text_features(spark, docs):
    feats = {r["doc_id"]: r for r in with_text_features(docs).collect()}
    assert feats[0]["n_tokens"] == 14
    assert feats[7]["n_tokens"] == 0 and feats[7]["quality"] == 0.0
    assert feats[0]["lang_guess"] == "en"
    assert feats[6]["lang_guess"] == "other"
    assert feats[0]["fingerprint"] == feats[2]["fingerprint"]  # case/ws-normalized
    assert 0.0 <= feats[5]["quality"] <= 1.0


def test_image_codecs_roundtrip():
    """Pure-NumPy BMP/PPM codecs: exact pixel round-trip, including an
    asymmetric image (catches BMP bottom-up row-order bugs) and a width
    that forces nonzero BMP row padding."""
    from dawnsearch_spark.operators.multimodal import (
        decode_bmp,
        decode_media,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    for h, w in [(5, 7), (16, 32), (1, 1), (3, 4)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img), (h, w)
    # asymmetric gradient: row order must survive the bottom-up layout
    grad = np.zeros((4, 3, 3), np.uint8)
    grad[:, :, 1] = np.arange(4, dtype=np.uint8)[:, None]
    assert np.array_equal(decode_bmp(encode_bmp(grad)), grad)
    assert decode_media(encode_bmp(grad), "image/bmp")[0, 0, 1] == 0
    small = resize_nearest(grad, 2, 2)
    assert small.shape == (2, 2, 3) and small[1, 0, 1] == 2
    # jpeg is a REAL decoder now (functions/jpeg.py); garbage raises a
    # clear parse error, and genuinely-stubbed codecs still refuse
    from dawnsearch_spark.functions.jpeg import encode_jpeg

    jimg = np.full((9, 11, 3), [33, 66, 99], np.uint8)
    jout = decode_media(encode_jpeg(jimg), "image/jpeg")
    assert int(np.abs(jout.astype(int) - jimg.astype(int)).max()) <= 1
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff...", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00", "video/h264")


def test_synthesized_bmp_decode_stats(spark):
    from dawnsearch_spark.operators.multimodal import (
        decode_image_stats,
        synthesize_bmp_media,
    )

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    stats = {r["doc_id"]: r for r in decode_image_stats(
        synthesize_bmp_media(docs, width=32, height=16)
    ).collect()}
    assert len(stats) == 10
    for did, r in stats.items():
        assert (r["width"], r["height"]) == (32, 16)
        assert r["corner_g"] == (2 * did) % 256
        assert abs(r["mean_r"] - sum((did + x) % 256 for x in range(32)) / 32) < 1e-9


def test_multimodal_plumbing(spark, small_corpus):
    media = synthesize_media(small_corpus.limit(50))
    rows = media.collect()
    assert all(r["meta"]["n_bytes"] == len(r["media"]) for r in rows)
    feats = extract_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-3  # L1-normalized histogram
    frames = sample_frames(media.limit(5)).collect()
    assert all(len(r["frame"]) <= 256 for r in frames)
    assert {r["doc_id"] for r in frames} == {r["doc_id"] for r in media.limit(5).collect()}
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "audio/mp3")  # still-stubbed codec family


def _connected_components(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    return {find(i) for i in n_ids}


def test_oversized_bucket_emits_spanning_chain(spark):
    """A duplicate cluster LARGER than the band-bucket cap must still emit
    a connected candidate set (spanning chain), not zero pairs — the cap
    previously made the biggest dup clusters (boilerplate, the primary
    dedup target) invisible (ADVICE r2)."""
    from dawnsearch_spark.operators.dedup import minhash_lsh_pairs, simhash_near_pairs

    n = 12
    text = "exact duplicate boilerplate text repeated across many documents verbatim"
    df = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    # every band bucket holds all 12 docs > cap 4 -> chain emission
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, threshold=0.9, max_band_bucket=4).collect()
    }
    assert mh, "oversized cluster emitted zero pairs"
    assert len(_connected_components(range(n), mh)) == 1, "cluster not connected"
    # chain keeps candidate volume linear, not quadratic
    assert len(mh) < n * (n - 1) / 2

    sh = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, max_hamming=3, max_band_bucket=4).collect()
    }
    assert sh and len(_connected_components(range(n), sh)) == 1


def test_oversized_shingle_chain_keeps_cluster_reachable(spark):
    """Same guarantee for the exact-Jaccard shingle path: an over-cap
    shingle contributes chain candidates instead of being dropped."""
    from dawnsearch_spark.operators.dedup import jaccard_pairs_exact

    n = 10
    text = "shared shingle alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs_exact(df, threshold=0.9, max_shingle_df=3).collect()
    }
    assert pairs and len(_connected_components(range(n), pairs)) == 1


def test_ivf_trained_recall(spark):
    """VERDICT r2 item 5: k-means-trained centroids must reach
    recall@10 >= 0.9 vs the brute-force oracle at nprobe=4 of 16 cells on
    a clustered corpus (random centroids made recall luck, not design)."""
    from dawnsearch_spark.operators.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((16, 24))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for i in range(320):
        v = centers[i % 16] + 0.15 * rng.standard_normal(24)
        pts.append(v / np.linalg.norm(v))
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(320)],
        "vec_id long, embedding array<double>",
    ).cache()
    q = [float(x) for x in pts[0]]
    data = df.filter("vec_id != 0")
    want = {r["vec_id"] for r in cosine_topk(data, q, k=10).collect()}
    got = {r["vec_id"] for r in ivf_topk(data, q, k=10, n_cells=16, nprobe=4).collect()}
    assert len(got & want) / 10 >= 0.9, f"recall {len(got & want) / 10}"


def test_decode_stats_mixed_shapes_and_formats(spark):
    """Batched grouped decode must handle a batch mixing BMP/PPM payloads
    of DIFFERENT dimensions and agree with the per-image decoders."""
    from dawnsearch_spark.operators.multimodal import (
        decode_image_stats,
        decode_media,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(5)
    rows = []
    for i in range(12):
        h, w = (3 + i % 3, 4 + i % 4)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if i % 2:
            rows.append((i, encode_bmp(img), "image/bmp"))
        else:
            rows.append((i, encode_ppm(img), "image/ppm"))
    media = spark.createDataFrame(rows, "doc_id long, media binary, media_type string")
    got = {r["doc_id"]: r for r in decode_image_stats(media).collect()}
    assert len(got) == 12
    for i, payload, mtype in rows:
        img = decode_media(payload, mtype)
        r = got[i]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["corner_g"] == int(img[0, 0, 1])
        assert abs(r["mean_b"] - img.reshape(-1, 3)[:, 2].mean()) < 1e-9


def test_png_codec_roundtrip_and_all_filters():
    """Real PNG decode (stdlib zlib + NumPy unfiltering): round-trips our
    encoder (filter 0) and reconstructs scanlines filtered with every PNG
    filter type (0-4) built per spec by a plain-Python reference filterer."""
    import struct
    import zlib

    from dawnsearch_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(9)
    for shape in [(5, 7, 3), (4, 4, 4), (1, 1, 3), (3, 1, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img), shape

    # hand-filter an image with a different filter per row (cycling 0-4)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    h, w, c = img.shape

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc_ else (b if pb <= pc_ else cc)

    raw = bytearray()
    flat = img.reshape(h, w * c).astype(int)
    for y in range(h):
        ft = y % 5
        raw.append(ft)
        for i in range(w * c):
            x = flat[y][i]
            left = flat[y][i - c] if i >= c else 0
            up = flat[y - 1][i] if y > 0 else 0
            ul = flat[y - 1][i - c] if (y > 0 and i >= c) else 0
            pred = [0, left, up, (left + up) // 2, paeth(left, up, ul)][ft]
            raw.append((x - pred) % 256)

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data) & 0xFFFFFFFF
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img), "multi-filter unfiltering"


def test_wav_codec_roundtrip():
    from dawnsearch_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(13)
    mono = rng.integers(-32768, 32767, 256, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(out[:, 0], mono)
    stereo = rng.integers(-32768, 32767, (128, 2), dtype=np.int16)
    out2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(out2, stereo)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"not a wav")


def test_decode_stats_handles_png(spark):
    """PNG payloads flow through the batched stats path and agree with the
    direct decoder."""
    from dawnsearch_spark.operators.multimodal import (
        decode_image_stats,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(21)
    rows = []
    for i in range(6):
        img = rng.integers(0, 256, (4 + i % 2, 5, 3), dtype=np.uint8)
        rows.append((i, encode_png(img), "image/png"))
    media = spark.createDataFrame(rows, "doc_id long, media binary, media_type string")
    got = {r["doc_id"]: r for r in decode_image_stats(media).collect()}
    for i, payload, _ in rows:
        img = decode_png(payload)
        assert got[i]["corner_g"] == int(img[0, 0, 1])
        assert abs(got[i]["mean_r"] - img.reshape(-1, 3)[:, 0].mean()) < 1e-9


def test_benchmark_contamination_semantics(spark):
    from dawnsearch_spark.operators.dedup import benchmark_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix the quick brown fox jumps somewhere else"),  # 3 shared
            (2, "completely unrelated words here that match nothing"),
            (3, "too short"),  # < n words -> 0, still emitted
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["overlap_shingles"], r["contaminated"])
        for r in benchmark_contamination(corpus, bench, n=3).collect()
    }
    # doc 1 shares "the quick brown", "quick brown fox", "brown fox jumps"
    assert got[1] == (3, 1)
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)


def test_ivf_train_tiny_relation(spark):
    """ADVICE r3: training on a relation with fewer vectors than n_cells
    crashed with IndexError in the empty-cell reseed loop. Tiny embedding
    tables must train (and search) fine."""
    from dawnsearch_spark.operators.similarity import ivf_topk, train_ivf_centroids

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    C = train_ivf_centroids(df, n_cells=16)
    assert C.shape == (16, 3)
    assert np.all(np.isfinite(C))
    # end-to-end search still works and returns the planted neighbor first
    top = ivf_topk(df, [1.0, 0.0, 0.0], k=2, n_cells=16, nprobe=16).collect()
    assert top and top[0]["vec_id"] in (0, 1)


def test_png_batch_decode_matches_single_and_vectorizes():
    """VERDICT r3 demand #2: Paeth/Average unfiltering must run batched —
    decode_png_batch equals per-image decode on mixed shapes/filters, and
    on a same-shape Paeth group it beats the per-image loop by far more
    than this host's documented ±50% timing noise."""
    import time

    from dawnsearch_spark.operators.multimodal import decode_png, decode_png_batch, encode_png

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(64)]
    payloads = [encode_png(im, filter_type=4) for im in imgs]
    # mixed shapes + filters also route correctly
    odd = rng.integers(0, 256, (7, 5, 4), dtype=np.uint8)
    mixed = payloads[:3] + [encode_png(odd, filter_type=3)] + payloads[3:6]
    out = decode_png_batch(mixed)
    for got, want in zip(out, imgs[:3] + [odd] + imgs[3:6]):
        assert np.array_equal(got, want)

    t0 = time.perf_counter()
    batch = decode_png_batch(payloads)
    t_batch = time.perf_counter() - t0
    t0 = time.perf_counter()
    single = [decode_png(p) for p in payloads]
    t_single = time.perf_counter() - t0
    for g, w in zip(batch, single):
        assert np.array_equal(g, w)
    # expected speedup is ~B×; 2× margin clears host noise comfortably
    assert t_batch < t_single / 2, (t_batch, t_single)


def test_decode_stats_paeth_png(spark):
    """The stats path over PAETH-filtered PNGs (the real-world encoder
    default) reproduces the closed-form pattern exactly."""
    from dawnsearch_spark.operators.multimodal import (
        decode_image_stats,
        synthesize_bmp_media,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    stats = decode_image_stats(
        synthesize_bmp_media(docs, width=16, height=8, codec="png")
    ).collect()
    for r in stats:
        i = r["doc_id"]
        assert r["width"] == 16 and r["height"] == 8
        assert r["mean_r"] == pytest.approx(np.mean([(i + x) % 256 for x in range(16)]))
        assert r["corner_g"] == (2 * i) % 256


def test_decode_stats_jpeg(spark):
    """The stats path over real baseline JPEGs (q90 4:2:0): dimensions
    exact, channel means within lossy-compression tolerance of the
    closed-form pattern."""
    from dawnsearch_spark.operators.multimodal import (
        decode_image_stats,
        synthesize_bmp_media,
    )

    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    stats = decode_image_stats(
        synthesize_bmp_media(docs, width=16, height=8, codec="jpeg")
    ).collect()
    assert len(stats) == 8
    for r in stats:
        i = r["doc_id"]
        assert (r["width"], r["height"]) == (16, 8)
        want_r = np.mean([(i + x) % 256 for x in range(16)])
        assert abs(r["mean_r"] - want_r) < 2.0, (i, r["mean_r"], want_r)


def test_gopher_quality_filter_rules(spark):
    """Each rule must fire on its engineered violation and the composite
    keep must be the conjunction."""
    from dawnsearch_spark.operators.text_analysis import gopher_quality_filter

    good = (
        "the quick brown fox jumps over the lazy dog and it runs on "
        "with many plain words that look like ordinary prose for a test "
        "document of reasonable length and variety in this corpus here"
    )
    rows = [
        (0, good),                                    # passes everything
        (1, "short text only"),                       # too few tokens
        (2, good + " " + "pneumonoultramicroscopics " * 40),  # long words
        (3, ("@@ ## $$ %% ^^ && ** (( )) __ ++ == " * 10) + "the of a"),  # low alpha
        (4, " ".join(f"tok{i}" for i in range(60))),  # no stopwords
        (5, good + ("\nsame line of boilerplate" * 40)),  # dup lines
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert got[0]["keep"] == 1, got[0]
    assert got[1]["ok_len"] == 0 and got[1]["keep"] == 0
    assert got[2]["ok_word_len"] == 0 and got[2]["keep"] == 0
    assert got[3]["ok_alpha"] == 0 and got[3]["keep"] == 0
    assert got[4]["ok_stop"] == 0 and got[4]["keep"] == 0
    assert got[5]["ok_rep"] == 0 and got[5]["keep"] == 0
