"""Training-pipeline operators: dedup families, text stats, similarity
search, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),        # exact dup
        (2, "The  quick brown fox jumps over the lazy dog"),       # ws/case dup
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (4, "completely different text about spark clusters and parquet"),
        (5, "another unrelated document mentioning gradient descent"),
        (6, "the quick brown fox jumps over the lazy dog today ok"),  # near dup
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_dedup(docs):
    from yetisearch_spark.dedup import exact_dedup
    kept = exact_dedup(docs).select("doc_id").collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert {3, 4, 5, 6} <= set(ids)


def test_minhash_lsh_dedup(docs):
    from yetisearch_spark.dedup import minhash_lsh_dedup
    groups = minhash_lsh_dedup(docs, num_hashes=64, bands=32,
                               jaccard_threshold=0.5).collect()
    g = {r["doc_id"]: r["group_id"] for r in groups}
    # the three exact/near-identical docs 0,1,2 must group together
    assert g.get(0) == g.get(1) == g.get(2) == 0
    # unrelated docs never appear
    assert 4 not in g and 5 not in g


def test_simhash_pairs(spark, docs):
    from yetisearch_spark.dedup import simhash_pairs
    toks = docs.withColumn("tokens", F.split(F.lower("text"), r"\s+"))
    pairs = simhash_pairs(toks, max_hamming=8).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (0, 1) in got  # identical docs → hamming 0
    assert all(r["hamming"] <= 8 for r in pairs)


def test_ngram_jaccard_pairs(docs):
    from yetisearch_spark.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(docs, threshold=0.6).collect()
    got = {(r["a"], r["b"]): r["jaccard"] for r in pairs}
    assert got.get((0, 1)) == 1.0
    assert (0, 3) in got  # near dup above 0.6
    assert (0, 4) not in got


def test_quality_features(spark):
    from yetisearch_spark.textstats import quality_features
    df = spark.createDataFrame(
        [(0, "This is a well formed sentence with reasonable words."),
         (1, "!!! ??? *** $$$ %%% ^^^ &&&"),
         (2, "x")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert rows[0]["quality_score"] > rows[1]["quality_score"]
    assert rows[0]["punct_ratio"] < 0.1
    assert rows[1]["punct_ratio"] > 0.5
    assert rows[2]["quality_score"] < 1.0  # too short


def test_token_counts(spark):
    from yetisearch_spark.textstats import (bpe_ish_token_count,
                                            whitespace_token_count)
    df = spark.createDataFrame([(0, "one two three"), (1, ""),
                                (2, "internationalization tokens")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", whitespace_token_count().alias("ws"),
        bpe_ish_token_count().alias("bpe")).collect()}
    assert rows[0]["ws"] == 3
    assert rows[1]["ws"] == 0
    assert rows[2]["bpe"] > rows[2]["ws"]  # long word → subword estimate


def test_langid(spark):
    from yetisearch_spark.textstats import make_langid_udf
    df = spark.createDataFrame(
        [(0, "the cat is on the mat and it is happy with this"),
         (1, "le chat est dans la maison avec les enfants pour une heure"),
         (2, "der hund ist nicht in der küche und das ist auch gut"),
         (3, "el perro está en la casa con los niños para una hora"),
         (4, "一只猫在垫子上 它很开心 一只猫在垫子上 它很开心 一只猫在垫子上")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["lang"] for r in
            df.select("doc_id", make_langid_udf()(F.col("text")).alias("lang")).collect()}
    assert rows[0] == "en" and rows[1] == "fr" and rows[2] == "de"
    assert rows[3] == "es" and rows[4] == "zh"


def test_fingerprint(spark):
    from yetisearch_spark.textstats import make_fingerprint_udf
    fp = make_fingerprint_udf()
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog " * 3),
         (1, "the quick brown fox jumps over the lazy dog " * 3),
         (2, "totally different content here about something else entirely")],
        "doc_id long, text string")
    rows = {r["doc_id"]: set(r["fp"]) for r in
            df.select("doc_id", fp(F.col("text")).alias("fp")).collect()}
    assert rows[0] == rows[1]
    overlap = len(rows[0] & rows[2]) / max(1, len(rows[0] | rows[2]))
    assert overlap < 0.2


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[7] = base[0] + rng.standard_normal(16).astype(np.float32) * 0.01
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_cosine_topk_exact(embeddings):
    from yetisearch_spark.similarity import cosine_topk
    df, base = embeddings
    q = base[0]
    rows = cosine_topk(df, q, k=5).collect()
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["cos_sim"] - 1.0) < 1e-6
    assert rows[1]["vec_id"] == 7  # the planted near-neighbor
    # matches numpy brute force exactly (order + value)
    sims = (base @ q) / (np.linalg.norm(base, axis=1) * np.linalg.norm(q))
    want = np.argsort(-sims)[:5].tolist()
    assert [r["vec_id"] for r in rows] == want


def test_lsh_recall(embeddings):
    from yetisearch_spark.similarity import lsh_cosine_topk, lsh_index
    df, base = embeddings
    indexed, tables = lsh_index(df, n_planes=6, n_tables=6, dim=16)
    indexed = indexed.persist()
    rows = lsh_cosine_topk(indexed, tables, base[0], k=3).collect()
    assert rows and rows[0]["vec_id"] == 0
    assert any(r["vec_id"] == 7 for r in rows)  # near-dup recalled
    indexed.unpersist()


def test_ivf(embeddings):
    from yetisearch_spark.similarity import ivf_cosine_topk, ivf_index
    df, base = embeddings
    indexed, cents = ivf_index(df, n_cells=4, dim=16)
    indexed = indexed.persist()
    rows = ivf_cosine_topk(indexed, cents, base[0], k=3, nprobe=3).collect()
    assert rows and rows[0]["vec_id"] == 0
    indexed.unpersist()


@pytest.fixture(scope="module")
def media(spark):
    from yetisearch_spark.multimodal import MEDIA_SCHEMA
    rows = [
        (0, "image", b"\x89PNGfakebytes0", {"width": "32", "height": "16"}),
        (1, "image", b"\x89PNGfakebytes1", {"width": "8", "height": "8"}),
        (2, "audio", b"RIFFfakeaudio" * 100, {"sample_rate": "8000"}),
        (3, "video", b"\x00\x00ftypfakevid", {"duration_ms": "3500"}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_multimodal_image_plumbing(media):
    from yetisearch_spark.multimodal import image_features
    rows = image_features(media, feature_dim=8, deterministic_fake=True).collect()
    assert len(rows) == 2
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[0]["width"] == 32 and by_id[0]["channels"] == 3
    assert len(by_id[0]["features"]) == 8
    # deterministic across runs
    rows2 = image_features(media, feature_dim=8, deterministic_fake=True).collect()
    assert {r["media_id"]: r["features"] for r in rows2} == \
        {r["media_id"]: r["features"] for r in rows}


def test_multimodal_stub_raises(media):
    from yetisearch_spark.multimodal import image_features
    import pyspark
    with pytest.raises(Exception):  # NotImplementedError inside the worker
        image_features(media, deterministic_fake=False).collect()


def test_multimodal_audio_video(media):
    from yetisearch_spark.multimodal import audio_features, sample_video_frames
    arow = audio_features(media, deterministic_fake=True).collect()
    assert len(arow) == 1 and arow[0]["sample_rate"] == 8000
    frames = sample_video_frames(media, deterministic_fake=True).collect()
    assert len(frames) == 3  # 3500ms // 1000ms
    assert [f["frame_idx"] for f in frames] == [0, 1, 2]
