"""Training-data operator tests: similarity search recall, multimodal
plumbing, simhash/ngram behavior on planted duplicates."""

import numpy as np
from pyspark.sql import functions as F


def test_ann_lsh_recall_vs_brute_force(spark):
    from jam_spark.ops.similarity import ann_lsh_topk, cosine_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = cosine_topk(embs, k=3).collect()
    approx = ann_lsh_topk(embs, k=3).collect()
    exact_top1 = {r["vec_id"]: r["neighbor_id"] for r in exact if r["rank"] == 1}
    approx_map = {
        (r["vec_id"], r["rank"]): r["neighbor_id"] for r in approx
    }
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    hits = sum(
        1
        for v, n in exact_top1.items()
        if n in approx_sets.get(v, set())
    )
    recall = hits / len(exact_top1)
    assert recall >= 0.9, f"top-1-in-top-3 LSH recall {recall}"


def test_multimodal_feature_plumbing(spark):
    from jam_spark.ops.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["decode_ok"] is True
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
        assert len(r["sha256"]) == 64
    # determinism across runs
    feats2 = extract_features(synthesize_media(spark, n=30)).collect()
    f1 = {r["media_id"]: r["feature"] for r in feats}
    f2 = {r["media_id"]: r["feature"] for r in feats2}
    assert f1 == f2


def test_multimodal_real_decoder_stubbed(spark):
    from jam_spark.ops.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=6)
    feats = extract_features(media, use_fake=False).collect()
    assert all(r["decode_ok"] is False for r in feats)
    assert all("not installed" in r["decode_error"] for r in feats)


def test_frame_sample_plan(spark):
    from jam_spark.ops.multimodal import frame_sample_plan, synthesize_media

    media = synthesize_media(spark, n=30)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for mid, frames in by_media.items():
        assert len(frames) == max(durations[mid] // 1000, 1)


def test_simhash_near_dups_close(spark):
    from jam_spark.ops.dedup import simhash

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy cat again and again"),
            (3, "completely different words about spark shuffles and parquet files"),
        ],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}

    def hamming(a, b):
        return sum(1 for x, y in zip(a, b) if x != y)

    assert hamming(fps[1], fps[2]) < hamming(fps[1], fps[3])
    assert hamming(fps[1], fps[2]) < hamming(fps[2], fps[3])
