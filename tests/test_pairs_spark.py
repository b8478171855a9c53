"""LSH candidate generation + verification vs the exhaustive oracle:
dup-pair recall >= 0.99 at identical config (the BASELINE.json gate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jam_spark import oracle as O
from jam_spark.bands import band_arrays
from jam_spark.params import SketchParams
from jam_spark.pipeline import pairs_stage, sketch_stage


@pytest.fixture(scope="module")
def oracle_state(corpus_pages):
    params = SketchParams()
    sketches = [O.sketch_text(p.text, params, name=p.url) for p in corpus_pages]
    pairs = O.all_pairs(sketches, params)
    return params, sketches, pairs


def test_band_arrays_deterministic():
    params = SketchParams()
    sk = [
        np.array([1, 2, 3, 2**63 + 5], dtype=np.uint64),
        np.array([], dtype=np.uint64),
        np.array([7], dtype=np.uint64),
    ]
    b1 = band_arrays(sk, params)
    b2 = band_arrays(sk, params)
    assert all((x == y).all() for x, y in zip(b1, b2))
    assert len(b1[0]) == params.bands
    assert len(b1[1]) == 0  # empty sketch -> no bands
    # identical sketches collide in every band
    b3 = band_arrays([sk[0], sk[0].copy()], params)
    assert (b3[0] == b3[1]).all()


def test_pair_recall_vs_oracle(spark, corpus_pages, pages_df, oracle_state):
    params, o_sketches, o_pairs = oracle_state
    sketches, membership = sketch_stage(pages_df, params)
    got = pairs_stage(sketches, params).collect()
    got_pairs = {(r["id_a"], r["id_b"]): r for r in got}

    # exact-dup membership: pairs inside one exact group never reach the
    # LSH stage; account for them via the rep mapping
    rep = {r["url"]: r["rep_url"] for r in membership.collect()}

    missing = []
    score_mismatch = []
    for a, b, c, nk, s in o_pairs:
        ra, rb = rep[a], rep[b]
        if ra == rb:
            continue  # same exact group — implied pair, similarity 100
        key = (min(ra, rb), max(ra, rb))
        if key not in got_pairs:
            missing.append((a, b, s))
        else:
            r = got_pairs[key]
            if not (
                r["num_common"] == c
                and r["num_kmers"] == nk
                and abs(r["similarity"] - s) < 1e-9
            ):
                score_mismatch.append((key, (r["num_common"], r["num_kmers"], r["similarity"]), (c, nk, s)))

    considered = [p for p in o_pairs if rep[p[0]] != rep[p[1]]]
    recall = 1 - len(missing) / max(1, len(considered))
    assert not score_mismatch, score_mismatch[:5]
    assert recall >= 0.99, f"recall {recall}: missing {missing[:10]}"

    # no false positives: every verified Spark pair must be an oracle pair
    o_keys = {
        (min(rep[a], rep[b]), max(rep[a], rep[b])) for a, b, *_ in o_pairs
    }
    extras = set(got_pairs) - o_keys
    assert not extras, list(extras)[:10]


def test_hot_band_thinning_caps_postings(spark, pages_df):
    from jam_spark.pairs import bands_table, thin_hot_bands

    params = SketchParams(band_cap=8)
    sketches, _ = sketch_stage(pages_df, params)
    bands = bands_table(sketches, params).persist()
    thinned = thin_hot_bands(bands, params).persist()
    sizes = (
        thinned.groupBy("band_id", "band_hash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # thinning keeps ~cap members (probabilistic mod filter: allow 3x slack)
    assert sizes <= 3 * params.band_cap
    assert thinned.count() < bands.count()  # the hot template got thinned
    # per-band rotation: every doc that had bands must KEEP at least one
    # (losing all bands would exile it from its cluster)
    before = {r["url"] for r in bands.select("url").distinct().collect()}
    after = {r["url"] for r in thinned.select("url").distinct().collect()}
    assert before == after


def test_hot_cluster_survives_aggressive_thinning(spark, corpus_pages, pages_df):
    """With a tiny band_cap the giant near-identical template cluster must
    still close into ONE connected component (the per-band survivor
    rotation keeps every member reachable)."""
    from jam_spark.pipeline import dedup_pipeline

    params = SketchParams(band_cap=8)
    got = {
        r["url"]: r["cluster_id"]
        for r in dedup_pipeline(pages_df, params).collect()
    }
    truth = {}
    for p in corpus_pages:
        truth.setdefault(p.cluster_id, set()).add(p.url)
    template_cluster = max(truth.values(), key=len)
    assert len(template_cluster) >= 100
    labels = {got[u] for u in template_cluster}
    assert len(labels) == 1, f"template cluster fragmented into {len(labels)}"


def test_verify_stage_is_jvm_only(spark):
    """The verify stage (candidate join + intersection + scoring) must
    contain NO Python evaluation node — num_common is
    size(array_intersect(...)), a whole-stage-codegen expression."""
    from jam_spark.pairs import verify_pairs

    sketches = spark.createDataFrame(
        [("a", [1, 2, 3], 3), ("b", [1, 2, 4], 3)],
        ["url", "sketch", "num_hashes"],
    )
    cands = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    q = verify_pairs(cands, sketches, SketchParams(cutoff=0.0))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    row = q.collect()[0]
    # golden {1,2,3}x{1,2,4}: common=2, min-denom=3, 66.66...
    assert (row["num_common"], row["num_kmers"]) == (2, 3)
    assert abs(row["similarity"] - 200.0 / 3.0) < 1e-9


def test_pairs_stage_plan_has_no_rowwise_python(spark, pages_df):
    """The whole pairs plan (bands → thin → candidates → verify → remap)
    must contain no row-at-a-time Python (BatchEvalPython); the only
    Python left in the flagship path is the Arrow-vectorized band UDF
    (see bands.py for why that one stays)."""
    from jam_spark.pipeline import pairs_stage, sketch_stage

    params = SketchParams()
    sketches, _ = sketch_stage(pages_df.limit(100), params)
    p = pairs_stage(sketches.persist(), params)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


@pytest.mark.parametrize("band_cap", [256, 8])
def test_packed_bands_candidates_match_unpacked(spark, pages_df, band_cap):
    """The single-exchange packed-postings plan (packed_bands +
    thin_hot_bkeys + bkey self-join) must produce the IDENTICAL
    candidate set as the unpacked (band_id, band_hash) plan at both a
    no-hot cap (256) and an aggressively-hot cap (8) — the rotation
    residues are the same function of (band_id, xxhash64(id), mod), so
    packing changes plan shape, never membership (modulo 58-bit key
    collisions, absent at test scale)."""
    from jam_spark._persist import release_all, track
    from jam_spark.pairs import (
        bands_table,
        candidate_pairs,
        packed_bands,
        thin_hot_bands,
        thin_hot_bkeys,
        with_nid,
    )

    params = SketchParams(band_cap=band_cap)
    sketches, _ = sketch_stage(pages_df, params)
    sk = with_nid(track(sketches, eager=True))

    new_bands = thin_hot_bkeys(
        track(packed_bands(sk, params, id_col="nid")), params, id_col="nid"
    )
    new = {
        tuple(r)
        for r in candidate_pairs(new_bands, id_col="nid").collect()
    }
    old_bands = thin_hot_bands(
        track(bands_table(sk, params, id_col="nid"), eager=True),
        params,
        id_col="nid",
    )
    old = {
        tuple(r)
        for r in candidate_pairs(old_bands, id_col="nid").collect()
    }
    release_all()
    assert new == old
    assert len(new) > 0
