"""Resumability (north_rule): kill after stage k, restart, identical
final clusters; params mismatch refused; incremental sketch append;
per-partition lineage metrics recorded."""

import json
import os

import pytest

from jam_spark.checkpoint import CheckpointedDedup
from jam_spark.corpus import generate_pages, pages_to_pandas
from jam_spark.params import SketchParams
from jam_spark.pipeline import dedup_pipeline


@pytest.fixture(scope="module")
def small_pages(spark):
    return spark.createDataFrame(
        pages_to_pandas(generate_pages(n_docs=200, seed=11))
    ).cache()


def _clusters_dict(df):
    return {r["url"]: r["cluster_id"] for r in df.collect()}


def test_kill_after_sketches_then_resume(spark, small_pages, tmp_path):
    params = SketchParams()
    want = _clusters_dict(dedup_pipeline(small_pages, params))

    root = str(tmp_path / "ck1")
    ck = CheckpointedDedup(spark, root, params)
    ck.run(small_pages, stop_after="sketches")  # "crash" mid-pipeline
    assert os.path.exists(os.path.join(root, "sketches", "_SUCCESS"))
    assert not os.path.exists(os.path.join(root, "pairs", "_SUCCESS"))

    # fresh object = fresh process; finish the run
    ck2 = CheckpointedDedup(spark, root, params)
    got = _clusters_dict(ck2.run(small_pages))
    assert got == want

    # fully-resumed rerun is a no-op with identical output
    ck3 = CheckpointedDedup(spark, root, params)
    got2 = _clusters_dict(ck3.run(small_pages))
    assert got2 == want


def test_kill_after_pairs_then_resume(spark, small_pages, tmp_path):
    params = SketchParams()
    root = str(tmp_path / "ck2")
    CheckpointedDedup(spark, root, params).run(small_pages, stop_after="pairs")
    got = _clusters_dict(CheckpointedDedup(spark, root, params).run(small_pages))
    want = _clusters_dict(dedup_pipeline(small_pages, params))
    assert got == want


def test_params_mismatch_refused(spark, small_pages, tmp_path):
    root = str(tmp_path / "ck3")
    CheckpointedDedup(spark, root, SketchParams()).run(
        small_pages, stop_after="sketches"
    )
    with pytest.raises(ValueError):
        CheckpointedDedup(spark, root, SketchParams(k=7))


def test_incremental_sketch_append(spark, tmp_path):
    params = SketchParams()
    pages_all = spark.createDataFrame(
        pages_to_pandas(generate_pages(n_docs=200, seed=11))
    )
    first = pages_all.limit(150)
    root = str(tmp_path / "ck4")
    ck = CheckpointedDedup(spark, root, params)
    sk1, _ = ck.run_sketches(first)
    n1 = sk1.count()

    ck2 = CheckpointedDedup(spark, root, params)
    sk2, mem2 = ck2.run_sketches(pages_all)
    assert mem2.count() == pages_all.count()
    assert sk2.count() >= n1  # old sketches kept, new appended


def test_metrics_lineage_recorded(spark, small_pages, tmp_path):
    root = str(tmp_path / "ck5")
    ck = CheckpointedDedup(spark, root, SketchParams())
    ck.run(small_pages)
    metrics = ck.metrics()
    stages = {m["stage"] for m in metrics}
    assert stages == {"sketches", "membership", "bands", "pairs", "clusters"}
    for m in metrics:
        assert m["rows"] == sum(p["rows"] for p in m["partitions"])
        assert m["wall_ms"] >= 0
        assert json.loads(m["params"])["k"] == 5
    st = ck.stats()
    assert st["n_pages"] == small_pages.count()
    assert st["n_clusters"] <= st["n_sketches"]


def test_incremental_append_invalidates_downstream(spark, tmp_path):
    """M2/A1 regression (round-1 advice): appending new pages to a
    COMPLETED run must not silently reuse the stale bands/pairs/clusters
    tables — the resumed run's clusters must equal a fresh full run."""
    params = SketchParams()
    pages_all = spark.createDataFrame(
        pages_to_pandas(generate_pages(n_docs=200, seed=11))
    ).cache()
    first = pages_all.limit(150)
    root = str(tmp_path / "ck6")

    CheckpointedDedup(spark, root, params).run(first)  # complete run
    got = _clusters_dict(CheckpointedDedup(spark, root, params).run(pages_all))
    want = _clusters_dict(dedup_pipeline(pages_all, params))
    assert set(got) == set(want)
    assert got == want
