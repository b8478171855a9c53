"""Spark sketch stage vs oracle: element-by-element sketch equality —
the analogue of the reference's sourmash E2E golden test
(/root/reference/tests/sketching.rs:16-60)."""

import numpy as np
from pyspark.sql import functions as F

from jam_spark import oracle as O
from jam_spark.params import SketchParams
from jam_spark.pipeline import sketch_stage
from jam_spark.sketch import make_sketch_udf


def test_sketch_udf_matches_oracle(spark, corpus_pages, pages_df):
    params = SketchParams(algo="xxh3")  # the Arrow-UDF packed-u64 path
    udf = make_sketch_udf(params)
    got = {
        r["url"]: r["sk"]
        for r in pages_df.select("url", udf("text").alias("sk")).collect()
    }
    assert len(got) == len(corpus_pages)
    for p in corpus_pages:
        want = O.sketch_text(p.text, params).hashes
        have = [int(np.uint64(np.int64(x))) for x in got[p.url]]
        assert have == want, p.url


def test_sketch_stage_exact_pregroup(spark, corpus_pages, pages_df):
    params = SketchParams()
    sketches, membership = sketch_stage(pages_df, params)
    n_pages = len(corpus_pages)
    n_distinct_texts = len({p.text for p in corpus_pages})
    assert membership.count() == n_pages
    assert sketches.count() == n_distinct_texts
    # representative is the min url of each identical-text group
    m = {r["url"]: r["rep_url"] for r in membership.collect()}
    by_text = {}
    for p in corpus_pages:
        by_text.setdefault(p.text, []).append(p.url)
    for text, urls in by_text.items():
        rep = min(urls)
        for u in urls:
            assert m[u] == rep


def test_sketch_pushdown_and_pruning(spark, pages_df, tmp_path):
    """Scan of a parquet pages table for sketching must read only (url,
    text) — column pruning — and push a lang filter to the scan."""
    path = str(tmp_path / "pages")
    pages_df.write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)
    udf = make_sketch_udf(SketchParams(algo="xxh3"))
    q = (
        pages.filter(F.col("lang") == "en")
        .select("url", udf("text").alias("sketch"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "html" not in plan  # binary column pruned from the scan
    explained = q._jdf.queryExecution().toString()
    assert "PushedFilters" in explained or "pushedFilters" in explained
