"""JVM-native sketch mode (algo='xxh64'): parity with the oracle and
end-to-end cluster equality."""

import numpy as np
import pytest

from jam_spark import oracle as O
from jam_spark.hashes import xxh64
from jam_spark.params import SketchParams
from jam_spark.pipeline import dedup_pipeline, sketch_stage

JVM_PARAMS = SketchParams(algo="xxh64")


def test_xxh64_matches_spark_builtin(spark):
    samples = ["", "a", "hello world", "x" * 100, "naïve café", "tok " * 50]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    for r in df.selectExpr("s", "xxhash64(s) AS h").collect():
        assert (r["h"] & (2**64 - 1)) == xxh64(r["s"].encode("utf-8"), 42)


def test_jvm_sketch_matches_oracle(spark, corpus_pages, pages_df):
    sketches, _ = sketch_stage(pages_df, JVM_PARAMS)
    got = {r["url"]: r["sketch"] for r in sketches.collect()}
    by_text_rep = {}
    for p in corpus_pages:
        by_text_rep.setdefault(p.text, []).append(p.url)
    for text, urls in by_text_rep.items():
        rep = min(urls)
        want = O.sketch_text(text, JVM_PARAMS).hashes
        have = [h & (2**64 - 1) for h in got[rep]]
        assert have == want, rep


def test_jvm_mode_requires_fscale():
    with pytest.raises(ValueError, match="fscale >= 2"):
        SketchParams(algo="xxh64", fscale=None)


def test_jvm_pipeline_cluster_equality(spark, corpus_pages, pages_df):
    got = {
        r["url"]: r["cluster_id"]
        for r in dedup_pipeline(pages_df, JVM_PARAMS).collect()
    }
    o_sketches = [
        O.sketch_text(p.text, JVM_PARAMS, name=p.url) for p in corpus_pages
    ]
    o_pairs = O.all_pairs(o_sketches, JVM_PARAMS)
    want = O.cluster([p.url for p in corpus_pages], o_pairs)
    diffs = {u for u in got if got[u] != want[u]}
    assert not diffs, sorted(diffs)[:10]


def test_jvm_sketch_plan_is_codegen(spark, pages_df):
    """The sketch expression must stay inside whole-stage codegen — no
    Python evaluation node in the plan."""
    from jam_spark.sketch import jvm_sketch_col

    q = pages_df.select("url", jvm_sketch_col(JVM_PARAMS).alias("sk"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_jvm_sketch_non_ascii_parity(spark):
    """Unicode tokenization parity: the JVM split regex must equal
    Python str.split()'s whitespace class (NBSP, ideographic space, NEL,
    line/para separators, 1C-1F controls), and lower() must agree, so
    non-ASCII web text gets identical sketches to the documented oracle
    semantics."""
    base = [
        "F\u00fc\u00dfe na\u00efve CAF\u00c9 \u00fcber\u00a0alles stra\u00dfe GR\u00dcSSE",
        "\u65e5\u672c\u8a9e\u3000\u30c6\u30ad\u30b9\u30c8 \u6f22\u5b57 \u30c8\u30fc\u30af\u30f3 \u5206\u5272 \u30c6\u30b9\u30c8 \u6587\u66f8",
        "mixed\u2028lines\u2029and\u0085nel\u2009thin\u202fspace here",
        "tab\tnewline\ncr\r fs\x1c gs\x1d rs\x1e us\x1f end token",
        "\u03a3\u039f\u03a6\u039f\u03a3 \u0391\u0398\u0397\u039d\u0391 \u0416\u0423\u0420\u041d\u0410\u041b \u00e7\u0131lg\u0131n \u00f6l\u00e7\u00fc",
        "emoji \U0001f389 mixed ascii works too yes",
    ]
    # repeat so every doc clears k=5 tokens with room for many shingles
    texts = [" ".join([t] * 4) for t in base]
    params = SketchParams(algo="xxh64", fscale=2)
    df = spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(texts)], ["url", "text"]
    )
    from jam_spark.sketch import jvm_sketch_col

    got = {
        r["url"]: [h & (2**64 - 1) for h in r["sk"]]
        for r in df.select(
            "url", jvm_sketch_col(params).alias("sk")
        ).collect()
    }
    for i, t in enumerate(texts):
        want = O.sketch_text(t, params).hashes
        assert len(want) > 0, f"oracle produced empty sketch for case {i}"
        assert got[f"u{i}"] == want, base[i]
