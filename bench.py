"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The headline set covers the core jam-rs-semantics pipeline (sketch →
LSH → verify → cluster) on the documents table, a 20k-page synthetic
web corpus for the flagship dedup run, and the auxiliary training-data
operators. Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("JAM_BENCH_PAGES", "20000"))


def _bench_corpus_path() -> str:
    cache = os.path.join(REPO, ".cache")
    os.makedirs(cache, exist_ok=True)
    # row_group_size: Spark cannot split WITHIN a parquet row group, and
    # the sketch runs map-side INSIDE the scan — row groups ARE the
    # sketch-stage parallelism ceiling. Target >= 128 groups so even a
    # 20k-page corpus feeds 32 cores with 4 waves (~1.8 MB groups);
    # floor 512 keeps groups from degenerating into per-row pages.
    rg = max(512, BENCH_PAGES // 128)
    path = os.path.join(cache, f"pages_{BENCH_PAGES}_rg{rg}.parquet")
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if BENCH_PAGES > 100_000:
            from jam_spark.corpus import fast_corpus_pandas

            pdf = fast_corpus_pandas(BENCH_PAGES, seed=42)
        else:
            from jam_spark.corpus import generate_pages, pages_to_pandas

            pdf = pages_to_pandas(generate_pages(n_docs=BENCH_PAGES, seed=42))
        # pyarrow defaults to ns timestamps, which Spark's parquet reader
        # rejects; the bench only needs (url, text, lang) anyway.
        pq.write_table(
            pa.Table.from_pandas(pdf[["url", "text", "lang"]]),
            path,
            row_group_size=rg,
        )
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from jam_spark.ops import dedup, similarity, text
    from jam_spark.params import SketchParams
    from jam_spark.pipeline import dedup_pipeline
    from jam_spark.session import get_spark

    corpus_path = _bench_corpus_path()

    spark = get_spark(app="jam_spark_bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    pages = spark.read.parquet(corpus_path).select("url", "text")
    n_pages = pages.count()

    def run(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    timings: dict[str, float] = {}

    def bench(name, df):
        timings[name] = round(run(df), 3)

    bench("exact_dedup_groups", dedup.exact_dedup_groups(docs))
    bench("token_counts", text.token_counts(docs))
    bench("doc_quality", text.doc_quality(docs))
    bench("lang_id", text.lang_id(docs))
    bench("ngram_jaccard_pairs", dedup.ngram_jaccard_pairs(docs))
    bench("simhash", dedup.simhash(docs))
    bench("minhash_sketches", dedup.minhash_sketches(docs))
    bench("minhash_pairs", dedup.minhash_pairs(docs))
    bench("minhash_clusters", dedup.minhash_clusters(docs))
    bench("cosine_topk_fast", similarity.cosine_topk_fast(embs))
    bench("ann_lsh_topk", similarity.ann_lsh_topk(embs))

    t0 = time.time()
    dedup_pipeline(pages, SketchParams()).write.format("noop").mode(
        "overwrite"
    ).save()
    pages_sec = time.time() - t0
    timings[f"pages_dedup_{n_pages}"] = round(pages_sec, 3)
    timings["pages_dedup_docs_per_sec"] = round(n_pages / pages_sec, 1)

    total = round(
        sum(v for k, v in timings.items() if "docs_per_sec" not in k), 3
    )
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
