"""End-to-end duplicate-detection pipeline (in-memory orchestration;
checkpointed/resumable variant lives in ``checkpoint.py``).

    pages (url, warc_ts, html, text, lang)
      │  exact-dup pre-group on md5(text)           [JVM only, no UDF]
      ▼
    reps (url, text)          members (url, text_fp, rep_url)
      │  sketch_udf (Arrow)
      ▼
    sketches (url, sketch array<long>, num_hashes)
      │  band_udf + posexplode → thin hot bands → self-join
      ▼
    candidates (id_a, id_b) → verify (exact intersection) → pairs
      │  hash-min connected components
      ▼
    clusters (url, cluster_id)   — cluster_id = min member url

The exact pre-group mirrors nothing in the reference (it compares every
sketch); it is the web-scale move that removes the dominant skew source
(boilerplate/exact mirrors) BEFORE the shuffle-heavy stages, and exact
duplicates provably share identical sketches, so results are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import connected_components
from .pairs import bands_table, candidate_pairs, thin_hot_bands, verify_pairs
from .params import SketchParams
from .sketch import jvm_sketch_col, make_sketch_udf


def exact_groups(pages: DataFrame) -> DataFrame:
    """(url, text_fp, rep_url): md5-text fingerprint and the minimum url
    of each identical-text group (the group's representative)."""
    fp = pages.select("url", F.md5(F.col("text")).alias("text_fp"))
    reps = fp.groupBy("text_fp").agg(F.min("url").alias("rep_url"))
    return fp.join(reps, "text_fp").select("url", "text_fp", "rep_url")


def sketch_stage(
    pages: DataFrame,
    params: SketchParams,
    dedup_exact_first: bool = True,
    n_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (sketches, membership).

    sketches:   (url, sketch array<long>, num_hashes int) — reps only.
    membership: (url, rep_url) for every input row.

    The rep set is repartitioned before the sketch UDF so the (CPU-bound)
    hashing uses the full task parallelism even when the source has few
    input splits.
    """
    if params.algo == "xxh64":
        sketch_col = jvm_sketch_col(params)
    else:
        sketch_col = make_sketch_udf(params)(F.col("text"))
    if dedup_exact_first:
        # persist the (url, text_fp, rep_url) relation: it feeds the rep
        # filter, the membership projection, rep_nodes, and the final
        # label join — uncached, each would rescan + re-md5 the full text
        groups = exact_groups(pages).persist()
        membership = groups.select("url", "rep_url")
        # the url-keyed shuffle join IS the partitioning for the UDF — no
        # second repartition of the heavy text column. SHUFFLE_HASH: a
        # sort-merge join would SORT the text rows (dominates the stage);
        # hash join needs only the small rep-url side in memory per task.
        reps = (
            pages.join(
                groups.filter(F.col("url") == F.col("rep_url"))
                .select("url")
                .hint("SHUFFLE_HASH"),
                "url",
            )
        )
    else:
        membership = pages.select("url", F.col("url").alias("rep_url"))
        n_partitions = (
            n_partitions
            or pages.sparkSession.sparkContext.defaultParallelism
        )
        reps = pages.repartition(n_partitions, "url")
    sketches = reps.select(
        "url", sketch_col.alias("sketch")
    ).withColumn("num_hashes", F.size("sketch"))
    return sketches, membership


def pairs_stage(
    sketches: DataFrame, params: SketchParams, broadcast_sketches: bool = False
) -> DataFrame:
    """sketches → verified duplicate pairs above cutoff.

    The bands table is persisted: it feeds the hot-band size aggregate,
    the thinning join, and both sides of the candidate self-join —
    without persistence the signature UDF would be recomputed 4x.
    """
    bands = bands_table(sketches, params).persist()
    bands.count()  # eager: 3 consumers below would race the cold cache
    bands = thin_hot_bands(bands, params)
    cands = candidate_pairs(bands)
    return verify_pairs(cands, sketches, params, broadcast_sketches)


def cluster_stage(
    pairs: DataFrame, membership: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Verified pairs (over reps) + exact membership → (url, cluster_id)
    for every input row. cluster_id = min url in the merged component."""
    rep_nodes = membership.select(F.col("rep_url").alias("url")).distinct()
    rep_clusters = connected_components(pairs, rep_nodes, max_iter=max_iter)
    return (
        membership.join(
            rep_clusters.withColumnRenamed("url", "rep_url"), "rep_url"
        )
        .select("url", "cluster_id")
    )


def dedup_pipeline(
    pages: DataFrame,
    params: SketchParams | None = None,
    dedup_exact_first: bool = True,
    broadcast_sketches: bool = False,
) -> DataFrame:
    """Full pipeline: pages → (url, cluster_id)."""
    params = params or SketchParams()
    sketches, membership = sketch_stage(pages, params, dedup_exact_first)
    # sketches feed the band UDF and both sides of the verify join;
    # membership feeds rep_nodes and the final label join — persist both
    # so the sketch UDF and the exact-group shuffle run exactly once
    sketches = sketches.persist()
    sketches.count()  # eager: bands + both verify joins consume it
    membership = membership.persist()
    pairs = pairs_stage(sketches, params, broadcast_sketches)
    return cluster_stage(pairs, membership)
