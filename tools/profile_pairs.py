"""Stage-level profile of the flagship pairs stage at scaling-bench size.

The flagship (pages_dedup) has been ~flat across rounds while its
per-core cost dropped; VERDICT r3 named the bands explode+persist the
next profiling target. Round-4 decomposition at the 1M-doc corpus
(16 cores) showed the OLD pairs plan paying three exchanges over the
57.6M-row postings table: hot-size aggregate ~20s (band keys are
mostly unique, so map-side combine doesn't shrink that shuffle),
candidate self-join ~32.5s, verify+remap ~6.5s. The packed-bands
restructure (jam_spark.pairs.packed_bands) repartitions the (bkey,
nid) postings ONCE and persists post-shuffle so the aggregate and
both self-join sides reuse the cached hashpartitioning.

This script A/B-tests the two pairs plans end-to-end (median of N
interleaved reps, JIT-warm, one shared sketch pass) and prints the
exchange nodes of the new candidate plan at scale, so the claimed
improvement is a measured number and a negative result is documented
with data.

Usage: python tools/profile_pairs.py [--docs 1000000] [--cores 16]
       [--reps 3]
"""

from __future__ import annotations

import argparse
import io
import contextlib
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.sched_setaffinity(0, range(args.cores))
    import scaling_bench as sb

    corpus = sb.ensure_corpus(args.docs)

    from jam_spark import pairs as P
    from jam_spark._persist import release_all, track
    from jam_spark.params import SketchParams
    from jam_spark.pipeline import pairs_stage, sketch_stage
    from jam_spark.session import get_spark

    corpus_bytes = os.path.getsize(corpus)
    split = max(1 << 22, corpus_bytes // (4 * args.cores))
    spark = get_spark(
        app="profile_pairs", cores=args.cores,
        shuffle_partitions=2 * args.cores, max_partition_bytes=split,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus).select("url", "text")
    params = SketchParams()

    # one sketch pass, pinned for every variant (pairs-only comparison)
    sketches, _ = sketch_stage(pages, params)
    sketches = sketches.persist()
    n_sk = sketches.count()
    print(f"# sketches: {n_sk}", flush=True)

    def run_old() -> float:
        """Round-3/early-round-4 plan: eager bands persist keyed on scan
        partitions; hot aggregate, thinning join, and self-join each pay
        their own exchange."""
        t0 = time.time()
        sk = P.with_nid(sketches)
        bands = track(P.bands_table(sk, params, id_col="nid"), eager=True)
        bands = P.thin_hot_bands(bands, params, id_col="nid")
        cands = P.candidate_pairs(bands, id_col="nid")
        pairs_n = P.verify_pairs(cands, sk, params, id_col="nid")
        P.remap_pairs(pairs_n, sk.select("nid", "url")).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        release_all()
        return dt

    def run_new() -> float:
        """Current pairs_stage (packed_bands single-exchange plan)."""
        t0 = time.time()
        pairs_stage(sketches, params).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        release_all()
        return dt

    variants = {"old_3x_exchange": run_old, "new_packed": run_new}
    for fn in variants.values():  # JIT warmup
        fn()
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.reps):
        for k, fn in variants.items():
            samples[k].append(round(fn(), 2))
    print(json.dumps({
        "ab": {
            k: {"median": round(statistics.median(v), 2), "samples": v}
            for k, v in samples.items()
        },
        "docs": args.docs, "cores": args.cores,
    }), flush=True)

    # plan audit at scale: exchanges in the NEW candidate plan
    sk = P.with_nid(sketches)
    bands = track(P.packed_bands(sk, params, id_col="nid"))
    bands = P.thin_hot_bkeys(bands, params, id_col="nid")
    cands = P.candidate_pairs(bands, id_col="nid")
    cands.count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cands.explain(mode="formatted")
    nodes = [
        ln.strip() for ln in buf.getvalue().splitlines()
        if ln.strip().startswith("(") and (
            "Exchange" in ln or "Join" in ln or "InMemoryTableScan" in ln
        )
    ]
    print(json.dumps({"new_candidates_plan_nodes": nodes}), flush=True)
    release_all()
    spark.stop()


if __name__ == "__main__":
    main()
