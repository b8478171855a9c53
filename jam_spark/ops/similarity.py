"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k cosine neighbors; the
  correctness baseline. Dot products are sequential folds in float64 so
  the DuckDB oracle (list_reduce) is bit-identical.
- :func:`ann_lsh_topk` — random-hyperplane LSH bucketing: each vector is
  signed against ``n_planes`` deterministic hyperplanes; candidates share
  a bucket in at least one of ``n_tables`` tables; exact cosine re-rank
  inside buckets. The scale path (shuffle keys are bucket ids, no
  all-pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..hashes import M64, xxh3_u64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """(vec_id, neighbor_id, cosine, rank) — exact brute-force top-k.

    Rank ties break on neighbor_id asc; self-pairs excluded. The O(n²)
    pair space is the *baseline*; use :func:`ann_lsh_topk` at scale.
    """
    a = embeddings.select(
        F.col("vec_id").alias("vec_id"), F.col("embedding").alias("ea")
    )
    b = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb")
    )
    pairs = a.crossJoin(b).filter(F.col("vec_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "vec_id",
        "neighbor_id",
        (
            _dot(F.col("ea"), F.col("eb"))
            / (_norm(F.col("ea")) * _norm(F.col("eb")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("vec_id").cast("long"),
            F.col("neighbor_id").cast("long"),
            "cosine",
            F.col("rank").cast("long"),
        )
    )


def cosine_topk_sql(k: int = 5) -> str:
    dot = (
        "list_reduce([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE "
        "for i in range(1, len(a.embedding) + 1)], (x, y) -> x + y)"
    )
    norm_a = (
        "sqrt(list_reduce([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE "
        "for i in range(1, len(a.embedding) + 1)], (x, y) -> x + y))"
    )
    norm_b = (
        "sqrt(list_reduce([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE "
        "for i in range(1, len(b.embedding) + 1)], (x, y) -> x + y))"
    )
    return f"""
        WITH scored AS (
          SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                 {dot} / ({norm_a} * {norm_b}) AS cosine
          FROM embeddings a, embeddings b
          WHERE a.vec_id <> b.vec_id
        ),
        ranked AS (
          SELECT vec_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT vec_id::BIGINT AS vec_id, neighbor_id::BIGINT AS neighbor_id,
               cosine, rank::BIGINT AS rank
        FROM ranked WHERE rank <= {k}
    """


def cosine_topk_fast(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Fast exact top-k: broadcast the (normalized) matrix to executors,
    stream rows through a vectorized mapInPandas matmul + argpartition.

    Same results as :func:`cosine_topk` up to float summation order
    (np.dot) — use cosine_topk for bit-exact oracle parity, this one for
    throughput. Scale path: one broadcast of d×n floats (fits for ≤ ~10M
    vectors); beyond that, IVF/LSH (:func:`ann_lsh_topk`).
    """
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sc = embeddings.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)

    def _topk(batches):
        ids_l = b_ids.value
        mat_l = b_mat.value
        pos = {int(v): i for i, v in enumerate(ids_l)}
        for pdf in batches:
            q = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ mat_l.T  # (batch, n)
            out_v, out_n, out_c, out_r = [], [], [], []
            for bi, vid in enumerate(pdf["vec_id"]):
                s = sims[bi]
                s[pos[int(vid)]] = -np.inf  # exclude self
                nn = np.argpartition(-s, k)[: k + 1]
                nn = nn[np.lexsort((ids_l[nn], -s[nn]))][:k]
                for r, j in enumerate(nn, start=1):
                    out_v.append(int(vid))
                    out_n.append(int(ids_l[j]))
                    out_c.append(float(s[j]))
                    out_r.append(r)
            yield pd.DataFrame(
                {
                    "vec_id": pd.array(out_v, dtype="int64"),
                    "neighbor_id": pd.array(out_n, dtype="int64"),
                    "cosine": pd.array(out_c, dtype="float64"),
                    "rank": pd.array(out_r, dtype="int64"),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        _topk, schema="vec_id long, neighbor_id long, cosine double, rank long"
    )


@F.pandas_udf(T.DoubleType())
def _cosine_pair_udf(ea: pd.Series, eb: pd.Series) -> pd.Series:
    a = np.vstack(ea.to_numpy()).astype(np.float64)
    b = np.vstack(eb.to_numpy()).astype(np.float64)
    num = (a * b).sum(axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return pd.Series(num / den)


# ------------------------------------------------ LSH-bucketed ANN path

def _planes(dim: int, n_planes: int, seed: int = 0xA11CE) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from xxh3 streams."""
    vals = np.empty(dim * n_planes, dtype=np.float64)
    for i in range(dim * n_planes):
        vals[i] = (xxh3_u64((seed + i) & M64) / float(M64)) * 2.0 - 1.0
    return vals.reshape(n_planes, dim)


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 24,
) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane LSH.

    Scale shape: |bucket|² work instead of n²; buckets are the shuffle
    key. Exact cosine re-rank within candidate pairs.

    Collision probability per table is (1 - θ/π)^n_planes, so n_planes
    trades candidate volume against recall: the defaults (4, 24) hit
    ≥0.99 top-1 recall on *low-similarity* neighbors (cos ≈ 0.37, the
    synthetic test corpus). For dedup-style high-similarity targets at
    web scale, raise n_planes (12-16) so buckets stay small — recall per
    table falls slowly when cos → 1 but candidate volume falls
    exponentially.
    """
    dim = len(embeddings.select("embedding").first()["embedding"])
    planes = {
        t: _planes(dim, n_planes, seed=0xA11CE + 7919 * t)
        for t in range(n_tables)
    }

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_udf(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())
        out = []
        sigs = []
        for t in range(n_tables):
            proj = mat @ planes[t].T  # (n, n_planes)
            bits = (proj > 0).astype(np.uint64)
            sig = np.zeros(len(mat), dtype=np.uint64)
            for p in range(n_planes):
                sig = (sig << np.uint64(1)) | bits[:, p]
            sigs.append((np.uint64(t) << np.uint64(60)) | sig)
        stacked = np.stack(sigs, axis=1).astype(np.int64)
        return pd.Series(list(stacked))

    # bucket join carries IDS ONLY — embeddings (512B each) attach after
    # dedup via broadcast-able joins, so the self-join shuffles ~16 bytes
    # per candidate instead of ~1KB
    b = embeddings.select(
        "vec_id", F.explode(bucket_udf("embedding")).alias("bucket")
    ).persist()
    cand = (
        b.alias("x")
        .join(b.alias("y"), "bucket")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_id"),
            F.col("y.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    emb = embeddings.select("vec_id", "embedding")
    scored = (
        cand.join(
            emb.withColumnsRenamed({"vec_id": "vec_id", "embedding": "ea"}),
            "vec_id",
        )
        .join(
            emb.withColumnsRenamed({"vec_id": "neighbor_id", "embedding": "eb"}),
            "neighbor_id",
        )
        .select("vec_id", "neighbor_id", _cosine_pair_udf("ea", "eb").alias("cosine"))
    )
    sym = scored.unionByName(
        scored.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("vec_id").alias("neighbor_id"),
            "cosine",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("vec_id").cast("long"),
            F.col("neighbor_id").cast("long"),
            "cosine",
            F.col("rank").cast("long"),
        )
    )
