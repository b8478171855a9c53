"""Duplicate-cluster closure: connected components over the verified-pair
edge DataFrame via iterative hash-min label propagation.

Not present in the reference (jam-rs stops at scored pairs,
``src/compare.rs:28-36``); required by the north_rule. The label of a
component converges to the minimum member id (same convention as the
pure-Python oracle's union-find), so cluster ids are deterministic and
restart-stable.

Scale notes: each iteration is one shuffle on the node id; duplicate
clusters are near-cliques (diameter 1-2) so convergence is fast — the
giant-cluster / long-chain worst case is bounded by ``max_iter`` and each
iteration is ``localCheckpoint``ed to cut lineage (SURVEY §7 hard-part 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    id_a: str = "id_a",
    id_b: str = "id_b",
    driver_threshold: int = 5_000_000,
) -> DataFrame:
    """Returns (url, cluster_id): cluster_id = min id in the component.

    ``edges``: (id_a, id_b) pairs. ``nodes``: optional (url) universe —
    ids with no edges become singleton clusters of themselves.

    Hybrid strategy (same spirit as AQE's runtime broadcast switch):
    after dedup the *edge* set is orders of magnitude smaller than the
    corpus — duplicate pairs only. If it fits comfortably on the driver
    (≤ ``driver_threshold`` edges) a local union-find closes components
    in one pass and the labels are joined back distributively; above the
    threshold the iterative hash-min label propagation runs fully
    distributed. Both produce identical labels (min member id).
    """
    e0 = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # persist: the edge set is consumed by the size probe and then either
    # collected (driver path) or iterated (distributed path) — without
    # persistence the whole upstream pairs pipeline would recompute
    e0 = e0.persist()
    n_edges = e0.limit(driver_threshold + 1).count()
    if n_edges <= driver_threshold:
        out = _cc_driver(e0, nodes)
    else:
        out = _cc_distributed(e0, nodes, max_iter)
    return out


def _cc_driver(e0: DataFrame, nodes: DataFrame | None) -> DataFrame:
    """Collect edges (NOT the corpus) to the driver, union-find, join
    labels back. Only multi-member clusters need a labels row — nodes
    absent from the (broadcast) label map are singletons of themselves."""
    spark = e0.sparkSession
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    # collect() is one job; toLocalIterator would serialize one job per
    # partition and dominate wall time at high parallelism
    for row in e0.collect():
        a, b = row["src"], row["dst"]
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    labels = [(x, find(x)) for x in list(parent)]
    if nodes is None:
        universe = e0.select(F.col("src").alias("url")).union(
            e0.select(F.col("dst").alias("url"))
        ).distinct()
    else:
        universe = nodes.select(F.col(nodes.columns[0]).alias("url")).distinct()
    if not labels:
        return universe.select("url", F.col("url").alias("cluster_id"))
    lab_df = spark.createDataFrame(labels, ["url", "label"])
    return (
        universe.join(F.broadcast(lab_df), "url", "left")
        .select(
            "url",
            F.coalesce(F.col("label"), F.col("url")).alias("cluster_id"),
        )
    )


def _cc_distributed(
    e0: DataFrame, nodes: DataFrame | None, max_iter: int
) -> DataFrame:
    e = e0
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint(eager=True)

    if nodes is not None:
        universe = nodes.select(F.col(nodes.columns[0]).alias("url")).distinct()
    else:
        universe = e.select(F.col("src").alias("url")).distinct()

    labels = universe.select("url", F.col("url").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # message passing: every node offers its label to its neighbors;
        # new label = min(own, incoming)
        msgs = e.join(
            labels.withColumnRenamed("url", "src"), "src"
        ).select(F.col("dst").alias("url"), "cluster_id")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("url")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "url")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
