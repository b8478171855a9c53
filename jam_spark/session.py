"""SparkSession factory for local runs (tests, bench, CLI).

On a real cluster the job ships via ``spark-submit --py-files``; nothing
in the pipeline assumes local mode — partitioning/shuffle behavior is
driven entirely by the DataFrame plan + AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dir() -> str:
    """Shuffle/spill dir: prefer tmpfs — on a real cluster this is the
    node's local SSD; the sandbox's ext4 root would serialize shuffle I/O."""
    for cand in ("/dev/shm", "/tmp"):
        if os.path.isdir(cand) and os.access(cand, os.W_OK):
            d = os.path.join(cand, "jam-spark-local")
            os.makedirs(d, exist_ok=True)
            return d
    return "/tmp"


def get_spark(
    app: str = "jam_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str = "24g",
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", _local_dir())
        .getOrCreate()
    )
    from .deploy import ensure_shipped

    ensure_shipped(spark)
    return spark
