"""Iceberg availability probe (north_rule: "checkpoints ... to Iceberg").

Checks, in order, whether the sandbox can provide an Iceberg runtime:

1. an ``iceberg-spark-runtime`` jar on the pyspark jars path or in
   ``$SPARK_JARS_EXTRA``;
2. the ``org.apache.iceberg.spark.SparkCatalog`` class loadable through
   a live JVM;
3. a ``pyiceberg`` python package.

Prints one JSON line and exits 0 either way — the result is recorded in
BENCH/BASELINE.md. Probed result in THIS sandbox: no iceberg jars, no
pyiceberg, no network to fetch them — so ``jam_spark.checkpoint`` keeps
its layout-identical parquet stage tables (same resume contract;
SketchParams travel in a side-car params.json where Iceberg would carry
them as table properties).

    python tools/iceberg_probe.py
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    result: dict = {"probe": "iceberg"}

    import pyspark

    jar_dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_JARS_EXTRA"):
        jar_dirs.append(os.environ["SPARK_JARS_EXTRA"])
    jars = [
        j
        for d in jar_dirs
        for j in glob.glob(os.path.join(d, "*iceberg*.jar"))
    ]
    result["runtime_jars"] = jars

    result["pyiceberg"] = importlib.util.find_spec("pyiceberg") is not None

    class_loadable = False
    if jars:
        from jam_spark.session import get_spark

        spark = get_spark(app="iceberg_probe", cores=2)
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            class_loadable = True
        except Exception:
            class_loadable = False
        finally:
            spark.stop()
    result["catalog_class_loadable"] = class_loadable
    result["available"] = bool(jars) and class_loadable
    print(json.dumps(result))


if __name__ == "__main__":
    main()
