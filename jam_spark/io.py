"""Interop sources/sinks mirroring the reference's I/O surface:

- sourmash-style JSON signature export/import (W2/W3:
  ``/root/reference/src/file_io.rs:181-197,316-323``,
  ``src/sketch.rs:26-34``, ``src/signature.rs:15-103``) — debug/interop
  format; hashes serialize as unsigned u64 ints in sorted ``mins`` order.
- TSV compare-result sink (W4: ``src/file_io.rs:406-413``,
  ``src/compare.rs:38-63``): ``from\\tto\\tnum_common\\tnum_kmers\\tscore``
  with the reverse flag swapping the name order, larger sketch first.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .params import M64, SketchParams


def export_sourmash_json(
    sketches: DataFrame, params: SketchParams, path: str
) -> None:
    """One JSON object per line: {name, ksize, max_hash, num, mins}.

    This is jam_spark's own FLAT dialect (value-compatible, not
    byte-compatible: ``mins`` are the same unsigned u64s in the same
    sorted order as the reference's sorted-BTreeSet iteration,
    src/sketch.rs:26-34, but the envelope differs). For files in the
    reference's actual nested sourmash envelope
    (src/signature.rs:15-31), use :func:`read_sourmash_envelope`.
    """
    k, max_hash = params.k, params.max_hash

    def _to_json(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for name, sk in zip(pdf["url"], pdf["sketch"]):
                mins = (
                    np.asarray(sk, dtype=np.int64).view(np.uint64).tolist()
                    if sk is not None and len(sk)
                    else []
                )
                lines.append(
                    json.dumps(
                        {
                            "name": name,
                            "ksize": k,
                            "max_hash": max_hash,
                            "num": len(mins),
                            "mins": mins,
                        },
                        sort_keys=True,
                    )
                )
            yield pd.DataFrame({"value": lines})

    sketches.select("url", "sketch").mapInPandas(
        _to_json, schema="value string"
    ).write.mode("overwrite").text(path)


def export_sourmash_envelope(
    sketches: DataFrame, params: SketchParams, path: str
) -> None:
    """Write the REFERENCE's actual nested sourmash envelope
    (``src/signature.rs:15-31`` / the public sourmash JSON schema): each
    output part-file is ONE JSON array of records, each record wrapping a
    ``signatures`` list with {num, ksize, seed, max_hash, mins, md5sum,
    molecule}. ``md5sum`` follows sourmash's public algorithm (md5 over
    str(ksize) then each min's decimal string). Round-trips through
    :func:`read_sourmash_envelope`; value-compatible with the
    reference's import path (mins = unsigned u64s, sorted)."""
    import hashlib

    k, max_hash = params.k, params.max_hash

    def _to_env(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        records = []
        for pdf in batches:
            for name, sk in zip(pdf["url"], pdf["sketch"]):
                mins = (
                    np.asarray(sk, dtype=np.int64).view(np.uint64).tolist()
                    if sk is not None and len(sk)
                    else []
                )
                md5 = hashlib.md5(str(k).encode())
                for m in mins:
                    md5.update(str(m).encode())
                records.append(
                    {
                        "class": "sourmash_signature",
                        "email": "",
                        "hash_function": "0.murmur64",
                        "filename": name,
                        "name": name,
                        "license": "CC0",
                        "signatures": [
                            {
                                "num": 0,
                                "ksize": k,
                                "seed": 42,
                                "max_hash": max_hash,
                                "mins": mins,
                                "md5sum": md5.hexdigest(),
                                "molecule": "DNA",
                            }
                        ],
                        "version": 0.4,
                    }
                )
        # one JSON array per PARTITION (= per output part-file), matching
        # the whole-file envelope shape read_sourmash_envelope expects
        yield pd.DataFrame({"value": [json.dumps(records, sort_keys=True)]})

    sketches.select("url", "sketch").mapInPandas(
        _to_env, schema="value string"
    ).write.mode("overwrite").text(path)


def read_sourmash_json(
    spark: SparkSession, path: str, expected: SketchParams | None = None
) -> DataFrame:
    """Parse signatures back to (url, sketch, num_hashes). Asserts uniform
    ksize/max_hash across records and against ``expected`` — the
    reference's import validation (src/signature.rs:41-55)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, sketches, nums, ks, mhs = [], [], [], [], []
            for line in pdf["value"]:
                d = json.loads(line)
                urls.append(d["name"])
                arr = np.array(d["mins"], dtype=np.uint64).view(np.int64)
                sketches.append(arr)
                nums.append(len(arr))
                ks.append(d["ksize"])
                mhs.append(d["max_hash"])
            yield pd.DataFrame(
                {
                    "url": urls,
                    "sketch": sketches,
                    "num_hashes": pd.array(nums, dtype="int32"),
                    "ksize": pd.array(ks, dtype="int32"),
                    "max_hash_str": [str(m) for m in mhs],
                }
            )

    raw = spark.read.text(path).mapInPandas(
        _parse,
        schema="url string, sketch array<long>, num_hashes int, ksize int, max_hash_str string",
    )
    return _validate_config(raw, path, expected)


def read_sourmash_envelope(
    spark: SparkSession, path: str, expected: SketchParams | None = None
) -> DataFrame:
    """Parse signature files in the REFERENCE's actual format — nested
    sourmash envelopes (``src/signature.rs:15-103`` via the sourmash
    crate): a JSON array of records, each with a ``signatures`` list of
    ``{mins, ksize, max_hash, ...}`` MinHash objects plus
    filename/name/md5sum metadata. Returns (url, sketch, num_hashes) —
    one row per inner signature; mirrors the reference's import
    validation (uniform ksize/max_hash, src/signature.rs:41-55) and its
    naming (``sourmash_signature.filename()``, src/signature.rs:57-62;
    ``name`` is the fallback when filename is absent).
    """

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, sketches, nums, ks, mhs = [], [], [], [], []
            for blob in pdf["value"]:
                records = json.loads(blob)
                if isinstance(records, dict):
                    records = [records]
                for rec in records:
                    name = rec.get("filename") or rec.get("name") or ""
                    for sig in rec.get("signatures", []):
                        arr = np.array(
                            sig.get("mins", []), dtype=np.uint64
                        ).view(np.int64)
                        urls.append(name)
                        sketches.append(arr)
                        nums.append(len(arr))
                        ks.append(int(sig["ksize"]))
                        mhs.append(str(sig.get("max_hash", M64)))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "sketch": sketches,
                    "num_hashes": pd.array(nums, dtype="int32"),
                    "ksize": pd.array(ks, dtype="int32"),
                    "max_hash_str": mhs,
                }
            )

    raw = (
        spark.read.option("wholetext", True)
        .text(path)
        .mapInPandas(
            _parse,
            schema=(
                "url string, sketch array<long>, num_hashes int, "
                "ksize int, max_hash_str string"
            ),
        )
    )
    return _validate_config(raw, path, expected)


def _validate_config(
    raw: DataFrame, path: str, expected: SketchParams | None
) -> DataFrame:
    distinct_cfg = raw.select("ksize", "max_hash_str").distinct().collect()
    if len(distinct_cfg) > 1:
        raise ValueError(f"Mixed sketch configs in {path}: {distinct_cfg}")
    if expected is not None and distinct_cfg:
        row = distinct_cfg[0]
        if row["ksize"] != expected.k or int(row["max_hash_str"]) != expected.max_hash:
            raise ValueError(
                f"Signature config (k={row['ksize']}, max_hash={row['max_hash_str']}) "
                f"does not match expected (k={expected.k}, max_hash={expected.max_hash})"
            )
    return raw.select("url", "sketch", "num_hashes")


def write_pairs_tsv(pairs: DataFrame, path: str) -> None:
    """Reference TSV sink, sorted by score descending (C7, src/main.rs:104).

    Name order matches the reference's ``Display`` exactly
    (src/compare.rs:38-62): internally ``from_name`` is the LARGER sketch
    (src/compare.rs:146-163, 221), but when ``reverse`` is set Display
    prints ``to_name`` first — restoring the ORIGINAL comparison order.
    Net effect: rows always print in the original (id_a, id_b) order; the
    ``reverse`` flag only records which side was larger."""
    out = pairs.select(
        F.col("id_a").alias("from"),
        F.col("id_b").alias("to"),
        "num_common",
        "num_kmers",
        F.col("similarity").alias("estimated_containment"),
    ).orderBy(F.col("estimated_containment").desc())
    out.write.mode("overwrite").option("sep", "\t").option(
        "header", True
    ).csv(path)
