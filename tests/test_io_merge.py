"""Interop I/O (sourmash JSON, TSV) + sketch merge + all-pairs mode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jam_spark import oracle as O
from jam_spark.io import export_sourmash_json, read_sourmash_json, write_pairs_tsv
from jam_spark.pairs import all_pairs_compare
from jam_spark.params import SketchParams
from jam_spark.pipeline import sketch_stage
from jam_spark.sketch import merge_sketches


def test_sourmash_roundtrip(spark, pages_df, tmp_path):
    params = SketchParams()
    sketches, _ = sketch_stage(pages_df, params)
    sketches = sketches.persist()
    path = str(tmp_path / "sigs")
    export_sourmash_json(sketches, params, path)
    back = read_sourmash_json(spark, path, expected=params)
    a = {r["url"]: list(r["sketch"]) for r in sketches.collect()}
    b = {r["url"]: list(r["sketch"]) for r in back.collect()}
    assert a == b

    # mins are unsigned in the file (reference sourmash compat)
    line = open(
        [str(p) for p in (tmp_path / "sigs").glob("part-*.txt")][0]
    ).readline()
    import json

    d = json.loads(line)
    assert all(m >= 0 for m in d["mins"])
    assert d["ksize"] == params.k and d["max_hash"] == params.max_hash


def test_sourmash_envelope_roundtrip(spark, pages_df, tmp_path):
    """W2 write parity: the nested-envelope WRITER round-trips through
    the reference-format reader, and each part-file is a valid sourmash
    envelope (array of records, signatures[].mins unsigned, md5sum =
    sourmash's public ksize+mins digest)."""
    import hashlib
    import json

    from jam_spark.io import export_sourmash_envelope, read_sourmash_envelope

    params = SketchParams()
    sketches, _ = sketch_stage(pages_df, params)
    sketches = sketches.persist()
    path = str(tmp_path / "env")
    export_sourmash_envelope(sketches, params, path)
    back = read_sourmash_envelope(spark, path, expected=params)
    a = {r["url"]: list(r["sketch"]) for r in sketches.collect()}
    b = {r["url"]: list(r["sketch"]) for r in back.collect()}
    assert a == b

    fn = [str(p) for p in (tmp_path / "env").glob("part-*.txt")][0]
    records = json.loads(open(fn).read())
    assert isinstance(records, list) and records
    rec = records[0]
    assert rec["class"] == "sourmash_signature"
    sig = rec["signatures"][0]
    assert sig["ksize"] == params.k and sig["max_hash"] == params.max_hash
    assert all(m >= 0 for m in sig["mins"])
    md5 = hashlib.md5(str(params.k).encode())
    for m in sig["mins"]:
        md5.update(str(m).encode())
    assert sig["md5sum"] == md5.hexdigest()


def test_sourmash_config_mismatch(spark, pages_df, tmp_path):
    params = SketchParams()
    sketches, _ = sketch_stage(pages_df, params)
    path = str(tmp_path / "sigs2")
    export_sourmash_json(sketches.limit(5), params, path)
    with pytest.raises(ValueError, match="does not match expected"):
        read_sourmash_json(spark, path, expected=params.with_(k=9))


def test_merge_sketches_matches_oracle(spark):
    params = SketchParams(fscale=4, nmax=None)
    texts = {
        "d1": "alpha beta gamma delta epsilon zeta eta theta " * 20,
        "d2": "iota kappa lambda mu nu xi omicron pi rho sigma " * 20,
    }
    df = spark.createDataFrame(
        [(k, v, "g") for k, v in texts.items()], ["url", "text", "grp"]
    )
    sketches, _ = sketch_stage(df, params, dedup_exact_first=False)
    merged = merge_sketches(
        sketches.join(df.select("url", "grp"), "url"), "grp", params
    ).collect()[0]
    o1 = set(O.sketch_text(texts["d1"], params).hashes)
    o2 = set(O.sketch_text(texts["d2"], params).hashes)
    got = set(np.asarray(merged["sketch"], dtype=np.int64).view(np.uint64).tolist())
    assert got == (o1 | o2)
    assert merged["n_members"] == 2


def test_all_pairs_compare_matches_oracle(spark, corpus_pages, pages_df):
    """C4 exhaustive mode == oracle all-pairs, including the reverse flag."""
    params = SketchParams(scorer="allpairs", cutoff=30.0)
    sub = pages_df.limit(60).cache()
    sketches, _ = sketch_stage(sub, params, dedup_exact_first=False)
    got = {
        (r["id_a"], r["id_b"]): r for r in all_pairs_compare(sketches, params).collect()
    }
    urls = {r["url"] for r in sub.select("url").collect()}
    o_sketches = [
        O.sketch_text(p.text, params, name=p.url)
        for p in corpus_pages
        if p.url in urls
    ]
    want = O.all_pairs(o_sketches, params)
    assert set(got) == {(a, b) for a, b, *_ in want}
    for a, b, c, nk, s in want:
        r = got[(a, b)]
        assert (r["num_common"], r["num_kmers"]) == (c, nk)
        assert r["similarity"] == pytest.approx(s)


def test_write_pairs_tsv(spark, tmp_path):
    pairs = spark.createDataFrame(
        [
            ("a", "b", 3, 4, 75.0, False),
            ("c", "d", 9, 10, 90.0, True),
        ],
        ["id_a", "id_b", "num_common", "num_kmers", "similarity", "reverse"],
    )
    path = str(tmp_path / "tsv")
    write_pairs_tsv(pairs, path)
    import glob

    rows = []
    for p in glob.glob(f"{path}/part-*.csv"):
        rows.extend(open(p).read().strip().splitlines())
    header, *data = rows
    assert header.split("\t") == [
        "from", "to", "num_common", "num_kmers", "estimated_containment"
    ]
    # reference Display restores the original comparison order on reverse
    # rows (src/compare.rs:40-62): names always print as (id_a, id_b);
    # sort is score-desc
    assert data[0].split("\t")[:2] == ["c", "d"]
    assert data[1].split("\t")[:2] == ["a", "b"]


def test_read_sourmash_envelope_reference_format(spark, tmp_path):
    """A fixture file in the REFERENCE's nested sourmash envelope shape
    (src/signature.rs:15-103: array of records, each with a signatures
    list of {mins, ksize, max_hash} MinHash objects) must parse."""
    import json as _json

    from jam_spark.io import read_sourmash_envelope
    from jam_spark.params import SketchParams

    params = SketchParams(k=5, fscale=8)
    envelope = [
        {
            "class": "sourmash_signature",
            "email": "",
            "hash_function": "0.murmur64",
            "filename": "doc_a.txt",
            "name": "doc_a",
            "license": "CC0",
            "version": 0.4,
            "signatures": [
                {
                    "num": 0,
                    "ksize": 5,
                    "seed": 42,
                    "max_hash": params.max_hash,
                    "md5sum": "d41d8cd98f00b204e9800998ecf8427e",
                    "molecule": "dna",
                    "mins": [3, 1 << 62, (1 << 63) + 5],
                }
            ],
        },
        {
            "class": "sourmash_signature",
            "filename": "doc_b.txt",
            "signatures": [
                {"ksize": 5, "max_hash": params.max_hash, "mins": [7, 9]}
            ],
        },
    ]
    p = tmp_path / "sigs"
    p.mkdir()
    (p / "sig1.json").write_text(_json.dumps(envelope))
    got = {
        r["url"]: [h & (2**64 - 1) for h in r["sketch"]]
        for r in read_sourmash_envelope(
            spark, str(p), expected=params
        ).collect()
    }
    # the reference names sketches by filename (src/signature.rs:57-62)
    assert got == {
        "doc_a.txt": [3, 1 << 62, (1 << 63) + 5],
        "doc_b.txt": [7, 9],
    }

    # config mismatch refused, mirroring src/signature.rs:41-55
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not match expected"):
        read_sourmash_envelope(spark, str(p), expected=SketchParams(k=7))
