"""CLI smoke test (M2, ref src/cli.rs:46-116): drive the real entry
point as a subprocess — sketch -> pairs -> cluster -> stats over a tiny
corpus, resuming from the same checkpoint root at each step."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "jam_spark.cli", *args],
        cwd=REPO, text=True, capture_output=True, timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_sketch_pairs_cluster_stats(tmp_path):
    from jam_spark.corpus import generate_pages, pages_to_pandas

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pages_to_pandas(generate_pages(n_docs=60, seed=3))
    inp = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf[["url", "text", "lang"]]), inp
    )
    root = str(tmp_path / "ck")

    out = _run("sketch", "--input", inp, "--root", root, "--cores", "4")
    assert out["stage"] == "sketches" and out["rows"] > 0

    out = _run("pairs", "--root", root, "--cores", "4")
    assert out["stage"] == "pairs" and out["rows"] >= 0

    out = _run("cluster", "--root", root, "--cores", "4")
    assert out["stage"] == "clusters" and out["rows"] == len(pdf)

    st = _run("stats", "--root", root, "--cores", "4")
    assert st["n_pages"] == len(pdf)
    assert st["n_clusters"] <= st["n_sketches"] <= len(pdf)

    # the default algorithm is explicitly acceptable on the CLI
    out = _run(
        "run", "--input", inp, "--root", str(tmp_path / "ck2"),
        "--algorithm", "xxh64", "--cores", "4",
    )
    assert out["stage"] == "clusters" and out["rows"] == len(pdf)


def test_cli_ingest_drains_landing_zone(tmp_path):
    from jam_spark.corpus import generate_pages, pages_to_pandas

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pages_to_pandas(generate_pages(n_docs=60, seed=3))
    landing = tmp_path / "landing"
    landing.mkdir()
    root = str(tmp_path / "ck_ingest")
    pq.write_table(
        pa.Table.from_pandas(pdf.iloc[:40][["url", "text"]]),
        str(landing / "day0.parquet"),
    )
    out = _run("ingest", "--landing", str(landing), "--root", root,
               "--cores", "4")
    assert out["stage"] == "ingest" and out["n_pages"] == 40

    # a second file lands; re-invoking processes exactly the delta
    pq.write_table(
        pa.Table.from_pandas(pdf.iloc[40:][["url", "text"]]),
        str(landing / "day1.parquet"),
    )
    out = _run("ingest", "--landing", str(landing), "--root", root,
               "--cores", "4")
    assert out["n_pages"] == len(pdf)


def test_cli_extract_and_from_html(tmp_path):
    """extract writes (url, text) recovering the stored text
    byte-identically; sketch --from-html clusters an html-only corpus."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jam_spark.corpus import generate_pages, pages_to_pandas

    pdf = pages_to_pandas(generate_pages(n_docs=60, seed=5))
    # Spark's parquet reader rejects pandas' nanosecond timestamps
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us, UTC]")
    inp = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), inp)

    outp = str(tmp_path / "text.parquet")
    out = _run("extract", "--input", inp, "--output", outp, "--cores", "4")
    assert out["stage"] == "extract" and out["rows"] == len(pdf)
    got = pq.read_table(outp).to_pandas().set_index("url")["text"]
    want = pdf.set_index("url")["text"]
    assert got.sort_index().equals(want.sort_index())

    # html-only corpus (text column dropped entirely) through the full run
    html_only = pdf.drop(columns=["text"])
    inp2 = str(tmp_path / "pages_html.parquet")
    pq.write_table(pa.Table.from_pandas(html_only), inp2)
    out = _run(
        "run", "--input", inp2, "--root", str(tmp_path / "ck"),
        "--from-html", "--cores", "4",
    )
    assert out["stage"] == "clusters" and out["rows"] == len(pdf)
