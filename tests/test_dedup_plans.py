"""Plan-shape + oracle-robustness tests for the SQL-checkable dedup ops:

- exact_dedup_members must be an AQE-splittable join, not a window over
  the text fingerprint (a hot fingerprint = one straggler task at scale);
- the substring_dup_spans DuckDB oracle must not truncate long docs (the
  old oracle hardcoded a 20k-token unnest bound).
"""

import duckdb
import pandas as pd
from pyspark.sql import functions as F


def test_exact_dedup_members_plan_is_join_not_window(spark):
    from jam_spark.ops.dedup import exact_dedup_members

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "a", "b"]})
    )
    out = exact_dedup_members(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Join" in plan or "HashJoin" in plan, plan
    rows = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    assert rows == {1: 1, 2: 1, 3: 3}


def _parity(spark, docs_pdf, spark_fn, sql, sort_cols):
    sdf = spark_fn(spark.createDataFrame(docs_pdf))
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    rel = con.sql(sql)
    idx = [rel.columns.index(c) for c in sdf.columns]
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
    assert srows == drows


def test_substring_oracle_handles_long_docs(spark):
    """A >20k-token doc must produce identical spans in Spark and the
    DuckDB oracle (the old oracle's fixed 20001 unnest bound silently
    truncated the tail of long docs — oracle-only wrong rows)."""
    from jam_spark.ops.dedup import substring_dup_spans, substring_dup_spans_sql

    dup_block = " ".join(f"dup{i}" for i in range(25))
    # 21000 tokens of unique filler, duplicated 25-token block planted at
    # the START and at the very END (past the old 20k bound) of doc 1,
    # and once in doc 2
    filler = " ".join(f"w{i}" for i in range(21000))
    doc1 = f"{dup_block} {filler} {dup_block}"
    doc2 = f"{dup_block} unrelated tail tokens here"
    docs = pd.DataFrame({"doc_id": [1, 2], "text": [doc1, doc2]})
    _parity(
        spark,
        docs,
        substring_dup_spans,
        substring_dup_spans_sql(),
        ["doc_id", "span_start"],
    )
    # sanity: the tail occurrence (token position > 20000) is present
    spans = substring_dup_spans(spark.createDataFrame(docs)).collect()
    assert any(r["doc_id"] == 1 and r["span_start"] > 20000 for r in spans)


def test_exact_dedup_members_oracle_parity(spark):
    from jam_spark.ops.dedup import exact_dedup_members, exact_dedup_members_sql

    docs = pd.DataFrame(
        {"doc_id": [5, 1, 9, 2], "text": ["x", "x", "y", "x"]}
    )
    _parity(
        spark, docs, exact_dedup_members, exact_dedup_members_sql(), ["doc_id"]
    )


def test_exact_dedup_members_null_text_not_dropped(spark):
    """Null-text docs must appear in the output (grouped together under
    the sentinel key), not vanish through a null-vs-null equi-join —
    and Spark must agree with the DuckDB oracle on them."""
    from jam_spark.ops.dedup import exact_dedup_members, exact_dedup_members_sql

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [None, None, "x", "x"]}
    )
    out = exact_dedup_members(spark.createDataFrame(docs))
    rows = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    assert rows == {1: 1, 2: 1, 3: 3, 4: 3}
    _parity(
        spark, docs, exact_dedup_members, exact_dedup_members_sql(), ["doc_id"]
    )


def test_gram_postings_materialized_once(spark):
    """The r6 optimization: the exploded gram/fingerprint postings frame
    is persisted once per query — every Generate (explode) and every
    winnow pass must live INSIDE the cached subtree, never re-planned
    per consumer (the round-5 plans re-ran the scan+explode up to 8x:
    plans/r06/*_before.txt). The cached frame is hash-partitioned on
    the join key: colocation collapses the hot-key partial aggregate,
    and plans built after materialization (later actions) inherit the
    partitioning exchange-free."""
    import pandas as pd

    from jam_spark._persist import release_all
    from jam_spark.ops.dedup import (
        decontaminate,
        ngram_jaccard_pairs,
        winnow_dup_pairs,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(40)),
                "text": [
                    f"alpha beta gamma delta epsilon zeta eta theta doc{i} "
                    f"iota kappa lambda mu nu xi omicron pi rho{i % 5}"
                    for i in range(40)
                ],
            }
        )
    )
    try:
        for fn in (ngram_jaccard_pairs, winnow_dup_pairs, decontaminate):
            plan = fn(docs)._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan, plan
            # every explode lives inside the cached plan: the first
            # Generate in the plan string must appear only after the
            # first InMemoryRelation marker
            if "Generate" in plan:
                assert plan.index("Generate") > plan.index(
                    "InMemoryRelation"
                ), f"{fn.__name__}: explode re-planned outside the cache"
    finally:
        release_all()
