"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are consistent, and a sampled parity check vs DuckDB."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "cluster_id"}
    # every doc got a cluster; ids are stable longs
    assert all(r["cluster_id"] is not None for r in rows)


def test_queries_oracle_keys_consistent():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    # the SQL-expressible surface is the majority
    assert len(o) >= 10
    assert len(q) >= 14


def test_all_queries_smoke(spark):
    """Every queries() entry runs at sf0.001 and returns a well-formed
    DataFrame (what the driver's t1 smoke exercises per query)."""
    sf_dir = "/root/testdata/sf0.001"
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        rows = df.limit(5).collect()
        assert df.columns, name
        assert rows is not None, name


def test_no_lingering_persisted_rdds(spark):
    """Operators route persists through jam_spark._persist.track;
    release_all() after materializing a query must leave ZERO persisted
    RDDs in the session (long-lived-session hygiene)."""
    from jam_spark._persist import release_all

    def persisted_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    release_all()  # drop anything earlier tests left through the registry
    before = persisted_ids()
    sf_dir = "/root/testdata/sf0.001"
    qs = E.queries()
    for name in ("minhash_pairs", "ann_lsh_topk", "minhash_clusters"):
        qs[name](spark, sf_dir).collect()
    freed = release_all()
    assert freed > 0  # the persists actually went through the registry
    # nothing NEW lingers (fixture caches from other tests are theirs)
    assert persisted_ids() <= before, persisted_ids() - before


@pytest.mark.parametrize(
    "name",
    [
        "token_counts",
        "exact_dedup_groups",
        "exact_dedup_members",
        "lang_id",
        "media_features",
        "cosine_topk_fast",
    ],
)
def test_sampled_parity_vs_duckdb(spark, name):
    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    sdf = E.queries()[name](spark, sf_dir)
    srows = sorted(
        [tuple(r) for r in sdf.collect()], key=lambda t: tuple(str(x) for x in t)
    )
    rel = con.sql(E.oracle_sql()[name])
    assert sorted(sdf.columns) == sorted(rel.columns)
    # reorder duckdb columns to spark order
    idx = [rel.columns.index(c) for c in sdf.columns]
    drows = sorted(
        [tuple(r[i] for i in idx) for r in rel.fetchall()],
        key=lambda t: tuple(str(x) for x in t),
    )
    assert srows == drows
