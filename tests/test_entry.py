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


@pytest.mark.parametrize("name", ["token_counts", "exact_dedup_groups", "lang_id"])
def test_sampled_parity_vs_duckdb(spark, name):
    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
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
