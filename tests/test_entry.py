"""Smoke tests of the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_entry_runs_and_extracts(spark):
    df = entrymod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert {"url", "extracted_text"}.issubset(set(df.columns))
    # the flagship query extracts real text for content pages
    assert sum(1 for r in rows if r.extracted_text) > 0


def test_every_query_has_known_oracle_status():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    # the driver records at most 50 correctness rows — stay at the cap
    assert len(qs) == 50
    # every oracle key refers to a real query
    assert oracles <= qs
    # rows-only queries are the documented non-SQL-expressible set
    assert qs - oracles == {
        "ann_lsh_topk",
        "ann_ivf_topk",
    }


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_sampled_queries_run(spark):
    qs = entrymod.queries()
    for name in ("q1_pricing_summary", "dedup_exact_keep", "cosine_topk", "token_stats"):
        out = qs[name](spark, SF_DIR)
        assert out.count() > 0, name


def test_grouped_stats_matches_duckdb_on_null_text(spark, monkeypatch):
    # self-review r3 finding: the pandas tokenizer must not crash on NULL
    # text — it must propagate None exactly like the SQL side (avg skips
    # NULLs, count(*) does not), pinned by running the REAL oracle SQL in
    # DuckDB over the same null-bearing rows
    import duckdb

    import __spark_entry__ as E

    rows = [("s0", "a b c"), ("s0", None), ("s1", "x  y"), ("s1", " pad "), ("s2", None)]
    df = spark.createDataFrame(rows, "source string, text string")
    monkeypatch.setattr(E, "_t", lambda sp, d, n: df)
    got = {r.source: r for r in E._q_grouped_stats(spark, "ignored").collect()}

    con = duckdb.connect()
    con.execute("create table documents(source varchar, text varchar)")
    con.executemany("insert into documents values (?, ?)", rows)
    want = {r[0]: r for r in con.execute(E.oracle_sql()["grouped_stats_applyinpandas"]).fetchall()}

    assert set(got) == set(want)
    for src in got:
        assert got[src].n == want[src][1], src
        for i, col in ((2, "avg_len"), (3, "avg_tokens")):
            g, w = getattr(got[src], col), want[src][i]
            if w is None:
                import math

                assert g is None or math.isnan(g), (src, col, g)
            else:
                assert abs(g - w) < 1e-9, (src, col, g, w)
