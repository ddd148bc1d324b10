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
