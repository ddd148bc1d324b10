"""Tests of extraction-quality metrics (operators/metrics.py) — the
reference's exact-match + CER pair (training/metrics.py:54-81)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from manga_ocr_spark.operators.metrics import eval_extraction


def test_perfect_predictions(spark):
    ext = spark.createDataFrame([Row(url="u1", extracted_text="abc"), Row(url="u2", extracted_text="defg")])
    gold = spark.createDataFrame([Row(url="u1", expected_text="abc"), Row(url="u2", expected_text="defg")])
    r = eval_extraction(ext, gold).collect()[0]
    assert r.n == 2
    assert r.exact_match_rate == 1.0
    assert r.cer == 0.0


def test_mixed_predictions_corpus_cer(spark):
    # u1 exact; u2 one edit over 4 chars -> corpus CER = 1 / (3+4)
    ext = spark.createDataFrame([Row(url="u1", extracted_text="abc"), Row(url="u2", extracted_text="dxfg")])
    gold = spark.createDataFrame([Row(url="u1", expected_text="abc"), Row(url="u2", expected_text="defg")])
    r = eval_extraction(ext, gold).collect()[0]
    assert r.exact_match_rate == 0.5
    assert r.cer == pytest.approx(1 / 7, abs=1e-6)


def test_null_prediction_counts_as_full_error(spark):
    ext = spark.createDataFrame(
        [("u1", None)], "url string, extracted_text string"
    )
    gold = spark.createDataFrame([Row(url="u1", expected_text="abcd")])
    r = eval_extraction(ext, gold).collect()[0]
    assert r.n == 1
    assert r.exact_match_rate == 0.0
    assert r.cer == 1.0  # 4 edits / 4 chars


def test_join_is_inner_on_key(spark):
    ext = spark.createDataFrame([Row(url="u1", extracted_text="a"), Row(url="zz", extracted_text="b")])
    gold = spark.createDataFrame([Row(url="u1", expected_text="a")])
    assert eval_extraction(ext, gold).collect()[0].n == 1
