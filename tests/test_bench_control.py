"""The scaling capture's host-ceiling control (bench.py) claims to feed
the pure extraction core THE SAME page HTML the engine legs extract —
that byte-identity is what makes its throughput a ceiling for the engine
rather than a different workload. Pin it against the real Spark path."""

from __future__ import annotations

from pyspark.sql import functions as F

import bench
from manga_ocr_spark.jobs.pages_from_docs import pages_from_documents

SF_DIR = "/root/testdata/sf0.001"


def test_control_payloads_byte_identical_to_engine_pages(spark):
    paras, fanout = 3, 2
    got = bench._control_payloads(paras, fanout=fanout, sf_dir=SF_DIR)

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.lit(fanout - 1))))
        .select(
            (F.col("doc_id") * fanout + F.col("copy")).alias("doc_id"),
            F.concat_ws(" ", F.array_repeat(F.col("text"), paras)).alias("text"),
            F.col("lang"),
        )
    )
    rows = pages_from_documents(docs).select("url", "html").collect()
    # order-insensitive: the control builds in pyarrow scan order, the
    # engine in Spark partition order
    assert sorted(got) == sorted(bytes(r.html) for r in rows)
    assert len(got) == 500 * fanout
