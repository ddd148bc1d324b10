#!/usr/bin/env python
"""Dump .explain('formatted') for every headline bench query to
plans/r07/<query>_<tag>.txt (tag = before|after, argv[1]).

Builds the SAME dataframes as bench.py::_headline_queries (the shapes the
driver times), at $SPARK_GRAFT_SF_DIR (default sf0.1). Eager
localCheckpoints inside the guarded tiers run at build time — that is the
production plan shape; the dumped plan is what the timed query executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ONLY = set(sys.argv[2:])  # optional query-name filter


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from manga_ocr_spark.jobs.session import get_spark
    from manga_ocr_spark.operators import dedup as D
    from manga_ocr_spark.operators import similarity as S
    from manga_ocr_spark.operators import text as T

    spark = get_spark(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(CPUS)

    qs = {
        "q1_pricing_summary": lambda: E._q1_pricing(spark, SF_DIR),
        "q3_top_revenue": lambda: E._q3_top_revenue(spark, SF_DIR),
        "q5_region_revenue": lambda: E._q5_region_revenue(spark, SF_DIR),
        "window_rank_orders": lambda: E._q_window_rank(spark, SF_DIR),
        "events_hourly": lambda: E._q_events_hourly(spark, SF_DIR),
        "dedup_exact_keep": lambda: D.exact_dedup(docs),
        "minhash_candidate_pairs": lambda: D.expand_rep_pairs(
            *D.lsh_guarded_candidates(docs, max_bucket_size=D.LSH_MAX_BUCKET)
        ),
        "simhash_docs": lambda: D.simhash64(docs),
        "simhash_candidate_pairs": lambda: D.expand_rep_pairs(
            *D.simhash_guarded_candidates(docs, max_bucket_size=D.LSH_MAX_BUCKET),
            carry={"hamming": F.lit(0)},
        ),
        "cosine_topk": lambda: S.cosine_topk(emb.filter(F.col("vec_id") < 20), emb, k=10),
        "ann_lsh_topk": lambda: S.lsh_bucket_topk(
            emb.filter(F.col("vec_id") < 20), emb, k=10, dim=64, bits=4, bands=16
        ),
        "token_stats": lambda: E._q_token_stats(spark, SF_DIR),
        "quality_scores": lambda: T.quality_panel(docs),
        "lang_id": lambda: T.lang_id_frame(docs),
        "media_meta": lambda: E._q_media_meta(spark, SF_DIR),
        # the extraction job's plan over bench-shaped pages (no staging):
        "extract_80k_pages": lambda: __import__(
            "manga_ocr_spark.jobs.extract", fromlist=["extract_pages"]
        ).extract_pages(
            __import__("bench").__dict__["_fanned_pages"](spark, SF_DIR, 16)
        ),
    }
    out_dir = REPO / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, build in qs.items():
        if ONLY and name not in ONLY:
            continue
        df = build()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{TAG}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{TAG}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
