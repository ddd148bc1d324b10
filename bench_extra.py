#!/usr/bin/env python
"""Focused benchmark harness for optimization work (guide §1.4).

bench.py is FROZEN for driver measurement; this file exists so individual
queries can be re-timed in isolation during optimization without touching
it. Reuses bench.py's own query builders (same shapes the driver times),
noop-sink forcing, and quiet-gate probe.

Usage:
    python bench_extra.py [query ...]          # default: all headline queries
    BENCH_QUERY_RUNS=5 python bench_extra.py minhash_candidate_pairs

Prints one JSON line: {"queries": {name: med}, "spreads": {...}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import bench as B  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_headline_queries(spark, sf_dir: str, cpus: int) -> dict:
    """The headline query builders, ONE copy shared by bench_extra and
    tools/dump_plans_r07.py (bench.py keeps its own frozen copy — the
    driver contract; keep this dict in lockstep with it)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from manga_ocr_spark.operators import dedup as D
    from manga_ocr_spark.operators import similarity as S
    from manga_ocr_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(cpus)
    SF_DIR = sf_dir
    return {
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
    }


def main() -> None:
    only = set(sys.argv[1:])
    from manga_ocr_spark.jobs.session import get_spark

    gate_probe, gate_quiet = B._wait_quiet(
        int(os.environ.get("BENCH_HEADLINE_MAX_WAIT", "540")),
        float(os.environ.get("BENCH_QUIET_TP", "1.15")),
        quiet_load=float(os.environ.get("BENCH_QUIET_LOAD", "3.0")),
    )
    spark = get_spark(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    canary = B._noise_canary(spark)
    qs = build_headline_queries(spark, SF_DIR, CPUS)
    unknown = only - qs.keys()
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)} — valid: {sorted(qs)}")
    runs = int(os.environ.get("BENCH_QUERY_RUNS", "3"))
    times, spreads = {}, {}
    for name, build in qs.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for _ in range(runs):
            t0 = time.time()
            B._force(build())
            samples.append(time.time() - t0)
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)
        spreads[name] = {
            "min": round(samples[0], 3),
            "med": times[name],
            "max": round(samples[-1], 3),
        }
    print(
        json.dumps(
            {
                "queries": times,
                "spreads": spreads,
                "noise_canary": canary,
                "quiet_gate": {**gate_probe, "quiet": gate_quiet},
                "sf": B._sf_from_dir(SF_DIR),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
