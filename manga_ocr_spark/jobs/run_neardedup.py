"""spark-submit entrypoint for the near-dedup job.

Cluster usage (the 100 TB deployment shape):

    python tools/make_pyfiles.py                      # builds dist/manga_ocr_spark.zip
    spark-submit --py-files dist/manga_ocr_spark.zip \
        manga_ocr_spark/jobs/run_neardedup.py \
        --input  <documents parquet path> \
        --output <out dir>  --jaccard 0.9 --max-bucket 64

Local smoke:

    spark-submit --master 'local[8]' --py-files dist/manga_ocr_spark.zip \
        manga_ocr_spark/jobs/run_neardedup.py --input ... --output ...

Writes ``<output>/keep`` (surviving doc_ids) and ``<output>/metrics``
(docs_in/kept/dropped counters + per-band capped_buckets /
capped_bucket_rows — the guard's recall-loss side channel; see
jobs/neardedup.py). The printed JSON line surfaces the counters plus
whether the hot-bucket cap fired anywhere, the alert predicate a
pipeline scheduler should page on.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description="guarded near-duplicate removal over a documents table")
    p.add_argument("--input", required=True, help="documents parquet dir (doc_id, text, ...)")
    p.add_argument("--output", required=True, help="output dir (keep/ metrics/)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--jaccard", type=float, default=0.9, help="verification threshold")
    p.add_argument(
        "--max-bucket", type=int, default=None,
        help="hot-bucket cap (default operators.dedup.LSH_MAX_BUCKET)"
    )
    p.add_argument("--master", default=None, help="override master (defaults to spark-submit's)")
    args = p.parse_args()

    from pyspark.sql import SparkSession, functions as F

    active = SparkSession.getActiveSession()
    if active is None:
        from manga_ocr_spark.jobs.session import get_spark

        spark = get_spark(master=args.master)
    else:
        spark = active

    from manga_ocr_spark.operators.dedup import LSH_MAX_BUCKET
    from manga_ocr_spark.jobs.neardedup import run_neardedup

    docs = spark.read.parquet(args.input)
    counters = run_neardedup(
        spark,
        docs,
        args.output,
        text_col=args.text_col,
        jaccard_threshold=args.jaccard,
        max_bucket_size=args.max_bucket if args.max_bucket is not None else LSH_MAX_BUCKET,
    )
    capped = (
        spark.read.parquet(f"{args.output}/metrics")
        .filter(F.col("metric") == "capped_buckets")
        .count()
    )
    print(json.dumps({**counters, "cap_fired": capped > 0}))


if __name__ == "__main__":
    main()
