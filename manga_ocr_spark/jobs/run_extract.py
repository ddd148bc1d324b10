"""spark-submit entrypoint for the extraction job.

Cluster usage (the 100 TB deployment shape; SURVEY.md §7.1 step 8):

    python tools/make_pyfiles.py                      # builds dist/manga_ocr_spark.zip
    spark-submit --py-files dist/manga_ocr_spark.zip \
        manga_ocr_spark/jobs/run_extract.py \
        --input  <pages parquet/iceberg path> \
        --output <out dir>  --buckets 2048 --salt 4096

Local smoke (what the sandbox runs):

    spark-submit --master 'local[8]' --py-files dist/manga_ocr_spark.zip \
        manga_ocr_spark/jobs/run_extract.py --input ... --output ...

Resume semantics: rerunning with the same --output skips every bucket
that already has an ok lineage row (ExtractJob, jobs/extract.py).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description="main-content extraction over a pages table")
    p.add_argument("--input", required=True, help="pages parquet dir (url, warc_ts, html, text, lang)")
    p.add_argument("--output", required=True, help="output dir (extracted/ metrics/ lineage/)")
    p.add_argument("--buckets", type=int, default=16, help="commit/resume buckets (2048 at scale)")
    p.add_argument("--commit-group", type=int, default=8, help="buckets per lineage commit")
    p.add_argument("--salt", type=int, default=None, help="salted repartition width (skewed hosts)")
    p.add_argument("--master", default=None, help="override master (defaults to spark-submit's)")
    args = p.parse_args()

    # inside spark-submit the session already exists; standalone, build one
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is None:
        from manga_ocr_spark.jobs.session import get_spark

        spark = get_spark(master=args.master)
    else:
        spark = active

    from manga_ocr_spark.jobs.extract import ExtractJob

    pages = spark.read.parquet(args.input)
    job = ExtractJob(
        spark,
        args.output,
        num_buckets=args.buckets,
        commit_group_size=args.commit_group,
        salt_partitions=args.salt,
    )
    committed = job.run(pages)
    out = {
        "committed_buckets": committed,
        "extracted_rows": spark.read.parquet(f"{args.output}/extracted").count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
