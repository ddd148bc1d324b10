"""One-off: decompose the scaling leg's wall time at a given core count.

Stages the same fanned-page corpus as bench.py --extract-timing, then times
(a) JVM-only parquet scan (sum(length(html))), (b) Arrow roundtrip through a
no-op pandas iterator UDF with the same pruned columns as extract_pages,
(c) the full extract_pages. Prints one JSON line. Run under a quiet window.
"""

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from manga_ocr_spark.jobs.extract import extract_pages  # noqa: E402
from manga_ocr_spark.jobs.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
FANOUT = int(os.environ.get("BENCH_EXTRACT_FANOUT", "24"))
PARAS = int(os.environ.get("BENCH_EXTRACT_PARAS", "200"))
RUNS = int(os.environ.get("BENCH_EXTRACT_RUNS", "3"))


def timed(fn):
    out = []
    for _ in range(RUNS):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 2))
    return out


def main():
    from pyspark.sql import functions as F

    spark = get_spark(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="profleg_")
    try:
        bench._fanned_pages(spark, bench.SF_DIR, FANOUT, paras=PARAS).repartition(
            CPUS * 8
        ).write.mode("overwrite").parquet(tmp)
        pages = spark.read.parquet(tmp)
        n = pages.count()

        def scan_only():
            pages.select(F.sum(F.length("html"))).collect()

        def arrow_noop():
            import pandas as pd

            pruned = pages.select("url", "warc_ts", "html", "lang")

            def ident(it):
                for b in it:
                    yield pd.DataFrame({"n": [int(b["html"].str.len().sum())]})

            pruned.mapInPandas(ident, "n long").select(F.sum("n")).collect()

        def full():
            bench._force(extract_pages(pages))

        # warmups
        scan_only()
        arrow_noop()
        full()
        res = {
            "cpus": CPUS,
            "docs": n,
            "scan_only": timed(scan_only),
            "arrow_noop": timed(arrow_noop),
            "full_extract": timed(full),
        }
        print(json.dumps(res))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
