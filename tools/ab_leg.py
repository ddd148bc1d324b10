"""One-off: interleaved A/B of full-extract leg variants at a given core
count. Stages the fanned corpus once per staging dir, then cycles variants
round-robin (guards against slow host drift). Prints one JSON line."""

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
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def main():
    spark = get_spark(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    tmp_disk = tempfile.mkdtemp(prefix="ableg_", dir="/tmp")
    tmp_shm = tempfile.mkdtemp(prefix="ableg_", dir="/dev/shm")
    try:
        src = bench._fanned_pages(spark, bench.SF_DIR, FANOUT, paras=PARAS).repartition(
            CPUS * 8
        )
        src.write.mode("overwrite").parquet(tmp_disk)
        shutil.copytree(tmp_disk, tmp_shm, dirs_exist_ok=True)
        pages_disk = spark.read.parquet(tmp_disk)
        pages_shm = spark.read.parquet(tmp_shm)
        n = pages_disk.count()

        def run(pages, batch):
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
            t0 = time.time()
            bench._force(extract_pages(pages))
            return round(time.time() - t0, 2)

        variants = {
            "disk_b1024": lambda: run(pages_disk, 1024),
            "shm_b1024": lambda: run(pages_shm, 1024),
            "disk_b256": lambda: run(pages_disk, 256),
            "disk_b128": lambda: run(pages_disk, 128),
        }
        # warmup
        run(pages_disk, 1024)
        res = {k: [] for k in variants}
        for _ in range(ROUNDS):
            for k, fn in variants.items():
                res[k].append(fn())
        print(json.dumps({"cpus": CPUS, "docs": n, "samples": res}))
    finally:
        shutil.rmtree(tmp_disk, ignore_errors=True)
        shutil.rmtree(tmp_shm, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
