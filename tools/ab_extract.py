#!/usr/bin/env python
"""One timed extraction leg with config overrides — for interleaved A/B of
Arrow-feed levers (staging codec, spark.buffer.size, Arrow batch size).

Mirrors bench.py::_timed_extract (stage fanned pages -> read back -> warm
-> best-of-N noop extract passes) but in a standalone process so each
variant gets a fresh JVM. Conf overrides come from $AB_CONF as
"k=v;k=v"; staging codec from $AB_STAGE_CODEC (default session default).

Prints one JSON line {"sec": best, "runs": [...], "docs": N}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FANOUT = int(os.environ.get("BENCH_EXTRACT_FANOUT", "16"))
RUNS = int(os.environ.get("AB_RUNS", "3"))
WARMS = int(os.environ.get("AB_WARMS", "3"))


def main() -> None:
    from manga_ocr_spark.jobs.extract import extract_pages
    from manga_ocr_spark.jobs.session import get_spark

    from bench import _fanned_pages, _force

    conf = {}
    for kv in os.environ.get("AB_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k] = v
    spark = get_spark(master=f"local[{CPUS}]", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    codec = os.environ.get("AB_STAGE_CODEC")
    if codec:
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
    salt = CPUS * 2
    tmp = tempfile.mkdtemp(prefix="ab_extract_")
    try:
        _fanned_pages(spark, SF_DIR, FANOUT).repartition(salt).write.mode(
            "overwrite"
        ).parquet(tmp)
        staged = sum(f.stat().st_size for f in Path(tmp).glob("*.parquet"))
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(max(4 << 20, staged // salt))
        )
        pages = spark.read.parquet(tmp)
        n_docs = pages.count()
        runs = []
        for i in range(WARMS + RUNS):
            t0 = time.time()
            _force(extract_pages(pages))
            runs.append(round(time.time() - t0, 3))
        timed = runs[WARMS:]
        print(
            json.dumps(
                {
                    "sec": min(timed),
                    "runs": runs,
                    "docs": n_docs,
                    "docs_per_sec": round(n_docs / min(timed), 1),
                    "staged_mb": round(staged / 1e6, 1),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
