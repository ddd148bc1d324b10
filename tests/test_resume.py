"""Checkpoint-resume tests of ExtractJob (jobs/extract.py).

The reference's daemon keys seen work by (path, mtime) and skips it on the
next poll (/root/reference/manga_ocr/run.py:197-206). ExtractJob makes that
restart-safe: lineage rows name committed buckets; a rerun processes only
the rest. A kill between commit groups loses at most the in-flight group.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manga_ocr_spark.jobs.extract import ExtractJob


def test_full_run_commits_all_buckets(spark, pages_df, tmp_path):
    job = ExtractJob(spark, str(tmp_path / "out"), num_buckets=8, commit_group_size=4)
    committed = job.run(pages_df)
    assert sorted(committed) == list(range(8))
    lineage = spark.read.parquet(f"{tmp_path}/out/lineage")
    assert lineage.filter(F.col("status") == "ok").count() == 8
    extracted = spark.read.parquet(f"{tmp_path}/out/extracted")
    assert extracted.count() == pages_df.count()
    # no url appears twice
    assert extracted.groupBy("url").count().filter("count > 1").count() == 0


def test_killed_run_resumes_without_duplicates(spark, pages_df, tmp_path):
    out = str(tmp_path / "out")
    job = ExtractJob(spark, out, num_buckets=8, commit_group_size=3)

    # simulated kill: only the first commit group (3 buckets) lands
    first = job.run(pages_df, max_groups=1)
    assert len(first) == 3
    partial = spark.read.parquet(f"{out}/extracted").count()
    assert 0 < partial < pages_df.count()

    # resume: a fresh job object (fresh process semantics) finishes the rest
    job2 = ExtractJob(spark, out, num_buckets=8, commit_group_size=3)
    second = job2.run(pages_df)
    assert sorted(first + second) == list(range(8))
    assert set(first).isdisjoint(second)

    extracted = spark.read.parquet(f"{out}/extracted")
    assert extracted.count() == pages_df.count()
    assert extracted.groupBy("url").count().filter("count > 1").count() == 0

    # a third run is a no-op (idempotent)
    assert ExtractJob(spark, out, num_buckets=8).run(pages_df) == []
    assert spark.read.parquet(f"{out}/extracted").count() == pages_df.count()


def test_metrics_written_per_bucket_lang(spark, pages_df, tmp_path):
    out = str(tmp_path / "out")
    ExtractJob(spark, out, num_buckets=4, commit_group_size=4).run(pages_df)
    metrics = spark.read.parquet(f"{out}/metrics")
    assert set(metrics.columns) == {
        "lang", "blocks_kept", "blocks_dropped", "count", "partition_id"
    }
    # metrics row-count totals match input
    total = metrics.agg(F.sum("count")).collect()[0][0]
    assert total == pages_df.count()
    # lineage byte accounting matches the input payload sizes
    lineage = spark.read.parquet(f"{out}/lineage")
    bytes_total = lineage.agg(F.sum("bytes_in")).collect()[0][0]
    expected = pages_df.select(F.sum(F.length("html"))).collect()[0][0]
    assert bytes_total == expected


def test_stats_scan_never_reads_text(spark, pages_df, tmp_path):
    # metrics/lineage derive from a pruned re-read of the committed
    # parquet: the scan's ReadSchema must exclude extracted_text (at
    # 100 TB that column IS the table) and prune partitions on bucket
    out = str(tmp_path / "out")
    job = ExtractJob(spark, out, num_buckets=4, commit_group_size=4)
    job.run(pages_df)
    plan = job.stats_scan([0, 1])._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "extracted_text" not in read_schema
    assert "n_blocks_kept" in read_schema
    assert "PartitionFilters: [" in plan


def test_mid_group_kill_overwrite_is_idempotent(spark, pages_df, tmp_path):
    # simulate a kill AFTER the extracted write but BEFORE the lineage
    # commit: the bucket's parquet files exist with no lineage row — the
    # rerun must OVERWRITE them (dynamic partition overwrite), not append
    out = str(tmp_path / "out")
    job = ExtractJob(spark, out, num_buckets=4, commit_group_size=4)
    from manga_ocr_spark.jobs.extract import extract_pages, with_bucket

    bucketed = with_bucket(pages_df, 4)
    # partial write of bucket partitions, no lineage (the "killed" state) —
    # same per-write option the job itself uses (never a session conf)
    with_bucket(extract_pages(bucketed.filter(F.col("bucket").isin([0, 1]))), 4).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy("bucket").parquet(
        f"{out}/extracted"
    )
    # full rerun sees no lineage -> reprocesses everything
    committed = job.run(pages_df)
    assert sorted(committed) == [0, 1, 2, 3]
    ext = spark.read.parquet(f"{out}/extracted")
    assert ext.count() == pages_df.count()
    assert ext.groupBy("url").count().filter("count > 1").count() == 0


def test_day_bucket_partition_layout(spark, pages_df, tmp_path):
    # north-rule layout: (days(warc_ts), bucket(url)) — time pruning for
    # incremental readers, stable buckets for resume
    import glob

    out = str(tmp_path / "out")
    ExtractJob(
        spark, out, num_buckets=4, commit_group_size=4, partition_by_day=True
    ).run(pages_df)
    dirs = glob.glob(f"{out}/extracted/dt=*/bucket=*")
    assert dirs, "expected dt=*/bucket=* partition directories"
    ext = spark.read.parquet(f"{out}/extracted")
    assert ext.count() == pages_df.count()
    # partition pruning: a single-day read scans only that day's directory
    one_day = spark.read.parquet(f"{out}/extracted").filter("dt = '2024-03-01'")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_committed_buckets_missing_vs_corrupt_lineage(spark, tmp_path):
    # the resume correctness boundary: ONLY a missing lineage dir means
    # "nothing committed"; an unreadable lineage dir must raise instead of
    # silently answering set() (which would recompute/overwrite everything)
    import pytest

    out = str(tmp_path / "out")
    job = ExtractJob(spark, out, num_buckets=4)
    assert job.committed_buckets() == set()  # fresh start: dir absent

    corrupt = tmp_path / "out" / "lineage"
    corrupt.mkdir(parents=True)
    (corrupt / "part-00000.parquet").write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception):
        job.committed_buckets()


def test_committed_buckets_empty_lineage_dir_is_fresh_start(spark, tmp_path):
    # second review cycle: a kill during the very FIRST lineage write can
    # leave an empty dir (or only committer markers) — provably nothing
    # committed, must NOT abort the rerun (UNABLE_TO_INFER_SCHEMA), while
    # a dir with an unreadable DATA file must still raise
    out = str(tmp_path / "out")
    lineage = tmp_path / "out" / "lineage"
    lineage.mkdir(parents=True)
    job = ExtractJob(spark, out, num_buckets=4)
    assert job.committed_buckets() == set()  # empty dir
    (lineage / "_temporary").mkdir()
    (lineage / "_SUCCESS").write_bytes(b"")
    assert job.committed_buckets() == set()  # committer markers only


def test_committed_buckets_ignores_inflight_committer_files(spark, tmp_path):
    # second review cycle (repro'd): a kill during the first lineage write
    # leaves lineage/_temporary/.../part-*.parquet — the file is invisible
    # to Spark's reader (hidden ancestor dir), so it must not count as
    # committed data; a VISIBLE unreadable part file must still raise.
    import pytest

    out = str(tmp_path / "out")
    attempt = tmp_path / "out" / "lineage" / "_temporary" / "0" / "_temporary" / "attempt_1"
    attempt.mkdir(parents=True)
    (attempt / "part-00000-abc.snappy.parquet").write_bytes(b"in-flight bytes")
    job = ExtractJob(spark, out, num_buckets=4)
    assert job.committed_buckets() == set()

    (tmp_path / "out" / "lineage" / "part-00001-def.snappy.parquet").write_bytes(
        b"visible but corrupt"
    )
    with pytest.raises(Exception):
        job.committed_buckets()
