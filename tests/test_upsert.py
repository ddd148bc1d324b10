"""Upsert/MERGE semantics (jobs/upsert.py) — the reference reprocesses a
re-saved input (new mtime) and its output replaces the old one
(/root/reference/manga_ocr/run.py:107,204-206); merge_upsert gives the
table that semantic: re-ingesting a modified page leaves the reader seeing
exactly the new text, no duplicates, and rewrites only affected buckets."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row, functions as F

from manga_ocr_spark.jobs.upsert import latest_wins, merge_upsert


def _write_table(spark, path: str, rows, num_buckets: int = 4):
    df = spark.createDataFrame(rows, "url string, text string")
    df = df.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(num_buckets)).cast("int")
    )
    df.write.mode("overwrite").partitionBy("bucket").parquet(path)
    return df


def test_merge_replaces_matched_inserts_new(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_table(spark, path, [Row(url=f"u{i}", text=f"old{i}") for i in range(20)])

    updates = spark.createDataFrame(
        [Row(url="u3", text="NEW3"), Row(url="u7", text="NEW7"), Row(url="u99", text="ins99")]
    )
    rewritten = merge_upsert(spark, path, updates, key_cols=["url"], num_buckets=4)
    assert rewritten  # at least one bucket touched

    out = {r.url: r.text for r in spark.read.parquet(path).collect()}
    assert len(out) == 21  # 20 originals - 0 lost + 1 insert, no dups
    assert out["u3"] == "NEW3" and out["u7"] == "NEW7" and out["u99"] == "ins99"
    assert out["u0"] == "old0"  # untouched keys intact


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_table(spark, path, [Row(url=f"u{i}", text=f"old{i}") for i in range(40)])
    # find a key and note which buckets its update should NOT touch
    before = {
        b: sorted(os.path.getmtime(f) for f in glob.glob(f"{path}/bucket={b}/*.parquet"))
        for b in range(4)
    }
    updates = spark.createDataFrame([Row(url="u5", text="NEW5")])
    rewritten = merge_upsert(spark, path, updates, key_cols=["url"], num_buckets=4)
    assert len(rewritten) == 1
    untouched = [b for b in range(4) if b not in rewritten]
    after = {
        b: sorted(os.path.getmtime(f) for f in glob.glob(f"{path}/bucket={b}/*.parquet"))
        for b in range(4)
    }
    for b in untouched:
        assert after[b] == before[b], f"bucket {b} was rewritten but held no updated key"
    assert {r.url: r.text for r in spark.read.parquet(path).collect()}["u5"] == "NEW5"


def test_merge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_table(spark, path, [Row(url=f"u{i}", text=f"old{i}") for i in range(10)])
    updates = spark.createDataFrame([Row(url="u1", text="NEW1")])
    merge_upsert(spark, path, updates, key_cols=["url"], num_buckets=4)
    merge_upsert(spark, path, updates, key_cols=["url"], num_buckets=4)
    rows = spark.read.parquet(path).filter("url = 'u1'").collect()
    assert len(rows) == 1 and rows[0].text == "NEW1"


def test_merge_random_sequence_matches_dict_model(spark, tmp_path):
    # model check: any sequence of merge batches must leave the table
    # equal to a plain dict of last-write-wins upserts
    import random

    rng = random.Random(7)
    path = str(tmp_path / "tbl")
    model = {f"u{i}": f"old{i}" for i in range(15)}
    _write_table(spark, path, [Row(url=k, text=v) for k, v in model.items()])
    for step in range(4):
        batch = {
            f"u{rng.randrange(25)}": f"v{step}_{j}" for j in range(rng.randint(1, 6))
        }
        model.update(batch)
        merge_upsert(
            spark,
            path,
            spark.createDataFrame([Row(url=k, text=v) for k, v in batch.items()]),
            key_cols=["url"],
            num_buckets=4,
        )
        got = {r.url: r.text for r in spark.read.parquet(path).collect()}
        assert got == model, f"diverged at step {step}"


def test_merge_batch_with_duplicate_keys_keeps_latest_only(spark, tmp_path):
    # one updates batch carrying BOTH versions of a key (a streaming
    # microbatch seeing a save and a re-save) must leave exactly one row:
    # the max-order version
    path = str(tmp_path / "tbl")
    _write_table(spark, path, [Row(url=f"u{i}", text=f"old{i}") for i in range(6)])
    updates = spark.createDataFrame(
        [Row(url="u2", text="v1", ver=1), Row(url="u2", text="v2", ver=2),
         Row(url="u9", text="new9a", ver=1), Row(url="u9", text="new9b", ver=2)]
    )
    # ver orders the reduction; merge_upsert projects to the table schema
    merge_upsert(
        spark, path, updates, key_cols=["url"], num_buckets=4, dedupe_order_col="ver"
    )
    rows = {r.url: r.text for r in spark.read.parquet(path).collect()}
    assert rows["u2"] == "v2" and rows["u9"] == "new9b"
    assert spark.read.parquet(path).groupBy("url").count().filter("count > 1").count() == 0


def test_latest_wins_view(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", v="v1", ver=1),
            Row(k="a", v="v2", ver=2),
            Row(k="b", v="only", ver=1),
        ]
    )
    out = {r.k: (r.v, r.ver) for r in latest_wins(df, ["k"], "ver").collect()}
    assert out == {"a": ("v2", 2), "b": ("only", 1)}


def test_table_exists_narrow_exception_contract(spark, tmp_path):
    # only definitive "nothing there" maps to False; a corrupt/unreadable
    # table must RAISE — returning False would route a streaming batch
    # into the bootstrap branch whose overwrite truncates the real table
    import pytest

    from manga_ocr_spark.jobs.upsert import table_exists

    assert table_exists(spark, str(tmp_path / "missing")) is False
    empty = tmp_path / "empty"
    empty.mkdir()
    assert table_exists(spark, str(empty)) is False

    real = str(tmp_path / "real")
    _write_table(spark, real, [Row(url="u0", text="t0")])
    assert table_exists(spark, real) is True

    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-000.parquet").write_text("not parquet " * 10)
    with pytest.raises(Exception):
        table_exists(spark, str(corrupt))


def test_merge_recovers_interrupted_commit(spark, tmp_path, monkeypatch):
    # crash DURING the dynamic-partition commit: one affected bucket is
    # already deleted, the process dies, and the streaming batch replays.
    # The replayed merge must first restore from the (complete) staging
    # dir, then re-apply — no rows lost, staging cleaned up.
    import pytest

    from manga_ocr_spark.jobs import upsert as U

    path = str(tmp_path / "tbl")
    rows = [Row(url=f"u{i}", text=f"old{i}") for i in range(40)]
    _write_table(spark, path, rows)
    updates = spark.createDataFrame([Row(url="u5", text="NEW5"), Row(url="u11", text="NEW11")])

    real_commit = U._commit_staging

    def crash_mid_commit(spark_, staging, table_dir):
        # simulate the overwrite's delete phase landing for one AFFECTED
        # bucket before the process dies: remove that bucket entirely
        import shutil

        affected = sorted(os.path.basename(p) for p in glob.glob(f"{staging}/bucket=*"))
        shutil.rmtree(os.path.join(table_dir, affected[0]))
        raise RuntimeError("simulated crash mid-commit")

    monkeypatch.setattr(U, "_commit_staging", crash_mid_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_upsert(spark, path, updates, key_cols=["url"], num_buckets=4)
    monkeypatch.setattr(U, "_commit_staging", real_commit)

    # table is corrupted on disk right now (a whole bucket missing);
    # staging holds the only good copy. Replay of the SAME batch:
    merge_upsert(spark, path, updates, key_cols=["url"], num_buckets=4)

    out = {r.url: r.text for r in spark.read.parquet(path).collect()}
    assert len(out) == 40  # every original key survived the crash
    assert out["u5"] == "NEW5" and out["u11"] == "NEW11"
    assert out["u0"] == "old0"
    assert not os.path.exists(f"{path}__staging_merge")


def test_merge_ignores_incomplete_staging(spark, tmp_path):
    # a crash DURING the staging write leaves staging without _SUCCESS;
    # the table was never touched — the next merge must discard the
    # debris (not "restore" half-written data) and proceed normally
    path = str(tmp_path / "tbl")
    _write_table(spark, path, [Row(url=f"u{i}", text=f"old{i}") for i in range(10)])
    staging = f"{path}__staging_merge"
    os.makedirs(f"{staging}/bucket=0")
    with open(f"{staging}/bucket=0/part-000.parquet", "w") as f:
        f.write("half-written debris")  # no _SUCCESS marker

    updates = spark.createDataFrame([Row(url="u1", text="NEW1")])
    merge_upsert(spark, path, updates, key_cols=["url"], num_buckets=4)

    out = {r.url: r.text for r in spark.read.parquet(path).collect()}
    assert len(out) == 10 and out["u1"] == "NEW1" and out["u0"] == "old0"
    assert not os.path.exists(staging)


def test_recover_staging_preserves_staging_on_failed_verification(
    spark, tmp_path, monkeypatch
):
    # self-review r3 finding: recovery must keep the staging dir (the only
    # guaranteed-good copy) when its re-commit does not verifiably land —
    # an unverified delete turns a loud commit failure into silent loss
    import shutil

    import pytest

    from manga_ocr_spark.jobs import upsert as U

    path = str(tmp_path / "tbl")
    _write_table(spark, path, [Row(url=f"u{i}", text=f"old{i}") for i in range(20)])
    staging = f"{path}__staging_merge"
    shutil.copytree(path, staging)  # complete staging (has _SUCCESS)

    monkeypatch.setattr(U, "_commit_staging", lambda *a, **k: None)  # commit lost
    shutil.rmtree(path)  # table gone: re-commit (a no-op here) cannot land
    with pytest.raises(Exception):
        U.recover_staging(spark, path)
    assert os.path.exists(staging)  # preserved for the next attempt

    # with the real commit back, the same recovery completes and cleans up
    monkeypatch.undo()
    assert U.recover_staging(spark, path) is True
    assert not os.path.exists(staging)
    assert spark.read.parquet(path).count() == 20


def test_verification_catches_same_count_wrong_content(spark, tmp_path):
    # ADVICE r3: the verify gate must be a CONTENT check, not a row-count
    # check — a commit that landed the right number of wrong rows (or a
    # stale bucket dir with a matching count) must fail verification and
    # preserve staging.
    import shutil

    import pytest

    from manga_ocr_spark.jobs import upsert as U

    path = str(tmp_path / "tbl")
    _write_table(spark, path, [Row(url=f"u{i}", text=f"old{i}") for i in range(20)])
    staging = f"{path}__staging_merge"
    shutil.copytree(path, staging)

    # corrupt one live bucket: same row count, different content
    bucket_dirs = sorted(d for d in os.listdir(path) if d.startswith("bucket="))
    bdir = os.path.join(path, bucket_dirs[0])
    n = spark.read.parquet(bdir).count()
    spark.createDataFrame(
        [Row(url=f"wrong{i}", text=f"stale{i}") for i in range(n)]
    ).write.mode("overwrite").parquet(bdir)

    with pytest.raises(RuntimeError, match="verification failed"):
        U._verify_and_drop_staging(spark, staging, path)
    assert os.path.exists(staging)  # preserved for recovery
