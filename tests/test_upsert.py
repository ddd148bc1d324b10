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
