"""Unit tests for as-of join and skew-safe aggregation (operators/joins.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from manga_ocr_spark.operators.joins import as_of_join, salted_two_phase_agg


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=_ts(10), name="ev10"), Row(k=1, ts=_ts(12), name="ev12")]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts(9), price=1.0),
            Row(k=1, rts=_ts(10), price=2.0),  # equal ts counts (<=)
            Row(k=1, rts=_ts(11), price=3.0),
            Row(k=1, rts=_ts(13), price=9.0),  # after both left rows
        ]
    )
    out = {
        r.name: r.price
        for r in as_of_join(left, right, "k", "ts", "rts", ["price"]).collect()
    }
    assert out == {"ev10": 2.0, "ev12": 3.0}


def test_asof_no_match_yields_null(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(5), name="early")])
    right = spark.createDataFrame([Row(k=1, rts=_ts(9), price=1.0)])
    (r,) = as_of_join(left, right, "k", "ts", "rts", ["price"]).collect()
    assert r.price is None


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(10), name="a"), Row(k=2, ts=_ts(10), name="b")])
    right = spark.createDataFrame([Row(k=1, rts=_ts(9), price=1.0)])
    out = {r.name: r.price for r in as_of_join(left, right, "k", "ts", "rts", ["price"]).collect()}
    assert out == {"a": 1.0, "b": None}


def test_asof_null_value_of_latest_match_stays_null(spark):
    # point-in-time semantics: the latest as-of row's NULL field must come
    # through as NULL — not be skipped in favor of a stale older value
    # (the per-column last(ignorenulls) bug)
    left = spark.createDataFrame([Row(k=1, ts=_ts(12), name="x")])
    right = spark.createDataFrame(
        [Row(k=1, rts=_ts(9), price=1.0, note="old"),
         Row(k=1, rts=_ts(11), price=None, note="latest")]
    )
    (r,) = as_of_join(left, right, "k", "ts", "rts", ["price", "note"]).collect()
    assert r.note == "latest"
    assert r.price is None  # NOT 1.0 carried from the older row


def test_asof_tiebreak_prefers_max(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(10), name="x")])
    right = spark.createDataFrame(
        [Row(k=1, rts=_ts(9), oid=7, price=1.0), Row(k=1, rts=_ts(9), oid=9, price=2.0)]
    )
    (r,) = as_of_join(left, right, "k", "ts", "rts", ["oid", "price"], tiebreak="oid").collect()
    assert (r.oid, r.price) == (9, 2.0)


def test_asof_intermediate_is_linear_not_quadratic(spark):
    # the plan must contain NO join — union + window only
    left = spark.createDataFrame([Row(k=1, ts=_ts(10), name="a")])
    right = spark.createDataFrame([Row(k=1, rts=_ts(9), price=1.0)])
    plan = as_of_join(left, right, "k", "ts", "rts", ["price"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan
    assert "Union" in plan and "Window" in plan


def test_salted_agg_matches_plain_groupby(spark):
    df = spark.createDataFrame(
        [Row(g="a", x=float(i), y=i % 3) for i in range(100)]
        + [Row(g="b", x=1.5, y=2)]
    )
    salted = {
        r.g: (round(r.sum_x, 6), r.sum_y, r.n)
        for r in salted_two_phase_agg(df, "g", ["x", "y"], salt_buckets=8).collect()
    }
    plain = {
        r.g: (round(r.sx, 6), r.sy, r.n)
        for r in df.groupBy("g")
        .agg(F.sum("x").alias("sx"), F.sum("y").alias("sy"), F.count("*").alias("n"))
        .collect()
    }
    assert salted == plain


def test_dup_clusters_chain_propagates(spark):
    from manga_ocr_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),  # chain diam 3
         Row(id_a=10, id_b=11)]
    )
    out = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dup_clusters_deep_chain_and_lineage_cut(spark):
    # diameter-6 path: min-label propagation must iterate ~6 rounds; with
    # per-iteration localCheckpoint each round's plan starts from the
    # PREVIOUS round's materialized labels, not the whole join chain
    from manga_ocr_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(1, 7)])
    labels = dup_clusters(pairs)
    out = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert out == {i: 1 for i in range(1, 8)}
    # lineage is cut: the returned frame is a scan of checkpointed blocks —
    # zero joins in its plan (without the checkpoint, a diameter-6 run
    # nests ~12 joins here)
    plan = labels._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan


def test_salted_agg_spreads_byte_identical_hot_rows(spark):
    # the degenerate case content-hash-only salting cannot break:
    # byte-identical rows of one hot key (e.g. repeated zero-value events)
    # share a content hash. With spark_partition_id mixed in, rows in
    # different map partitions take different salts.
    from manga_ocr_spark.operators.joins import _replay_stable_salt, salted_two_phase_agg

    df = (
        spark.range(2000)
        .selectExpr("'hot' as g", "0.0 as x")  # all rows byte-identical
        .repartition(8)
    )
    n_salts = (
        df.withColumn("s", _replay_stable_salt(df, 64)).select("s").distinct().count()
    )
    assert n_salts > 1, "identical rows collapsed onto a single salt bucket"

    # result identical to the plain aggregation
    out = salted_two_phase_agg(df, "g", ["x"], salt_buckets=64).collect()
    assert len(out) == 1 and out[0].n == 2000 and out[0].sum_x == 0.0


def test_global_row_number_matches_single_partition_window(spark):
    # two-phase ranking must be BIT-identical to the naive global window
    from pyspark.sql import Row, Window

    from manga_ocr_spark.operators.ranking import global_row_number

    # adversarial key distribution: dense run + sparse outliers + negatives
    ids = list(range(100)) + [10_000, 10_001, -5, 2**40, 500, 501, 502]
    rows = [Row(k=i, payload=f"p{i}") for i in ids]
    df = spark.createDataFrame(rows).repartition(7)

    got = {r.k: r.rn for r in global_row_number(df, "k", num_buckets=8).collect()}
    w = Window.orderBy("k")
    want = {
        r.k: r.rn
        for r in df.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want

    # more buckets than rows: degenerate splits still rank correctly
    small = spark.createDataFrame([Row(k=i, payload="x") for i in range(5)])
    got_small = {r.k: r.rn for r in global_row_number(small, "k", num_buckets=64).collect()}
    assert got_small == {i: i + 1 for i in range(5)}
