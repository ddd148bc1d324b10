"""Join operators Spark lacks as built-ins: as-of join, skew-safe
two-phase aggregation.

The reference has only lookup-shaped joins (SURVEY.md §2.3); these are the
"custom operators" a web-scale pipeline needs beyond it, built as
compositions of existing DataFrame ops (the preferred tier — no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same key (as-of / point-in-time join).

    Scalable formulation: instead of the naive range join (equi-join +
    filter + top-1 window, whose intermediate is |left_rows_per_key| x
    |right_rows_per_key|), union both sides with a tag, sort each key's
    timeline once, and carry the most recent right-side values forward
    with ``last(ignorenulls)``. ONE shuffle (the window partitionBy);
    intermediate size = |left| + |right|, never their product.

    Determinism: right rows sort before left rows at equal ts (<=
    semantics); if ``tiebreak`` is given, right rows tied on (key, ts)
    are pre-reduced to the max-``tiebreak`` row.

    NULL handling: the value columns are carried as ONE struct (non-null
    for every right row) and unpacked afterwards — so a genuinely-NULL
    field of the true latest match stays NULL instead of being replaced
    by a stale value from an older right row, which per-column
    ``last(ignorenulls)`` would do.
    """
    if tiebreak is not None:
        w0 = Window.partitionBy(key, right_ts).orderBy(F.desc(tiebreak))
        right = (
            right.withColumn("__rk", F.row_number().over(w0))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )

    from pyspark.sql.types import StructField, StructType

    rv_type = StructType([StructField(c, right.schema[c].dataType) for c in value_cols])
    left_payload = [c for c in left.columns if c != key]
    l_side = left.select(
        F.col(key),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r_side = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("__t"), F.asc("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_side.unionByName(r_side).select(
        "*", F.last("__rv", ignorenulls=True).over(w).alias("__asof_rv")
    )
    return carried.filter(F.col("__tag") == 1).select(
        key,
        *left_payload,
        *[F.col("__asof_rv")[c].alias(c) for c in value_cols],
    )


def _replay_stable_salt(df: DataFrame, salt_buckets: int):
    """Salt column for skew-spreading: xxhash64 over (map partition id,
    all row columns) mod ``salt_buckets``. Deterministic under task retry
    (a recomputed partition keeps its index), unlike
    monotonically_increasing_id; spreads byte-identical rows that sit in
    different map partitions, unlike content-hash alone."""
    return F.pmod(
        F.xxhash64(F.spark_partition_id(), *[F.col(c) for c in df.columns]),
        F.lit(salt_buckets),
    )


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    sum_cols: list[str],
    salt_buckets: int = 64,
) -> DataFrame:
    """groupBy(key).sum(...) that survives heavily skewed keys.

    Phase 1 aggregates on (key, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 combines the per-salt partials.
    Identical result to the plain aggregation (sums/counts are
    associative and commutative), different shuffle profile: no single
    reducer ever materializes a hot key's full row set. AQE's skew
    handling covers joins; this covers aggregations, where AQE cannot
    split one group. Output: (key, sum_<c>..., n).

    The salt is derived from (map partition id, row content) — never from
    monotonically_increasing_id(): a nondeterministic shuffle key is the
    classic lost/duplicated-rows hazard when a fetch failure triggers a
    map-stage recompute after reducers already consumed some output —
    exactly the failure mode that matters at the scale this operator is
    for. spark_partition_id() is replay-stable (a retried task keeps its
    partition index) and breaks the degenerate case content-hashing alone
    cannot: BYTE-IDENTICAL rows of one hot key (e.g. repeated zero-value
    events) all share a content hash and would land on a single reducer.
    With the partition id mixed in, identical rows from different map
    partitions spread across salts, and identical rows WITHIN one map
    partition are combined by phase 1's map-side partial aggregation
    before they ever shuffle — so no reducer sees more than one partial
    per (key, map partition).
    """
    salted = df.withColumn("__salt", _replay_stable_salt(df, salt_buckets))
    phase1 = salted.groupBy(key, "__salt").agg(
        *[F.sum(c).alias(f"__p_{c}") for c in sum_cols],
        F.count("*").alias("__p_n"),
    )
    return phase1.groupBy(key).agg(
        *[F.sum(f"__p_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("__p_n").alias("n"),
    )
