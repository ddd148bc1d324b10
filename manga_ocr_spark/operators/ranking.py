"""Scale-safe global ranking: two-phase row numbering without a
single-partition sort.

``Window.orderBy(...)`` with no partitionBy moves EVERY row through one
task (Spark plans it as ``Exchange SinglePartition`` + one sort) — correct
at any scale, catastrophic at 10^12 rows. The classic fix is two-phase
ranking:

1. split the key space into range buckets (split points from a
   quantile sketch — a distributed aggregation, KB-size result),
2. count rows per bucket (one map-side-combined aggregation; B rows to
   the driver),
3. rank WITHIN each bucket (partitioned window — shuffles on the bucket
   key, never a global sort) and add the cumulative offset of the
   preceding buckets.

Because bucket assignment is monotone in the key, local rank + offset IS
the global rank — bit-identical to the single-partition window. The only
driver state is ``num_buckets`` counts; every heavy stage is partitioned.

Reference analogue: fixed-size corpus packaging
(/root/reference/manga_ocr_dev/synthetic_data_generator/scan_fonts.py and
process_cc100-style packaging, SURVEY.md §2.5 W1), which the reference
does with an in-memory dataframe index — feasible only because its corpora
fit on one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_row_number(
    df: DataFrame,
    order_col: str,
    num_buckets: int = 64,
    out_col: str = "rn",
    relative_error: float = 0.001,
) -> DataFrame:
    """Add a 1-based global ``row_number`` ordered by ``order_col`` without
    a single-partition sort.

    ``order_col`` must be numeric and SHOULD be unique (ties get an
    arbitrary but stable-within-run order inside their bucket — the same
    contract as ``row_number`` over a non-unique global window). Nulls are
    not supported (they have no place in a range bucketing); callers
    filter them first.

    Runs two auxiliary jobs over ``df`` (quantile sketch + per-bucket
    counts) before the final partitioned-window pass — at 100 TB each is a
    map-side-combined scan, which is the price of removing the one-task
    sort. Plan shape pinned by tests/test_plans.py (no
    ``Exchange SinglePartition``).
    """
    # 1) split points: deterministic Greenwald-Khanna sketch, never a sort
    probs = [i / num_buckets for i in range(1, num_buckets)]
    splits = df.stat.approxQuantile(order_col, probs, relative_error)
    splits = sorted(set(splits))  # degenerate distributions → fewer buckets

    splits_arr = F.array(*[F.lit(s) for s in splits])
    bucket = F.size(F.filter(splits_arr, lambda s: s <= F.col(order_col)))
    bucketed = df.withColumn("__rank_bucket", bucket)

    # 2) per-bucket counts -> cumulative offsets (len(splits)+1 rows max)
    counts = {
        r["__rank_bucket"]: r["cnt"]
        for r in bucketed.groupBy("__rank_bucket").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for b in range(len(splits) + 1):
        offsets[b] = running
        running += counts.get(b, 0)
    offset_map = F.create_map(
        *[F.lit(x) for pair in offsets.items() for x in pair]
    )

    # 3) local rank within the range bucket + preceding-bucket offset
    w = Window.partitionBy("__rank_bucket").orderBy(F.asc(order_col))
    return (
        bucketed.withColumn(
            out_col,
            (F.row_number().over(w) + F.element_at(offset_map, F.col("__rank_bucket"))).cast(
                "long"
            ),
        )
        .drop("__rank_bucket")
    )
