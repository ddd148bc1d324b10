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


def _sample_splits(
    df: DataFrame, order_col: str, num_buckets: int, seed: int
) -> list:
    """Range split points for NON-numeric keys (string/date/...), the way
    Spark's own sort picks them: a seeded sample, sorted driver-side, cut
    at even ranks. Two cheap jobs (count + sample); the sample is bounded
    to ~``num_buckets * 128`` values — KB-scale driver state. Split
    QUALITY only affects bucket balance, never rank correctness (local
    rank + offset is exact for any monotone bucketing).

    Driver-side Python ``sort`` and executor-side Spark comparison agree:
    Spark's default UTF8_BINARY collation compares UTF-8 bytes, whose
    order equals code-point order — which is what Python ``<`` compares.
    """
    n = df.count()
    if n == 0:
        return []
    target = num_buckets * 128
    frac = min(1.0, (target * 1.2) / n)
    sample = sorted(r[0] for r in df.select(order_col).sample(False, frac, seed).collect())
    if not sample:
        return []
    step = len(sample) / num_buckets
    return sorted({sample[int(i * step)] for i in range(1, num_buckets) if int(i * step) < len(sample)})


_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")


def global_row_number(
    df: DataFrame,
    order_col: str,
    num_buckets: int = 64,
    out_col: str = "rn",
    relative_error: float = 0.001,
    seed: int = 42,
) -> DataFrame:
    """Add a 1-based global ``row_number`` ordered by ``order_col`` without
    a single-partition sort.

    ``order_col`` may be numeric (split points from an approxQuantile
    sketch) or any other orderable type — string, date, timestamp — (split
    points from a seeded sample, Spark's own range-partitioner strategy).
    It SHOULD be unique (ties get an arbitrary but stable-within-run order
    inside their bucket — the same contract as ``row_number`` over a
    non-unique global window). Nulls are not supported (they have no place
    in a range bucketing); callers filter them first.

    ``df`` MUST be deterministic across re-evaluation: this function runs
    two auxiliary jobs over it (split-point sketch/sample + per-bucket
    counts) before the final windowed pass, so a frame containing
    nondeterministic or unmaterialized-UDF-derived values can present
    DIFFERENT rows to the counts job and the ranking job, corrupting the
    driver-side offsets (duplicate/skipped global ranks). Stage such
    frames first (``df.localCheckpoint()`` or write+re-read) — the same
    invariant as the self-join rule in CLAUDE.md. Plain table reads and
    pure column expressions are fine.

    At 100 TB each auxiliary job is a map-side-combined scan, which is the
    price of removing the one-task sort. Plan shape pinned by
    tests/test_plans.py (no ``Exchange SinglePartition``).
    """
    dtype = dict(df.dtypes)[order_col]
    if dtype.startswith(_NUMERIC_PREFIXES):
        # deterministic Greenwald-Khanna sketch, never a sort
        probs = [i / num_buckets for i in range(1, num_buckets)]
        splits = df.stat.approxQuantile(order_col, probs, relative_error)
        splits = sorted(set(splits))  # degenerate distributions → fewer buckets
    else:
        splits = _sample_splits(df, order_col, num_buckets, seed)

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
