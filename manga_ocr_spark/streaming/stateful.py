"""Custom stateful streaming operator: running per-host ingest counters.

The reference's daemon keeps in-memory state across poll iterations (the
seen-set and last-clipboard-image, run.py:168-206). The Spark-native
generalization is ``applyInPandasWithState``: user state per key,
checkpointed, exactly-once across restarts — here a running
(n_pages, total_bytes) per host, the kind of per-source accounting a
100 TB ingest uses for quota/abuse control. State size = O(#hosts),
independent of row count; each micro-batch touches only hosts present in
the batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "host string, n_pages long, total_bytes long"
STATE_SCHEMA = "n_pages long, total_bytes long"


def _update_host(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += int(pdf["nb"].sum())
    state.update((n, total))
    yield pd.DataFrame([{"host": key[0], "n_pages": n, "total_bytes": total}])


def host_stats_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming pages DF -> updating (host, n_pages, total_bytes) stream."""
    hosts = pages_stream.select(
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
        F.length("html").cast("long").alias("nb"),
    )
    return hosts.groupBy("host").applyInPandasWithState(
        _update_host,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_host_stats(spark: Any, input_dir: str, checkpoint_dir: str, output_dir: str):
    """availableNow run appending update rows to parquet via foreachBatch
    (the memory sink cannot recover from a checkpoint; foreachBatch can).
    State persists in the checkpoint, so a later run with the same
    checkpoint continues the counters. The latest row per host is the
    current state — readers take max(n_pages) per host."""
    from manga_ocr_spark.jobs.extract import PAGES_SCHEMA

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)

    def _write(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    return (
        host_stats_stream(pages)
        .writeStream.foreachBatch(_write)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
