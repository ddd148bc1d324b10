"""Streaming ingestion: extract new pages as they arrive.

The reference's CLI daemon polls a directory, keys seen work by
(path, mtime), and appends results to a sink
(/root/reference/manga_ocr/run.py:93-107,166-214). The Spark-native
equivalent is a Structured Streaming file source — its checkpointed
seen-files log IS the (path, mtime) set, made durable and exactly-once —
feeding the same extraction mapInPandas and an append sink via
foreachBatch.

``trigger(availableNow=True)`` gives catch-up batch semantics (process
everything new, then stop) — the deployment mode a scheduled 100 TB
ingest actually uses; a ``processingTime`` trigger gives the daemon mode.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from manga_ocr_spark.jobs.extract import PAGES_SCHEMA, extract_pages


def run_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str = "10 seconds",
    max_files_per_trigger: int | None = None,
):
    """Watch ``input_dir`` for new parquet page files; extract; append.

    Returns the StreamingQuery (caller awaits/stops it).
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)

    def _process(batch_df, batch_id: int) -> None:
        # foreachBatch = the reference's process_and_write_results
        # (run.py:54-90); extraction itself is the shared batch code path.
        extracted = extract_pages(batch_df).drop("ok", "bytes_in")
        extracted.write.mode("append").parquet(f"{output_dir}/extracted")

    writer = pages.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
