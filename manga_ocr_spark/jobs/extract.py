"""The extraction job: Arrow-batched mapInArrow over the pages table,
with salted repartition, per-bucket lineage commits, and resume.

Dataflow (SURVEY.md §3.1 graft lifecycle):

    read pages -> cheap Spark-side prefilter (html IS NOT NULL; X9 —
    Catalyst pushes it into the scan) -> salted repartition on url hash
    (X11) -> mapInArrow(extract) -> extracted + metrics + lineage

Scale posture (designed for ~10^12 rows / 100 TB, tested at sandbox scale):

- The *only* wide operation in the hot path is the salt repartition, and it
  exists to break host skew; everything else is embarrassingly parallel
  map work. Metrics/lineage aggregate from a column-pruned re-read of the
  COMMITTED extracted parquet (never the html or extracted_text columns,
  never a persist of text-bearing rows — caching GB-scale rows GC-stalls
  the JVM).
- Column pruning matters: metrics-only readers never touch ``html``.
- Bucketing: rows are assigned a stable ``bucket = pmod(xxhash64(url), B)``.
  Buckets are the unit of commit and resume (lineage anti-join, X8/O5): a
  restarted job recomputes only buckets without a committed lineage row.
  On a real deployment B=2048 and the table is Iceberg-partitioned by
  ``(days(warc_ts), bucket(url))``; here the extracted output is parquet
  ``partitionBy(bucket)`` with identical layout semantics.
- The Arrow UDF uses the iterator form: per-python-worker init happens
  once before the batch loop (the reference's load-model-once pattern,
  ocr.py:59-79 / SURVEY.md §4 X1), then every Arrow batch reuses it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("extracted_text", StringType()),
        StructField("n_blocks_kept", IntegerType()),
        StructField("n_blocks_dropped", IntegerType()),
        StructField("lang", StringType()),
        StructField("bytes_in", LongType()),
        # ok = 1 when extraction produced text. Deliberately KEPT in the
        # written table: metrics/lineage recompute from the committed
        # parquet without ever re-reading the (huge) extracted_text column.
        StructField("ok", IntegerType()),
    ]
)

# columns the post-commit stats scan reads — everything EXCEPT the text
STATS_COLUMNS = ["bucket", "lang", "n_blocks_kept", "n_blocks_dropped", "bytes_in", "ok"]

# K6 debug side output (SURVEY.md §1.4 block schema; the reference dumps
# per-sample params+HTML the same way, run_generate.py:64-80): one struct
# per SCORED block, emitted only when extract_pages(debug_blocks=True).
# Off by default — the hot path's schema (and Arrow byte volume) is
# unchanged, pinned by tests/test_plans.py.
BLOCK_STRUCT = StructType(
    [
        StructField("block_id", IntegerType()),
        StructField("tag", StringType()),
        StructField("depth", IntegerType()),
        StructField("text", StringType()),
        StructField("text_len", IntegerType()),
        StructField("link_text_len", IntegerType()),
        StructField("text_density", DoubleType()),  # ws-free chars / total chars
        StructField("link_density", DoubleType()),
        StructField("score", DoubleType()),
        StructField("keep", BooleanType()),
    ]
)

EXTRACTED_DEBUG_SCHEMA = StructType(
    EXTRACTED_SCHEMA.fields + [StructField("blocks", ArrayType(BLOCK_STRUCT))]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("partition_id", StringType()),
        StructField("input_rows", LongType()),
        StructField("output_rows", LongType()),
        StructField("bytes_in", LongType()),
        StructField("t_start", TimestampType()),
        StructField("t_end", TimestampType()),
        StructField("status", StringType()),
        StructField("attempt", IntegerType()),
    ]
)


def _utc_naive(epoch_s: float):
    import datetime as dt

    return dt.datetime.fromtimestamp(epoch_s, tz=dt.timezone.utc).replace(tzinfo=None, microsecond=0)


def _blocks_to_py(blocks) -> list[dict]:
    """Scored Block objects -> plain dicts matching BLOCK_STRUCT."""
    return [
        {
            "block_id": b.block_id,
            "tag": b.tag,
            "depth": b.depth,
            "text": b.text,
            "text_len": b.text_len,
            "link_text_len": b.link_text_len,
            "text_density": b.text_len / max(1, len(b.text)),
            "link_density": b.link_density,
            "score": b.score,
            "keep": b.keep,
        }
        for b in blocks
    ]


def _make_extract_map(debug_blocks: bool = False):
    """mapInArrow body factory. Iterator form: one-time init above the loop.

    Arrow RecordBatches end-to-end: the html binaries come straight off the
    Arrow buffers and results go back as Arrow arrays — measured ~30%
    faster than the equivalent mapInPandas (no pandas object-Series
    round-trip for MB-scale binary columns). One-time per-python-worker
    init happens before the batch loop (X1); the extraction core is pure
    Python, imported here (not at module top) so the task closure stays
    tiny and the spark-submit --py-files layout is exercised.

    ``debug_blocks``: emit the per-block K6 debug column (every scored
    block with its features and keep decision). Debug tier only — the
    blocks array re-ships every block's text, so the hot path keeps it
    off and the schema identical to EXTRACTED_SCHEMA.
    """
    import pyarrow as pa

    block_type = pa.list_(
        pa.struct(
            [
                pa.field("block_id", pa.int32()),
                pa.field("tag", pa.string()),
                pa.field("depth", pa.int32()),
                pa.field("text", pa.string()),
                pa.field("text_len", pa.int32()),
                pa.field("link_text_len", pa.int32()),
                pa.field("text_density", pa.float64()),
                pa.field("link_density", pa.float64()),
                pa.field("score", pa.float64()),
                pa.field("keep", pa.bool_()),
            ]
        )
    )
    out_schema = EXTRACTED_DEBUG_SCHEMA if debug_blocks else EXTRACTED_SCHEMA

    def _extract_map(batches):
        from manga_ocr_spark.extraction.core import extract

        for batch in batches:
            texts: list[str | None] = []
            kept: list[int] = []
            dropped: list[int] = []
            nbytes: list[int] = []
            ok: list[int] = []
            blocks_col: list[list[dict]] = []
            # to_pylist: one vectorized buffer->bytes conversion for the
            # whole batch (measured ~35% cheaper than per-value as_py)
            for payload in batch.column("html").to_pylist():
                nbytes.append(len(payload) if payload is not None else 0)
                res = extract(payload)
                texts.append(res.text)
                kept.append(res.n_blocks_kept)
                dropped.append(res.n_blocks_dropped)
                ok.append(1 if res.text is not None else 0)
                if debug_blocks:
                    blocks_col.append(_blocks_to_py(res.blocks))
            arrays = [
                batch.column("url"),
                batch.column("warc_ts"),
                pa.array(texts, pa.string()),
                pa.array(kept, pa.int32()),
                pa.array(dropped, pa.int32()),
                batch.column("lang"),
                pa.array(nbytes, pa.int64()),
                pa.array(ok, pa.int32()),
            ]
            if debug_blocks:
                arrays.append(pa.array(blocks_col, block_type))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in out_schema.fields]
            )

    return _extract_map


def with_bucket(df: DataFrame, num_buckets: int) -> DataFrame:
    """Stable commit/resume bucket from the url hash (X4/X8)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets)).cast("int")
    )


def extract_pages(
    df: DataFrame, salt_partitions: int | None = None, debug_blocks: bool = False
) -> DataFrame:
    """pages DF -> extracted DF (url, warc_ts, extracted_text, counters...).

    ``salt_partitions``: when set, repartition on ``pmod(xxhash64(url), P)``
    before the UDF so host-skewed inputs spread evenly over tasks (X11).
    The hash is on the full url => uniform regardless of host skew.

    ``debug_blocks``: K6 debug side output — append a ``blocks``
    ``array<struct>`` column (SURVEY §1.4 schema) holding every scored
    block with its features and keep decision, the Spark analogue of the
    reference's per-sample debug params dump (run_generate.py:64-80).
    OFF by default: the debug column re-ships all block text, so the hot
    path's output schema and Arrow volume are unchanged (plan-pinned).
    """
    df = df.filter(F.col("html").isNotNull())
    # column-prune BEFORE the UDF boundary: the WET `text` column is as
    # large as `html` and unused by extraction — shipping it through Arrow
    # would double the bytes crossing the JVM->python boundary (and the
    # parquet scan). Catalyst prunes the scan from this select.
    df = df.select("url", "warc_ts", "html", "lang")
    if salt_partitions:
        df = df.repartition(salt_partitions, F.pmod(F.xxhash64("url"), F.lit(salt_partitions)))
    schema = EXTRACTED_DEBUG_SCHEMA if debug_blocks else EXTRACTED_SCHEMA
    return df.mapInArrow(_make_extract_map(debug_blocks), schema)


@dataclass
class ExtractJob:
    """Checkpoint-resumable batch extraction over a pages parquet dir.

    Layout under ``out_dir``:
      extracted/  parquet, partitionBy(bucket) — final per-url text
      metrics/    parquet — per (bucket, lang): blocks kept/dropped, counts
      lineage/    parquet — one row per committed bucket (FIXTURES.md §3)

    Buckets are committed in groups of ``commit_group_size``; a kill
    between group commits loses at most the in-flight group, and a rerun
    anti-joins against lineage to skip everything committed (the
    reference's (path, mtime) seen-set semantics, run.py:197-206, made
    restart-safe).
    """

    spark: SparkSession
    out_dir: str
    num_buckets: int = 16
    commit_group_size: int = 8
    salt_partitions: int | None = None
    # Iceberg-style layout (days(warc_ts), bucket(url)) from the north
    # rule: time pruning for incremental readers + stable url buckets for
    # resume. Off by default at sandbox scale (file-count explosion).
    partition_by_day: bool = False

    def committed_buckets(self) -> set[int]:
        """Buckets with an ok lineage row. ONLY a missing lineage dir maps
        to 'nothing committed' (fresh start / first run); any other read
        failure — permissions, corrupt footers, unreadable rows — must
        surface, because silently answering set() here would recompute
        and overwrite every bucket (this is the resume correctness
        boundary)."""
        from pyspark.errors import AnalysisException

        try:
            lineage = self.spark.read.parquet(f"{self.out_dir}/lineage")
        except AnalysisException as e:
            # error CLASS only, never free-text message matching: a
            # differently-worded future error must not silently read as
            # "nothing committed" at this resume correctness boundary.
            # getCondition is the PySpark-4 name; getErrorClass the
            # pre-4 legacy one — both return the stable class id.
            klass = (
                e.getCondition()
                if hasattr(e, "getCondition")
                else e.getErrorClass() if hasattr(e, "getErrorClass") else None
            )
            if klass == "PATH_NOT_FOUND":
                return set()
            if klass == "UNABLE_TO_INFER_SCHEMA" and not self._lineage_has_data_files():
                # a kill during the very first lineage write can leave an
                # empty dir (or only _temporary/_SUCCESS) — no data file
                # means provably nothing committed; but the same error
                # over a dir that DOES hold data files (corrupt footers)
                # must still surface
                return set()
            raise
        rows = (
            lineage.filter(F.col("status") == "ok")
            .select("partition_id")
            .distinct()
            .collect()
        )
        return {int(r.partition_id.split("=", 1)[1]) for r in rows}

    def _lineage_has_data_files(self) -> bool:
        """True if the lineage dir holds any VISIBLE data file (Hadoop FS,
        so it works for any scheme). Visibility mirrors Spark's
        InMemoryFileIndex rule: a file is hidden if ANY path segment below
        the lineage root starts with '_' or '.' — a part file inside
        _temporary/ (an in-flight committer task the kill stranded) is
        invisible to the reader and must not count as committed data."""
        from manga_ocr_spark.jobs.upsert import _hadoop_fs

        fs, path = _hadoop_fs(self.spark, f"{self.out_dir}/lineage")
        if not fs.exists(path):
            return False
        base = fs.makeQualified(path).toString().rstrip("/") + "/"
        it = fs.listFiles(path, True)
        while it.hasNext():
            full = it.next().getPath().toString()
            rel = full[len(base):] if full.startswith(base) else full.rsplit("/", 1)[-1]
            if not any(seg.startswith(("_", ".")) for seg in rel.split("/")):
                return True
        return False

    def stats_scan(self, buckets: list[int]) -> DataFrame:
        """Pruned re-read of committed extracted/ partitions: partition-
        pruned to ``buckets``, column-pruned to STATS_COLUMNS — the
        extracted_text column is never read by metrics/lineage."""
        return (
            self.spark.read.parquet(f"{self.out_dir}/extracted")
            .filter(F.col("bucket").isin(buckets))
            .select(*STATS_COLUMNS)
        )

    def run(self, pages: DataFrame, max_groups: int | None = None) -> list[int]:
        """Extract all not-yet-committed buckets. Returns buckets committed
        this run. ``max_groups`` caps commit groups (used by the resume test
        to simulate a mid-run kill)."""
        pages = with_bucket(pages, self.num_buckets)
        done = self.committed_buckets()
        todo = [b for b in range(self.num_buckets) if b not in done]
        groups = [
            todo[i : i + self.commit_group_size]
            for i in range(0, len(todo), self.commit_group_size)
        ]
        if max_groups is not None:
            groups = groups[:max_groups]
        committed: list[int] = []
        for group in groups:
            t_start = time.time()
            sub = pages.filter(F.col("bucket").isin(group))
            ext = extract_pages(sub, salt_partitions=self.salt_partitions)
            ext = with_bucket(ext, self.num_buckets)
            # Scale-safe sink pattern: write extracted/ FIRST, then derive
            # metrics+lineage from a column-pruned re-read of the committed
            # parquet. A persist() of the full extracted rows (text
            # included) would pin GBs of deserialized row objects per
            # group — the resulting GC pressure serializes the JVM at high
            # core counts (CLAUDE.md). One extra pruned scan of THIS
            # group's partitions beats caching text.
            if self.partition_by_day:
                out = ext.withColumn("dt", F.to_date("warc_ts"))
                part_cols = ["dt", "bucket"]
            else:
                out = ext
                part_cols = ["bucket"]
            # dynamic partition overwrite: each bucket belongs to exactly
            # one group, so re-running an uncommitted group REPLACES its
            # partial partitions instead of appending duplicates — the
            # write itself is idempotent, lineage stays the commit marker.
            # Per-write option, NOT a session conf: mutating the session
            # would silently change later overwrite writes' semantics.
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*part_cols)
                .parquet(f"{self.out_dir}/extracted")
            )
            # ONE pruned scan of the just-committed partitions feeds both
            # metrics and lineage; per-(bucket, lang) rows are KB-scale
            per_bl = (
                self.stats_scan(group)
                .groupBy("bucket", "lang")
                .agg(
                    F.sum("n_blocks_kept").alias("blocks_kept"),
                    F.sum("n_blocks_dropped").alias("blocks_dropped"),
                    F.count("*").alias("count"),
                    F.sum("ok").alias("output_rows"),
                    F.sum("bytes_in").alias("bytes_in"),
                )
                .collect()
            )
            metrics_rows = [
                (r["lang"], int(r["blocks_kept"]), int(r["blocks_dropped"]),
                 int(r["count"]), f"bucket={int(r['bucket'])}")
                for r in per_bl
            ]
            self.spark.createDataFrame(
                metrics_rows,
                "lang string, blocks_kept bigint, blocks_dropped bigint, "
                "count bigint, partition_id string",
            ).write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy(
                "partition_id"
            ).parquet(f"{self.out_dir}/metrics")
            stats: dict[int, dict] = {}
            for r in per_bl:
                b = int(r["bucket"])
                s = stats.setdefault(b, {"input_rows": 0, "output_rows": 0, "bytes_in": 0})
                s["input_rows"] += int(r["count"])
                s["output_rows"] += int(r["output_rows"])
                s["bytes_in"] += int(r["bytes_in"])
            t_end = time.time()
            lineage_rows = [
                (
                    f"bucket={b}",
                    int(stats[b]["input_rows"]) if b in stats else 0,
                    int(stats[b]["output_rows"]) if b in stats else 0,
                    int(stats[b]["bytes_in"]) if b in stats else 0,
                    _utc_naive(t_start),
                    _utc_naive(t_end),
                    "ok",
                    1,
                )
                for b in group
            ]
            # lineage commit is the *last* write of the group: its presence
            # certifies the group's extracted+metrics rows are durable.
            self.spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).write.mode(
                "append"
            ).parquet(f"{self.out_dir}/lineage")
            committed.extend(group)
        return committed
