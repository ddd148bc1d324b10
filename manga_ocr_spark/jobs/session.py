"""SparkSession construction with the engine's tuned defaults.

Every knob here is chosen for the 100 TB posture and merely *also* works at
sandbox scale:

- Arrow execution on (the whole engine is Arrow-batched pandas UDFs —
  BASELINE.json ``input_hint``: "no per-row Python").
- ``arrow.maxRecordsPerBatch`` 1024: batch memory = rows x payload size
  must stay bounded (SURVEY.md §4 X2/X12) — 1024 rows x ~50 KB typical
  web page ≈ 50 MB/batch; the 2 MB per-doc input cap bounds the worst
  case at 2 GB, which the task-level salting keeps theoretical. Measured:
  256-row batches left ~3x throughput on the table for small pages
  (Arrow/pandas per-batch overhead dominates).
- AQE on incl. skew-join handling (host-skewed pages, X11).
- ``files.maxPartitionBytes`` 128m: at 100 TB this yields ~800k input
  splits — individually right-sized for executor memory.
- shuffle partitions default to 4x cores locally; on a real cluster this is
  overridden (or left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _resolve_master(master: str | None, env: dict, cpus: int) -> str | None:
    """Which master to set on the builder — or None to leave it alone.

    Under spark-submit (the launcher JVM gateway is already up —
    PYSPARK_GATEWAY_PORT is in the env), the launcher's --master lives in
    the JVM conf; calling builder.master() would silently override it and
    run a cluster job in local mode on the driver host. Only set a master
    when one was explicitly passed, or when running standalone."""
    if master is not None:
        return master
    if "PYSPARK_GATEWAY_PORT" in env:  # spark-submit owns the master
        return None
    return f"local[{cpus}]"


def _java_opts(cpus: int | None = None) -> str:
    """Driver/executor JVM options: throughput GC, plus any caller-supplied
    extras from $SPARK_GRAFT_JAVA_OPTS (profiling hook — e.g. ``-Xlog:gc*``
    to attribute wall time to stop-the-world pauses; inert when unset).

    When the session models an N-core executor (standalone local[N]), the
    JVM is told so via -XX:ActiveProcessorCount=N: otherwise every internal
    pool it sizes from os.availableProcessors — ParallelGC worker threads
    (~23 on this 32-CPU host), C2 compiler threads (~12), ForkJoinPool —
    is scaled to the HOST, not the modeled executor. On a real cluster an
    executor container sees its own core allotment; in the sandbox the
    mismatch subsidizes small-N legs (a local[2] job with 23 GC threads)
    and distorts any N-vs-4N comparison."""
    extra = os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
    apc = f"-XX:ActiveProcessorCount={cpus} " if cpus else ""
    return f"-XX:+UseParallelGC {apc}{extra}".strip()


def get_spark(
    master: str | None = None,
    app_name: str = "manga-ocr-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Python workers are separate processes spawned by the JVM; they inherit
    # the env, not the driver's sys.path. Exporting the package root on
    # PYTHONPATH makes `import manga_ocr_spark` work inside mapInPandas
    # regardless of the driver's cwd (on a cluster, spark-submit --py-files
    # plays this role).
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = _resolve_master(master, os.environ, cpus)
    launcher_owned = master is None  # spark-submit decided the master
    # N of the modeled N-core executor: only meaningful for a standalone
    # local[N] session (under spark-submit the launcher owns sizing)
    jvm_cpus = None
    if not launcher_owned and master.startswith("local"):
        # parse the thread count only — local[4,2] means (threads, maxFailures),
        # and digit-concatenation would read it as 42 (ADVICE r6)
        import re

        m = re.match(r"local\[(\d+|\*)", master)
        jvm_cpus = cpus if (m is None or m.group(1) == "*") else int(m.group(1))
    if shuffle_partitions is None and not launcher_owned:
        # local[N] -> N usable cores; 1 partition per core for the
        # map-heavy extraction profile (shuffles are rare and AQE coalesces)
        shuffle_partitions = max(8, jvm_cpus or cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # byte-based cap composes with the row cap (a batch closes when
        # EITHER is hit, SQLConf: spark.sql.execution.arrow.maxBytesPerBatch)
        # — bounds batch MEMORY directly, so 60 KB pages stop riding in
        # ~60 MB batches while 2 KB docs keep their 1024-row batches; A/B
        # hook via $SPARK_GRAFT_ARROW_MAX_BYTES, inert when unset
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_MAX_BYTES", str(1 << 30)),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # let the planner pick shuffled-hash over sort-merge when its
        # size conditions (canBuildLocalHashMap + muchSmaller) hold —
        # skips both sort passes; the optimization guide's recommended
        # posture. Not a force: joins whose build side exceeds the
        # per-partition threshold still plan sort-merge, so the
        # OOM-safety fallback is intact at cluster scale. VERIFIED
        # PLAN-NEUTRAL at sandbox scale (r7: every bench join is already
        # a broadcast under the 64m threshold at sf0.1/sf1.0 with either
        # setting — executed plans compared identical, so no local win
        # is claimed); the setting matters where a dimension side
        # exceeds broadcast but fits a per-partition hash map, i.e. at
        # cluster scale.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # heap scales with task slots: local mode concentrates ALL task
        # buffers (shuffle, dynamic-partition parquet writers, Arrow
        # feeds) in the one driver JVM — measured: 60 KB-page extraction
        # at local[32] OOMs a 16g heap but completes in 48g. ~1.5 GB per
        # slot, floor 16g; on a real cluster this is per-EXECUTOR memory
        # and spark-submit's --driver-memory/--executor-memory govern.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", f"{max(16, int(cpus * 1.5))}g"),
        )
        # throughput GC for batch work: G1's pause-time tuning throttled the
        # allocation-heavy parquet-binary scan at high core counts (measured
        # 3-4x slower scans vs ParallelGC at local[32])
        .config("spark.driver.extraJavaOptions", _java_opts(jvm_cpus))
        .config("spark.executor.extraJavaOptions", _java_opts(jvm_cpus))
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        builder = builder.config("spark.default.parallelism", str(shuffle_partitions))
    if master is not None:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if shuffle_partitions is None:
        # launcher-owned master (spark-submit): derive the per-core
        # partition tuning from the REAL cluster parallelism, not from
        # SPARK_GRAFT_CPUS — shuffle.partitions is runtime-settable
        # (spark.default.parallelism is not; the launcher governs it)
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(8, spark.sparkContext.defaultParallelism)),
        )
    return spark
