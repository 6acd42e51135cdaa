"""SparkSession factory tuned for this engine.

Local-mode defaults mirror the test/bench environment (local[N] on one
host); the same settings are the right starting point on a real cluster
(AQE on, partition coalescing, Arrow for the pandas-UDF boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL conf required to read the driver-generated ``events`` table: its
#: parquet ``ts`` column is INT64 TIMESTAMP(NANOS), which Spark refuses
#: by default. With this flag Spark reads it as LongType (nanoseconds);
#: sources.tables converts to a microsecond TimestampType column.
NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"

#: Spark's legacy default makes size(NULL) return -1 instead of NULL:
#: a NULL text row would then flow through quality/langid metrics as
#: n_tokens = -1 and produce plausible-looking fabricated ratios
#: (e.g. ttr = (-1)/(-1) = 1.0) instead of NULLs. DuckDB's len(NULL)
#: is NULL — pinning the modern behavior keeps the twins aligned on
#: nullable text.
SIZE_OF_NULL = "spark.sql.legacy.sizeOfNull"

#: The driver's parquet timestamps are written with isAdjustedToUTC=false,
#: which Spark 4 infers as TIMESTAMP_NTZ by default. NTZ is rejected by
#: event-time watermarks and unix_micros/unix_timestamp arithmetic, so we
#: pin inference back to TimestampType (session tz is pinned to UTC below,
#: making the two wall-clock-identical and matching DuckDB's naive reads).
INFER_NTZ = "spark.sql.parquet.inferTimestampNTZ.enabled"


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "async-pipes-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    At 100 TB the same declarative plans run unchanged; only the
    cluster-manager configs (executors, memory, shuffle service) differ.
    ``spark.sql.shuffle.partitions`` here matches local cores; on a real
    cluster it should be ~2-3x total executor cores, or left to AQE
    coalescing with a high initial value.
    """
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce small shuffles down to few reduce tasks (fewer
        # scheduling round-trips); on a big cluster the advisory size
        # keeps reducers at a healthy ~64MB each
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 256k-row Arrow batches (default 10k): fewer batch boundaries in
        # toPandas collection AND in pandas-UDF/mapInPandas kernels — the
        # numpy kernels amortize per-batch overhead over bigger blocks
        # (measured ~10% off the declared suite; at 100 TB per-executor
        # batch memory is bounded by maxPartitionBytes anyway)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # PySpark 4 walks the Python stack on EVERY DataFrame API call
        # to enrich error messages with the user call site
        # (pyspark.errors.utils._with_origin). The engine's imperative
        # lifecycles (IVM refreshes, MOR commits) issue hundreds of
        # API calls per operation — the walk alone profiled at ~3% of
        # an IVM query's wall clock. Errors still carry the full
        # Python traceback; only the JVM-side origin annotation is
        # dropped. Flip to true when debugging plan provenance.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config(NANOS_AS_LONG, "true")
        .config(INFER_NTZ, "false")
        .config(SIZE_OF_NULL, "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: informational session conf mirroring the reliable-checkpoint state
#: (for observability in the Spark UI / conf dumps). The SOURCE OF
#: TRUTH is the module-level flag below: a SQL conf would not propagate
#: into cloned sessions (``SparkSession.newSession()``, which several
#: streaming queries create), silently downgrading their loops back to
#: localCheckpoint — but the checkpoint dir lives on the process-wide
#: SparkContext, so the switch must be process-wide too.
RELIABLE_CHECKPOINT = "spark.async_pipes_spark.reliableCheckpoint"

_RELIABLE_CHECKPOINTS = {"enabled": False}


def enable_reliable_checkpoints(spark: SparkSession, checkpoint_dir: str) -> None:
    """Opt every engine iteration loop (connected components, PageRank,
    BPE training, prefix scans, cyclic pipelines) into RELIABLE
    checkpointing at ``checkpoint_dir`` (HDFS/object-store path on a
    real cluster) — process-wide, so cloned sessions (streaming
    queries) inherit it. Default is ``localCheckpoint`` — faster (no
    filesystem round-trip) but tied to executor liveness; flip this on
    for long multi-iteration jobs where losing an executor mid-loop
    must not kill the run. Checkpoint files accumulate per iteration;
    set ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (at
    session build time) or clean the directory after the job."""
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    _RELIABLE_CHECKPOINTS["enabled"] = True
    spark.conf.set(RELIABLE_CHECKPOINT, "true")


def disable_reliable_checkpoints(spark: SparkSession) -> None:
    _RELIABLE_CHECKPOINTS["enabled"] = False
    spark.conf.set(RELIABLE_CHECKPOINT, "false")


def pin(df):
    """Materialize a DataFrame and truncate its lineage — the engine's
    single choke point for every iteration loop's per-round
    checkpoint. ``df.transform(pin)``-friendly. Uses localCheckpoint
    unless :func:`enable_reliable_checkpoints` switched the process to
    reliable ``checkpoint()``."""
    if _RELIABLE_CHECKPOINTS["enabled"]:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs this engine depends on to an
    externally-created session (e.g. the verification driver's)."""
    spark.conf.set(NANOS_AS_LONG, "true")
    spark.conf.set(INFER_NTZ, "false")
    spark.conf.set(SIZE_OF_NULL, "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
