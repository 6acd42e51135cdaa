"""Partitioning helpers — the engine's replacement for the reference's
per-stage worker-count knobs (WorkerOptions.max_task_count,
reference src/pipeline/mod.rs:50-105): on Spark, parallelism is
partitions × executor slots, so a compute-heavy stage fed by a
low-partition source (one small parquet row group, a collected
dimension) must fan out first or it runs on one core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


#: Sources whose Catalyst-estimated size is below this are candidates
#: for fan-out (a small table usually means few row groups → few scan
#: partitions → idle cores in the downstream compute).
SMALL_SOURCE_BYTES = 1 << 30


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a DataFrame up to cluster parallelism IF Catalyst
    estimates it small; no-op (no shuffle) on large inputs — so this is
    safe to leave in 100 TB paths, where scans arrive with thousands of
    partitions and skip the extra shuffle entirely.

    Uses optimizer statistics (no job, no RDD conversion): an
    under-estimating stat only costs a tiny extra shuffle."""
    sc = df.sparkSession.sparkContext
    target = partitions or sc.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        size = SMALL_SOURCE_BYTES  # stats unavailable → assume small
    if size >= SMALL_SOURCE_BYTES:
        return df
    return df.repartition(target)
