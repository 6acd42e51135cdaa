"""Partitioning helpers — the engine's replacement for the reference's
per-stage worker-count knobs (WorkerOptions.max_task_count,
reference src/pipeline/mod.rs:50-105): on Spark, parallelism is
partitions × executor slots, so a compute-heavy stage fed by a
low-partition source (one small parquet row group, a collected
dimension) must fan out first or it runs on one core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a DataFrame up to cluster parallelism IF it is
    under-partitioned; no-op (no shuffle) when the input already has
    enough partitions — so this is safe to leave in 100 TB paths, where
    scans arrive with thousands of partitions and skip the extra
    shuffle entirely.

    The signal is the plan's actual partition count (public
    ``df.rdd.getNumPartitions()`` — plan conversion only, no job): the
    problem fan_out solves IS low partition count feeding a
    compute-heavy stage, so measuring partitions directly beats
    guessing from size statistics.

    STREAMING frames pass through untouched: ``df.rdd`` is undefined
    on a stream, and micro-batch parallelism is the source's
    per-trigger split (maxFilesPerTrigger / offset ranges), so the
    kernels downstream (simhash, shingles, winnow) run unchanged on
    streams without a repartition that would force a per-batch
    shuffle."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        current = 1  # conversion unavailable → assume under-partitioned
    if current >= target:
        return df
    return df.repartition(target)
