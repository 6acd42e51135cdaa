"""File sinks — the terminal side of ``with_consumer`` for persistent
outputs (the reference's consumers are side-effecting closures,
reference src/pipeline/builder.rs:169-183; here they become
``df.write`` with scale-aware layout controls).

Layout knobs that matter at 100 TB:

- ``partition_by``: directory partitioning on low-cardinality keys →
  downstream partition pruning.
- ``bucket_by``: pre-shuffled, co-located layout on a join/agg key —
  downstream joins on that key skip their shuffle entirely (requires
  ``saveAsTable``).
- ``target_file_rows``: coalesce/repartition so output files land near
  a target size instead of one-file-per-task dust.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    repartition: int | None = None,
) -> None:
    """Write a DataFrame to files (parquet/csv/json/orc)."""
    if repartition:
        df = df.repartition(repartition, *(partition_by or []))
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table: joins
    and aggregations on ``bucket_cols`` against other tables bucketed
    the same way run shuffle-free."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> None:
    """Keyed upsert into a parquet directory (MERGE semantics without a
    table format): rows in ``updates`` replace target rows with the
    same key; unmatched target rows survive; new keys append. This is
    copy-on-write — the standard pattern for lakes without Delta/
    Iceberg: target rows NOT matching any update key (left_anti on the
    key) union the updates, rewritten atomically via a staging
    directory + rename.

    Scale notes: the anti-join shuffles on the key unless the update
    set is broadcastable (it usually is — updates are small relative to
    the lake; Spark's AQE broadcasts under the threshold
    automatically). With ``partition_by``, production deployments
    should prune the rewrite to only the partitions present in
    ``updates`` (dynamic partition overwrite) — here the whole
    directory rewrite keeps the helper format-agnostic and the test
    corpus small.
    """
    import os
    import shutil
    import uuid

    existing = spark.read.parquet(target_path)
    missing = set(updates.columns) ^ set(existing.columns)
    if missing:
        raise ValueError(f"update schema mismatch on columns: {sorted(missing)}")
    keep = existing.join(updates.select(*key_cols), list(key_cols), "left_anti")
    merged = keep.unionByName(updates)

    staging = f"{target_path}__staging_{uuid.uuid4().hex[:8]}"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    backup = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, backup)
    os.rename(staging, target_path)
    shutil.rmtree(backup)


def compact_small_files(
    spark,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Compact a parquet directory's small-file dust into
    ~``target_rows_per_file`` files (the maintenance job every
    streaming/append lake needs: availableNow micro-batches and
    per-trigger appends leave thousands of KB-sized files whose
    open/footer cost eventually dominates scans). Returns the new file
    count. Copy-on-write via staging + rename, like merge_upsert."""
    import math
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    n = df.count()
    files = max(1, math.ceil(n / target_rows_per_file))
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    df.repartition(files).write.mode("overwrite").parquet(staging)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet") and f.startswith("part-")
    )
