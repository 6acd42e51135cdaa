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
