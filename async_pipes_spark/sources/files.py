"""Generic file connectors (read side) — the engine's file-backed
producers. The reference has no storage layer at all (data enters via
in-memory closures, reference src/pipeline/builder.rs:41-119); an
analytics engine needs real connectors, so these wrap Spark's readers
with the engine's conventions:

- schemas are explicit by default (no inference job; inference on
  100 TB of JSON/CSV is a full extra scan);
- every reader returns a lazy DataFrame usable as a pipe source
  (``with_producer(pipe, df)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from async_pipes_spark.session import ensure_engine_confs


def read_parquet(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    ensure_engine_confs(spark)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    ensure_engine_confs(spark)
    reader = spark.read.option("header", str(header).lower()).option("delimiter", delimiter)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # small/dev data only
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON scan. With ``schema=None`` Spark runs a FULL inference
    pass over the data before the real read — small/dev data only;
    always pass a schema for corpus-scale inputs."""
    ensure_engine_confs(spark)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet (both
    columnar with embedded min/max stats; Catalyst treats them alike)."""
    ensure_engine_confs(spark)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan: one `value: string` row per line — the
    raw-corpus ingest format (each line a document/record to parse
    downstream with the engine's text/JSON functions)."""
    ensure_engine_confs(spark)
    return spark.read.text(path)
