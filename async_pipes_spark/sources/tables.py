"""Parquet table sources for the driver-generated test data.

Plays the role of the reference's producers (``with_inputs`` /
``with_producer``, reference src/pipeline/builder.rs:41-119) for
file-backed data: a declarative ``spark.read`` whose scan Catalyst can
push filters/projection into. At 100 TB these would be partitioned
directories; the reader code is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from async_pipes_spark.session import ensure_engine_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: (applicationId, sf_dir, name) → DataFrame plan. A DataFrame is an
#: immutable lazy plan; caching it reuses the resolved file index and
#: schema across queries — the analogue of the oracle's pre-registered
#: DuckDB views (per-query relisting would bill fixed setup cost to
#: every query at any scale). OPT-IN (``SPARK_GRAFT_BLOCK_CACHE=1``,
#: set by bench.py over the immutable testdata): the pinned file
#: listing goes stale if the directory is rewritten mid-application.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


#: the ONE events ns→µs conversion, shared by the batch reader and the
#: streaming twin (stream_table) so they can never drift: exact integer
#: FLOOR division — bare `div` truncates toward zero, which would round
#: a pre-epoch nanosecond timestamp UP a microsecond relative to the
#: documented floor conversion (pmod is non-negative, so subtracting it
#: makes the dividend exactly divisible)
EVENTS_NS_TO_TS = "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table (cached plan per session).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark
    cannot represent; we read it as a nanosecond Long (legacy conf) and
    floor-convert to a microsecond TimestampType — the same truncation
    DuckDB's ``CAST(ts AS TIMESTAMP)`` performs, so oracle comparisons
    line up.
    """
    import os

    use_cache = os.environ.get("SPARK_GRAFT_BLOCK_CACHE") == "1"
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if use_cache:
        cached = _TABLE_CACHE.get(key)
        if cached is not None:
            return cached
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr(EVENTS_NS_TO_TS))
    df = normalize_ntz(df)
    if use_cache:
        _TABLE_CACHE[key] = df
    return df


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TimestampType (wall-clock
    identity under the engine's pinned UTC session tz).

    Belt-and-suspenders behind the INFER_NTZ conf in session.py: a
    caller-supplied session that ignores runtime conf changes still gets
    watermark-/unix_micros-compatible TimestampType columns.
    """
    ntz = [f.name for f in df.schema.fields if f.dataType.simpleString() == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view (SQL entry point)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
