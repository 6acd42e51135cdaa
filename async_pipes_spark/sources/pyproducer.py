"""Executor-side dynamic producers via the Spark 4 Python DataSource
API — the scale path for the reference's ``with_producer`` closures
(reference src/pipeline/builder.rs:104-119: an async closure pulled
until ``None``, possibly infinite).

The builder's driver-side pull loop (Pipeline._materialize_producer) is
faithful but driver-bound; this source runs the generator ON THE
EXECUTORS, one generator instance per partition, so a dynamic source
can produce billions of rows without touching the driver.

Usage::

    source = producer_source(
        spark, "gen",
        fn=lambda part, n_parts: ((part * 1000 + i,) for i in range(1000)),
        schema="value bigint",
        num_partitions=32,
    )
    df = source.load()

``fn(partition_index, num_partitions)`` returns an iterator of row
tuples; it is cloudpickled to executors (closures allowed, Spark
objects not).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_REGISTERED: set[tuple[str, str]] = set()


def make_producer_datasource(
    fn: Callable[[int, int], Iterator[tuple]],
    num_partitions: int = 1,
):
    """Build a DataSource class around a partitioned generator fn."""

    class _Reader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(num_partitions)]

        def read(self, partition: InputPartition):
            return fn(partition.value, num_partitions)

    class ProducerDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "async_pipes_producer"

        def schema(self):
            return self.options["producer_schema"]

        def reader(self, schema):
            return _Reader()

    return ProducerDataSource


def producer_source(
    spark: SparkSession,
    name: str,
    fn: Callable[[int, int], Iterator[tuple]],
    schema: str,
    num_partitions: int = 1,
):
    """Register and return a reader for an executor-side producer.
    Returns ``spark.read``-style loader: call ``.load()`` for the
    DataFrame."""
    cls = make_producer_datasource(fn, num_partitions)
    spark.dataSource.register(cls)
    return (
        spark.read.format("async_pipes_producer")
        .option("producer_schema", schema)
    )
