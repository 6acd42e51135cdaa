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

import uuid

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


#: closure → registered source name (the closure object is the key, so
#: it stays alive with its registration). Spark's DataSource registry
#: has no unregister API, so every distinct closure costs one
#: registration for the session's lifetime; re-registering the SAME
#: closure object (producers built in a loop around one fn) reuses its
#: name instead of leaking a new entry per call.
_NAME_BY_CLOSURE: dict[object, str] = {}


def _unique_name(prefix: str, key) -> str:
    """A registry name per (closure, parameterization). DataSource
    registration is name-keyed and LAST-WRITE-WINS: under one fixed
    name, creating a second producer rebinds the name, and a first
    stream that hasn't started yet silently reads the SECOND
    producer's closure. A uuid suffix gives every distinct
    (fn, params) its own binding; the memo bounds registry growth by
    distinct configurations, not call count. The params belong in the
    key because the registered class closes over them — reusing the
    name for the same fn at a different batch size would rebind that
    too."""
    name = _NAME_BY_CLOSURE.get(key)
    if name is None:
        name = f"{prefix}_{uuid.uuid4().hex[:12]}"
        _NAME_BY_CLOSURE[key] = name
    return name


def make_producer_datasource(
    fn: Callable[[int, int], Iterator[tuple]],
    num_partitions: int = 1,
    label: str = "",
):
    """Build a DataSource class around a partitioned generator fn.
    ``label`` (the caller's pipe/source name) becomes part of the
    registered name — visible in the registry/plans — and of the memo
    key, so two sources built around the same closure under DIFFERENT
    names keep separate registrations."""

    import re

    safe = re.sub(r"[^A-Za-z0-9_]", "_", label)
    prefix = f"async_pipes_producer_{safe}" if safe else "async_pipes_producer"
    source_name = _unique_name(prefix, (fn, num_partitions, label))

    class _Reader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(num_partitions)]

        def read(self, partition: InputPartition):
            return fn(partition.value, num_partitions)

    class ProducerDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return source_name

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
    DataFrame. ``name`` labels the registration (it is suffixed with a
    uuid — registration is name-keyed and last-write-wins, so a bare
    user name could be silently rebound by a second producer)."""
    cls = make_producer_datasource(fn, num_partitions, label=name)
    spark.dataSource.register(cls)
    return (
        spark.read.format(cls.name())
        .option("producer_schema", schema)
    )


def make_stream_producer_datasource(
    fn: Callable[[int], tuple | None],
    rows_per_batch: int = 30,
):
    """Streaming DataSource around an INDEXED pull closure — the true
    analogue of the reference's infinite ``with_producer`` closures
    (src/pipeline/builder.rs:96-98: an async closure pulled forever),
    mapped onto Structured Streaming's offset/commit protocol.

    Contract: ``fn(i)`` deterministically returns row-tuple *i*, or
    ``None`` for end-of-stream (an infinite producer never returns
    None). Determinism per index is what makes the source REPLAYABLE —
    ``readBetweenOffsets`` re-produces any committed range after a
    restart, giving exactly-once delivery through the checkpoint, where
    the reference's in-memory channels simply lose the pipe on crash.

    ``rows_per_batch`` is the producer-side backpressure knob: at most
    that many pulls are admitted per micro-batch — the direct analogue
    of the reference's bounded pipe buffer (mod.rs:25), on the producer
    itself rather than the file source (cf. streaming.run.stream_table).
    """

    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    source_name = _unique_name("async_pipes_stream_producer", (fn, rows_per_batch))

    class _StreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self) -> dict:
            return {"index": 0}

        def _pull_range(self, start: int, end: int):
            for i in range(start, end):
                row = fn(i)
                if row is None:
                    return
                yield row if isinstance(row, tuple) else (row,)

        def read(self, start: dict):
            lo = start["index"]
            rows = list(self._pull_range(lo, lo + rows_per_batch))
            return iter(rows), {"index": lo + len(rows)}

        def readBetweenOffsets(self, start: dict, end: dict):
            return self._pull_range(start["index"], end["index"])

    class StreamProducerDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return source_name

        def schema(self):
            return self.options["producer_schema"]

        def simpleStreamReader(self, schema):
            return _StreamReader()

    return StreamProducerDataSource


def stream_producer_source(
    spark: SparkSession,
    fn: Callable[[int], tuple | None],
    schema: str,
    options=None,
):
    """Register and load an unbounded executor-driven producer as a
    streaming DataFrame. ``options.pipe_buffer_size`` (WorkerOptions)
    bounds rows per micro-batch; default 30 = the reference's default
    pipe buffer (src/pipeline/mod.rs:25)."""
    rows_per_batch = options.pipe_buffer_size if options is not None else 30
    cls = make_stream_producer_datasource(fn, rows_per_batch)
    spark.dataSource.register(cls)
    return (
        spark.readStream.format(cls.name())
        .option("producer_schema", schema)
        .load()
    )
