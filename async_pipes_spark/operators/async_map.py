"""Bounded-concurrency async I/O stage — the engine's analogue of the
reference's per-stage ``max_task_count`` admission control (reference
src/pipeline/workers.rs:124-164: spawn into a JoinSet only while
``tasks.len() < max_task_count``), which exists for I/O-bound stage
closures like the README's web crawler (reference README.md:56-108).

Spark has no per-record concurrency primitive inside a task, so this
helper runs an asyncio event loop + semaphore inside each
``mapInPandas`` Arrow batch: up to ``max_task_count`` coroutine calls
in flight per task, times however many tasks the cluster runs — the
same two-level concurrency model as the reference (workers × tasks).
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from async_pipes_spark.pipeline.options import DEFAULT_MAX_TASK_COUNT


def async_map_in_pandas(
    df: DataFrame,
    fn: Callable[[dict[str, Any]], Awaitable[dict[str, Any] | None]],
    schema,
    max_task_count: int = DEFAULT_MAX_TASK_COUNT,
) -> DataFrame:
    """Apply an async per-record function with bounded concurrency.

    ``fn`` receives one record as a dict and returns an output dict, or
    ``None`` to drop the record (the reference's map+filter fusion,
    builder.rs:194-196). Output columns must match ``schema`` (a DDL
    string or a ``StructType``).
    """
    if max_task_count <= 0:
        raise ValueError("max task count must be greater than zero")

    if hasattr(schema, "fieldNames"):
        field_names = list(schema.fieldNames())
    else:
        # parse the DDL properly — naive comma-splitting miscounts
        # fields for nested generics like array<struct<x:int,y:int>>
        from pyspark.sql.types import StructType

        field_names = list(StructType.fromDDL(schema).fieldNames())

    def run_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def run_batch(records: list[dict]) -> list[dict]:
            sem = asyncio.Semaphore(max_task_count)

            async def guarded(rec: dict):
                async with sem:
                    return await fn(rec)

            results = await asyncio.gather(*(guarded(r) for r in records))
            return [r for r in results if r is not None]

        for pdf in it:
            out = asyncio.run(run_batch(pdf.to_dict("records")))
            # empty fallback columns must be object-typed: a default
            # float64 empty column can't Arrow-cast to list/struct types
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {name: pd.Series([], dtype="object") for name in field_names}
            )

    return df.mapInPandas(run_batches, schema)
