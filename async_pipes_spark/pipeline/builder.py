"""Fluent dataflow builder — the engine's analogue of the reference's
``PipelineBuilder`` (reference src/pipeline/builder.rs).

Pipes are named DataFrame slots; stages are declarative DataFrame
transforms. Nothing executes until :meth:`PipelineBuilder.build` (graph
validation, ≙ reference build(), builder.rs:419-442) and
:meth:`Pipeline.wait` (execution to quiescence, ≙ reference wait(),
mod.rs:357-396).

API parity map (reference → here):

- ``with_inputs(pipe, vec)`` (builder.rs:41-53) → static rows /
  DataFrame source
- ``with_branching_inputs(pipes, tuples)`` (builder.rs:81-90) → tuple
  slot *i* feeds pipe *i*
- ``with_producer(pipe, task)`` (builder.rs:104-119) → callable pulled
  until ``None`` (driver-side), a DataFrame, or a callable returning a
  (possibly streaming) DataFrame
- ``with_branching_producer(pipes, task)`` (builder.rs:144-156)
- ``with_stage(in, out, task)`` (builder.rs:202-224) → df→df transform;
  map+filter fused (return fewer rows to "drop")
- ``with_branching_stage(in, outs, task)`` (builder.rs:251-282) →
  task runs on a persisted input once; returns one DataFrame (or
  ``NoOutput``) per output pipe
- ``with_consumer(pipe, task)`` (builder.rs:169-183) → terminal action
- ``with_flattener(from, to)`` (builder.rs:336-364) → explode
- ``also(fn)`` (builder.rs:406-408) → composition
- ``build()`` errors use the reference's exact messages
  ("pipeline must have at least one producer" builder.rs:508-510;
  "pipeline has open-ended pipe: '{name}'" mod.rs:417;
  "reader was already used" mod.rs:408).

Cyclic graphs are first-class (reference README.md:12-13): build()
computes stage SCCs and the runtime executes non-trivial SCCs as a
driver-side fixpoint loop (see pipeline.pipeline).
"""

from __future__ import annotations

import asyncio
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from async_pipes_spark.pipeline.options import WorkerOptions


class PipelineBuildError(ValueError):
    """Raised by build() on an invalid graph (reference returns
    Err(String) from build, builder.rs:419-442)."""


class _NoOutput:
    """Sentinel: a branching task produces nothing for that pipe this
    round (reference ``NoOutput`` marker, src/lib.rs:316-317)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "NoOutput"


NoOutput = _NoOutput()


@dataclass
class Stage:
    kind: str  # producer | stage | branching_stage | consumer | flattener
    inputs: tuple[str, ...]
    outputs: tuple[str, ...]
    task: Any
    options: WorkerOptions = field(default_factory=WorkerOptions)
    name: str = ""


def _rows_to_tuples(values: Sequence[Any]) -> list[tuple]:
    return [v if isinstance(v, tuple) else (v,) for v in values]


def _sync_pull(coro_fn: Callable[[], Any]) -> Callable[[], Any]:
    """Adapt an ``async def`` pull closure to the sync pull protocol.

    The reference's producer tasks are async fns driven by its runtime
    (builder.rs:104-119); here the driver-side pull loop is synchronous,
    so each pull runs the coroutine to completion on a private loop.
    Parity/testing path only — scale producers are (streaming)
    DataFrames, and async PER-RECORD work belongs in an async stage
    (operators.async_map), which runs coroutines concurrently inside
    executor tasks."""

    def pull():
        return asyncio.run(coro_fn())

    return pull


class PipelineBuilder:
    """Accumulates stage declarations; see module docstring."""

    def __init__(self, spark: SparkSession | None = None):
        self._spark = spark
        self._stages: list[Stage] = []

    # ---- sources -------------------------------------------------

    def with_inputs(self, pipe: str, inputs: Sequence[Any] | DataFrame, schema: Any = "value: bigint"):
        """Static source: a finite set of values into one pipe
        (reference builder.rs:41-53). Scalars become single-column
        ``value`` rows; tuples become multi-column rows (pass a schema).
        A DataFrame is used as-is (the file-backed form: spark.read)."""
        if isinstance(inputs, DataFrame):
            task = ("dataframe", inputs)
        else:
            task = ("rows", _rows_to_tuples(inputs), schema)
        self._stages.append(Stage("producer", (), (pipe,), task, name=f"inputs:{pipe}"))
        return self

    def with_branching_inputs(self, pipes: Sequence[str], inputs: Sequence[Sequence[Any]], schemas: Sequence[Any] | None = None):
        """Static multi-source: slot *i* of every input tuple goes to
        pipe *i* (reference builder.rs:81-90)."""
        pipes = list(pipes)
        schemas = list(schemas) if schemas is not None else ["value: bigint"] * len(pipes)
        for i, pipe in enumerate(pipes):
            slot = [row[i] for row in inputs]
            self.with_inputs(pipe, slot, schemas[i])
        return self

    def with_producer(self, pipe: str, task: Callable[..., Any] | DataFrame, schema: Any = "value: bigint"):
        """Dynamic source (reference builder.rs:104-119). Accepts:
        a DataFrame (batch or streaming); a zero-arg callable returning
        a DataFrame; or a zero-arg callable — sync or ``async def``,
        matching the reference's async producer closures
        (builder.rs:104-119) — yielding one value per call with ``None``
        terminating (the reference's exact pull protocol — driver-side,
        for parity/testing; use file/stream sources at scale)."""
        if asyncio.iscoroutinefunction(task):
            task = _sync_pull(task)
        self._stages.append(
            Stage("producer", (), (pipe,), ("producer", task, schema), name=f"producer:{pipe}")
        )
        return self

    def with_branching_producer(self, pipes: Sequence[str], task: Callable[..., Any], schemas: Sequence[Any] | None = None):
        """Dynamic multi-output source (reference builder.rs:144-156):
        ``task()`` returns a list with one entry per pipe (``None`` /
        ``NoOutput`` skips that pipe this round) or ``None`` to stop.
        ``async def`` closures accepted as in :meth:`with_producer`."""
        if asyncio.iscoroutinefunction(task):
            task = _sync_pull(task)
        pipes = tuple(pipes)
        schemas = tuple(schemas) if schemas is not None else tuple("value: bigint" for _ in pipes)
        self._stages.append(
            Stage(
                "producer",
                (),
                pipes,
                ("branching_producer", task, schemas),
                name=f"producer:{'|'.join(pipes)}",
            )
        )
        return self

    # ---- transforms ----------------------------------------------

    def with_stage(self, input_pipe: str, output_pipe: str, task: Callable[..., Any], options: WorkerOptions | None = None, schema: Any = None):
        """Map+filter fused, 1 pipe → 1 pipe (reference
        builder.rs:202-224): ``task`` is a DataFrame→DataFrame transform
        (drop rows to express the reference's ``None`` return).

        An ``async def`` task is accepted natively, mirroring the
        reference's async stage closures (builder.rs:202-224): it is
        treated as a PER-RECORD coroutine ``dict -> dict | None``
        (``None`` drops the record — the same map+filter fusion) and
        routed through the bounded-concurrency Arrow kernel
        (operators.async_map), with ``options.max_task_count`` as the
        per-task in-flight limit — the reference's admission control
        (workers.rs:139). ``schema`` names the output schema for async
        tasks (defaults to the input pipe's schema)."""
        if asyncio.iscoroutinefunction(task):
            opts = options or WorkerOptions()
            record_fn, out_schema = task, schema

            def task(df: DataFrame, _fn=record_fn, _schema=out_schema, _opts=opts):
                from async_pipes_spark.operators.async_map import async_map_in_pandas

                return async_map_in_pandas(
                    df, _fn, _schema or df.schema, max_task_count=_opts.max_task_count
                )

        self._stages.append(
            Stage(
                "stage",
                (input_pipe,),
                (output_pipe,),
                task,
                options or WorkerOptions(),
                name=f"stage:{input_pipe}->{output_pipe}",
            )
        )
        return self

    def with_branching_stage(self, input_pipe: str, output_pipes: Sequence[str], task: Callable[[DataFrame], Sequence[DataFrame | None]], options: WorkerOptions | None = None):
        """Route/multicast 1 → 0..N (reference builder.rs:251-282).
        The input is persisted and ``task`` called once; it returns one
        DataFrame (or None/NoOutput) per output pipe — both multicast
        (copy to all) and routing (one Some) are expressible."""
        self._stages.append(
            Stage(
                "branching_stage",
                (input_pipe,),
                tuple(output_pipes),
                task,
                options or WorkerOptions(),
                name=f"branch:{input_pipe}",
            )
        )
        return self

    def with_consumer(self, pipe: str, task: Callable[[DataFrame], Any], options: WorkerOptions | None = None):
        """Terminal sink (reference builder.rs:169-183): an action on
        the pipe's DataFrame; its return value is exposed in
        ``Pipeline.wait()`` results keyed by pipe name. An ``async def``
        task (reference consumers are async fns, builder.rs:169-183) is
        run to completion on a private loop at consume time."""
        if asyncio.iscoroutinefunction(task):
            consumer_fn = task

            def task(df: DataFrame, _fn=consumer_fn):
                return asyncio.run(_fn(df))

        self._stages.append(
            Stage("consumer", (pipe,), (), task, options or WorkerOptions(), name=f"consumer:{pipe}")
        )
        return self

    def with_flattener(self, from_pipe: str, to_pipe: str, column: str = "value", positions: bool = False, pos_column: str = "pos"):
        """Explode an array, map, or string column, 1 record → M
        (reference builder.rs:336-364, which flattens any
        ``IntoIterator``): arrays explode to elements, maps to
        (key, value) rows, strings to characters (String is
        IntoIterator<char>). Other iterables must first be represented
        as ArrayType columns — the engine's schema-first stance, e.g.
        ``F.split`` for string→tokens.

        ``positions=True`` preserves each element's index within its
        source record as ``pos_column`` (``posexplode``) — the ordering
        information the reference's in-order channel delivery carries
        implicitly and a distributed explode otherwise loses."""
        self._stages.append(
            Stage(
                "flattener",
                (from_pipe,),
                (to_pipe,),
                (column, positions, pos_column),
                name=f"flatten:{from_pipe}->{to_pipe}",
            )
        )
        return self

    def also(self, handler: Callable[["PipelineBuilder"], "PipelineBuilder"]):
        """Builder composition (reference builder.rs:406-408)."""
        return handler(self)

    # ---- build ---------------------------------------------------

    def build(self) -> "Pipeline":
        """Validate the graph and return a runnable Pipeline.

        Mirrors the reference's build-time contract (builder.rs:419-442):
        ≥1 producer; every written pipe has a reader; one reader per
        pipe. Execution stays lazy until wait()/run().
        """
        from async_pipes_spark.pipeline.pipeline import Pipeline

        producers = [s for s in self._stages if s.kind == "producer"]
        if not producers:
            raise PipelineBuildError("pipeline must have at least one producer")

        readers: dict[str, Stage] = {}
        for s in self._stages:
            for p in s.inputs:
                if p in readers:
                    raise PipelineBuildError("reader was already used")
                readers[p] = s

        written = {p for s in self._stages for p in s.outputs}
        for p in sorted(written):
            if p not in readers:
                raise PipelineBuildError(f"pipeline has open-ended pipe: '{p}'")
        for p in sorted(readers):
            if p not in written:
                raise PipelineBuildError(f"pipe '{p}' has no writers")

        spark = self._spark or SparkSession.getActiveSession()
        if spark is None:
            raise PipelineBuildError("no SparkSession: pass one to PipelineBuilder(spark)")
        return Pipeline(spark, list(self._stages))
