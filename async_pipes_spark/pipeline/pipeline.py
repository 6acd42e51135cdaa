"""Pipeline runtime: lazy graph → Spark execution to quiescence.

Replaces the reference's entire runtime machinery (workers, channels,
synchronizer — reference src/pipeline/workers.rs, io.rs, sync.rs) with
Spark's scheduler:

- acyclic regions execute as ordinary lazy DataFrame composition in
  topological order (Catalyst sees the whole plan and optimizes across
  stage boundaries — something the reference's opaque closures forbid);
- cyclic regions (stage SCCs) run as a driver-side fixpoint loop whose
  empty-frontier termination is the analogue of the reference's
  zero-in-flight-records quiescence (src/pipeline/sync.rs:44-46,
  mod.rs:371-381);
- ``wait()`` executes consumers (actions) and returns their results —
  the reference's run-to-completion wait() (mod.rs:357-396).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from async_pipes_spark.session import pin as _pin


from async_pipes_spark.pipeline.builder import NoOutput, Stage

MAX_CYCLE_ITERATIONS = 1000
#: Driver-side pull-protocol producers are for parity/testing with
#: BOUNDED closures; an unbounded closure must use the streaming path
#: (reference's infinite with_producer ≙ readStream, builder.rs:96-98).
#: The cap turns the would-be hang into an actionable error.
MAX_PRODUCER_PULLS = 1_000_000


def _tarjan_sccs(n: int, edges: dict[int, set[int]]) -> list[list[int]]:
    """Stage SCCs in reverse topological order (iterative Tarjan)."""
    index = [None] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    sccs: list[list[int]] = []
    counter = 0
    for root in range(n):
        if index[root] is not None:
            continue
        work = [(root, iter(sorted(edges.get(root, ()))))]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if index[w] is None:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, iter(sorted(edges.get(w, ())))))
                    advanced = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    scc.append(w)
                    if w == v:
                        break
                sccs.append(scc)
    return sccs


def _union_all(dfs: list[DataFrame]) -> DataFrame | None:
    dfs = [d for d in dfs if d is not None]
    if not dfs:
        return None
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


class Pipeline:
    """A validated, runnable dataflow graph. Create via
    ``PipelineBuilder.build()``."""

    def __init__(self, spark: SparkSession, stages: list[Stage]):
        self._spark = spark
        self._stages = stages
        self._contrib: dict[str, list[DataFrame]] = {}
        self._results: dict[str, Any] = {}
        self._persisted: list[DataFrame] = []
        self._ran = False

    # ---- producer materialization --------------------------------

    def _materialize_producer(self, stage: Stage) -> None:
        kind = stage.task[0]
        if kind == "rows":
            _, rows, schema = stage.task
            df = self._spark.createDataFrame(rows, schema)
            self._contrib.setdefault(stage.outputs[0], []).append(df)
        elif kind == "dataframe":
            self._contrib.setdefault(stage.outputs[0], []).append(stage.task[1])
        elif kind == "producer":
            _, task, schema = stage.task
            if isinstance(task, DataFrame):
                df = task
            else:
                produced = task()
                if isinstance(produced, DataFrame):
                    df = produced
                else:
                    # reference pull protocol (builder.rs:96-98): call
                    # until None. Driver-side — parity/testing only.
                    values = []
                    while produced is not None:
                        values.append(produced if isinstance(produced, tuple) else (produced,))
                        if len(values) > MAX_PRODUCER_PULLS:
                            raise RuntimeError(
                                f"producer for pipe '{stage.outputs[0]}' exceeded "
                                f"{MAX_PRODUCER_PULLS} pulls without terminating; the "
                                "driver-side pull protocol is for bounded closures — "
                                "pass a streaming DataFrame (streaming.run.stream_table "
                                "/ spark.readStream) for unbounded sources"
                            )
                        produced = task()
                    df = self._spark.createDataFrame(values, schema)
            self._contrib.setdefault(stage.outputs[0], []).append(df)
        elif kind == "branching_producer":
            _, task, schemas = stage.task
            buckets: list[list[tuple]] = [[] for _ in stage.outputs]
            pulls = 0
            round_vals = task()
            while round_vals is not None:
                # same termination cap as the single-pipe pull loop:
                # a non-terminating closure must fail actionably, not
                # hang the driver accumulating buckets
                pulls += 1
                if pulls > MAX_PRODUCER_PULLS:
                    raise RuntimeError(
                        f"branching producer for pipes {stage.outputs} "
                        f"exceeded {MAX_PRODUCER_PULLS} pulls without "
                        "terminating; the driver-side pull protocol is "
                        "for bounded closures — use streaming sources "
                        "for unbounded production"
                    )
                # a round must name every output pipe (None/NoOutput to
                # skip one): a short list would silently starve the
                # trailing pipes, a long one would IndexError obscurely
                if len(round_vals) != len(stage.outputs):
                    raise ValueError(
                        f"branching producer returned {len(round_vals)} "
                        f"values for {len(stage.outputs)} pipes "
                        f"{stage.outputs}; every round must provide one "
                        "value (or None/NoOutput) per pipe"
                    )
                for i, v in enumerate(round_vals):
                    if v is None or v is NoOutput:
                        continue
                    buckets[i].append(v if isinstance(v, tuple) else (v,))
                round_vals = task()
            for pipe, rows, schema in zip(stage.outputs, buckets, schemas):
                self._contrib.setdefault(pipe, []).append(
                    self._spark.createDataFrame(rows, schema)
                )
        else:  # pragma: no cover
            raise AssertionError(f"unknown producer kind {kind}")

    # ---- stage application ---------------------------------------

    def _apply_stage(self, stage: Stage, in_df: DataFrame) -> dict[str, DataFrame]:
        """Run one non-producer stage; returns {pipe: contribution}."""
        out: dict[str, DataFrame] = {}
        if stage.kind == "stage":
            df = stage.task(in_df)
            if stage.options.partitions:
                df = df.repartition(stage.options.partitions)
            out[stage.outputs[0]] = df
        elif stage.kind == "branching_stage":
            # reference computes the task once then fans out
            # (builder.rs:251-282): persist so branches don't recompute.
            if not in_df.isStreaming:
                in_df = in_df.persist()
                self._persisted.append(in_df)
            branch_dfs = stage.task(in_df)
            if len(branch_dfs) != len(stage.outputs):
                raise ValueError(
                    f"branching stage produced {len(branch_dfs)} outputs, expected {len(stage.outputs)}"
                )
            for pipe, df in zip(stage.outputs, branch_dfs):
                if df is None or df is NoOutput:
                    continue
                out[pipe] = df
        elif stage.kind == "flattener":
            from pyspark.sql import functions as F

            col, positions, pos_col = (
                stage.task if isinstance(stage.task, tuple) else (stage.task, False, "pos")
            )
            others = [c for c in in_df.columns if c != col]
            dtype = dict(in_df.dtypes).get(col, "")
            if dtype == "string":
                # String IS IntoIterator<Item=char> in the reference
                # (builder.rs:336-364 flattens any iterable): explode
                # to one character per record. split('','') yields ['']
                # in Spark, but '' iterates to ZERO chars — map empties
                # to an empty array so they contribute no rows.
                in_df = in_df.withColumn(
                    col,
                    F.when(
                        F.length(col) == 0, F.array().cast("array<string>")
                    ).otherwise(F.split(F.col(col), "")),
                )
                dtype = "array<string>"
            is_map = dtype.startswith("map")
            if positions:
                exploded = F.posexplode(col)
                aliases = (pos_col, "key", "value") if is_map else (pos_col, col)
                out[stage.outputs[0]] = in_df.select(*others, exploded.alias(*aliases))
            elif is_map:
                # map iterables explode to (key, value) rows
                out[stage.outputs[0]] = in_df.select(
                    *others, F.explode(col).alias("key", "value")
                )
            else:
                out[stage.outputs[0]] = in_df.withColumn(col, F.explode(col))
        elif stage.kind == "consumer":
            self._results[stage.inputs[0]] = stage.task(in_df)
        else:  # pragma: no cover
            raise AssertionError(f"unknown stage kind {stage.kind}")
        return out

    # ---- execution -----------------------------------------------

    def wait(self) -> dict[str, Any]:
        """Execute to quiescence; returns {pipe: consumer result}."""
        if self._ran:
            raise RuntimeError("pipeline already ran")
        self._ran = True

        stages = self._stages
        reader_of: dict[str, int] = {}
        for i, s in enumerate(stages):
            for p in s.inputs:
                reader_of[p] = i
        edges: dict[int, set[int]] = {i: set() for i in range(len(stages))}
        for i, s in enumerate(stages):
            for p in s.outputs:
                if p in reader_of:
                    edges[i].add(reader_of[p])

        sccs = _tarjan_sccs(len(stages), edges)  # reverse topo order
        try:
            for scc in reversed(sccs):
                if len(scc) == 1 and scc[0] not in edges[scc[0]]:
                    self._run_single(stages[scc[0]])
                else:
                    self._run_cycle([stages[i] for i in sorted(scc)])
        finally:
            for df in self._persisted:
                df.unpersist(blocking=False)
        return dict(self._results)

    # reference naming: wait() consumes the pipeline (mod.rs:357-396)
    run = wait

    def _pipe_df(self, pipe: str) -> DataFrame | None:
        return _union_all(self._contrib.get(pipe, []))

    def _run_single(self, stage: Stage) -> None:
        if stage.kind == "producer":
            self._materialize_producer(stage)
            return
        in_df = self._pipe_df(stage.inputs[0])
        if in_df is None:
            return
        for pipe, df in self._apply_stage(stage, in_df).items():
            self._contrib.setdefault(pipe, []).append(df)

    def _run_cycle(self, scc_stages: list[Stage]) -> None:
        """Fixpoint execution of a cyclic stage group.

        Frontier = per-pipe batch of not-yet-consumed records; each
        iteration consumes every frontier and produces the next one.
        Terminates when all frontiers are empty — the analogue of the
        reference synchronizer's zero-in-flight quiescence
        (src/pipeline/sync.rs:44-46). localCheckpoint keeps lineage flat
        (on a multi-node cluster, swap for checkpoint()).
        """
        internal_pipes = {p for s in scc_stages for p in s.inputs}
        # a consumer can never be here: SCC membership (or a self-loop)
        # requires an outgoing edge, and consumers have no outputs —
        # assert the invariant rather than carry dead accumulate-and-
        # run machinery for an impossible case
        assert all(s.kind != "consumer" for s in scc_stages), scc_stages

        frontier: dict[str, DataFrame] = {}
        for p in internal_pipes:
            df = self._pipe_df(p)
            if df is not None:
                frontier[p] = df.transform(_pin)

        for _ in range(MAX_CYCLE_ITERATIONS):
            live = {p: df for p, df in frontier.items() if not df.isEmpty()}
            if not live:
                break
            nxt: dict[str, list[DataFrame]] = {}
            for stage in scc_stages:
                in_df = live.get(stage.inputs[0]) if stage.inputs else None
                if in_df is None:
                    continue
                for pipe, df in self._apply_stage(stage, in_df).items():
                    if pipe in internal_pipes:
                        nxt.setdefault(pipe, []).append(df)
                    else:
                        self._contrib.setdefault(pipe, []).append(
                            df.transform(_pin)
                        )
            frontier = {
                p: _union_all(dfs).transform(_pin) for p, dfs in nxt.items()
            }
        else:
            raise RuntimeError(
                f"cyclic pipeline did not quiesce in {MAX_CYCLE_ITERATIONS} iterations"
            )

    @staticmethod
    def builder(spark: SparkSession | None = None):
        """Entry point (reference mod.rs:341-343)."""
        from async_pipes_spark.pipeline.builder import PipelineBuilder

        return PipelineBuilder(spark)
