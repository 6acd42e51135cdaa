"""Driver-side fixpoint iteration — the engine's cyclic-dataflow verb.

The reference supports cyclic stage graphs and terminates them by
quiescence detection (a global in-flight-record counter; reference
src/pipeline/sync.rs:10-52, wait-phase src/pipeline/mod.rs:357-396, and
the cyclic test tests/pipeline_tests.rs:145-208). Spark plans are DAGs,
so cycles live *above* Catalyst: a driver loop re-applies the cycle body
to a shrinking frontier DataFrame and stops when the frontier is empty —
the exact analogue of "zero records in flight".

Scale notes (100 TB):
- every iteration materializes through :func:`session.pin`, which
  truncates lineage so plans don't grow unboundedly. The default is
  ``localCheckpoint`` (fast, executor-local); call
  ``session.enable_reliable_checkpoints(spark, dir)`` before a long
  run to switch EVERY engine loop to reliable ``checkpoint()`` so an
  executor loss mid-iteration can't kill the job.
- The frontier stays distributed; nothing is collected to the driver.
  ``isEmpty`` is a cheap limit-1 job.
- ``max_iterations`` is a guard against non-contracting bodies, like the
  reference's users must guarantee termination themselves.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame

from async_pipes_spark.session import pin as _pin

DEFAULT_MAX_ITERATIONS = 200


def _materialize(df: DataFrame, eager: bool) -> DataFrame:
    # pin() both truncates lineage and caches the iteration result so
    # isEmpty + the next step don't recompute (localCheckpoint, or
    # reliable checkpoint when the session opted in).
    del eager  # always eager — lazy pins defeat the emptiness probe
    return _pin(df)


def iterate(
    initial: DataFrame,
    body: Callable[[DataFrame], DataFrame],
    max_iterations: int = DEFAULT_MAX_ITERATIONS,
) -> DataFrame:
    """Repeatedly apply ``body`` until it yields an empty frontier.

    Returns the union of every frontier (initial + all produced),
    mirroring a recursive CTE's result set.
    """
    frontier = _materialize(initial, eager=True)
    levels = [frontier]
    for _ in range(max_iterations):
        if frontier.isEmpty():
            break
        frontier = _materialize(body(frontier), eager=True)
        levels.append(frontier)
    else:
        raise RuntimeError(f"iterate did not converge in {max_iterations} iterations")
    return reduce(DataFrame.unionByName, levels)


def iterate_accumulate(
    initial: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    emit: Callable[[DataFrame], DataFrame],
    max_iterations: int = DEFAULT_MAX_ITERATIONS,
    checkpoint_every: int = 4,
    materialize_initial: bool = True,
) -> DataFrame:
    """Fixpoint loop that separates rows *leaving* the cycle from rows
    continuing around it — the shape of the reference's cyclic test
    (route-on-flag back upstream or out to the sink).

    Each iteration: ``emit(frontier)`` rows exit and are accumulated;
    ``step(frontier)`` rows continue. Terminates when the continuing
    frontier is empty; returns the union of all emitted rows.

    ``checkpoint_every`` unrolls that many lazy steps between
    materializations: the driver pays one checkpoint job + one
    emptiness probe per *block* instead of per step, which cuts
    sequential job latency ~k× (the dominant cost of short cheap
    iterations). Trailing steps past the true fixpoint are empty
    frames and union away to nothing.
    """
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    # a cheap-to-recompute initial frontier (e.g. a bare scan
    # projection) can skip its own checkpoint job — the first block's
    # materialization bounds lineage anyway
    frontier = _materialize(initial, eager=True) if materialize_initial else initial
    emitted = []
    steps_done = 0
    while True:
        cur = frontier
        for _ in range(checkpoint_every):
            emitted.append(emit(cur))
            cur = step(cur)
            steps_done += 1
        frontier = _materialize(cur, eager=True)
        if frontier.isEmpty():
            break
        if steps_done >= max_iterations:
            raise RuntimeError(
                f"iterate_accumulate did not converge in {max_iterations} iterations"
            )
    return reduce(DataFrame.unionByName, emitted)


def iterate_inplace(
    initial: DataFrame,
    body: Callable[[DataFrame], DataFrame],
    active: Callable[[DataFrame], "object"],
    max_iterations: int = DEFAULT_MAX_ITERATIONS,
    unroll: int = 16,
) -> DataFrame:
    """Fixpoint loop where every record stays in the frame and carries
    its own state to convergence — for cycle bodies that are elementwise
    (the reference's halving test shape, tests/pipeline_tests.rs:145-208).

    ``body`` must be a no-op on rows where ``active(df)`` is false
    (guard its expressions with ``F.when(active, ...)``). Terminates
    when no active rows remain; returns the converged frame.

    Compared to ``iterate_accumulate`` this emits ONE plan branch
    instead of one per level: ``unroll`` steps fuse into a single
    whole-stage-codegen chain, so a k-step fixpoint costs
    ceil(k/unroll) checkpoint jobs + as many emptiness probes + one
    final job — no per-level union, no per-level codegen compile.
    """
    cur = initial
    steps = 0
    while True:
        for _ in range(unroll):
            cur = body(cur)
        steps += unroll
        cur = _materialize(cur, eager=True)
        if cur.filter(active(cur)).isEmpty():
            return cur
        if steps >= max_iterations:
            raise RuntimeError(
                f"iterate_inplace did not converge in {max_iterations} iterations"
            )
