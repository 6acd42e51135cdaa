"""Micro-fixtures M1-M14 (FIXTURES.md §2): the reference's own test
inputs and hand-computed golden outputs, replayed through the engine's
Pipeline builder. Citations refer to /root/reference."""

import pytest
from pyspark.sql import functions as F

from async_pipes_spark import NoOutput, Pipeline, PipelineBuilder, PipelineBuildError


def _sum_consumer(col="value"):
    return lambda df: df.agg(F.sum(col)).head()[0]


def test_m1_map_reduce_sum_of_lengths(spark):
    """README map-reduce (src/lib.rs:452-481): append '!', sum lengths = 9."""
    res = (
        Pipeline.builder(spark)
        .with_inputs("MapPipe", ["a", "bb", "ccc"], "value: string")
        .with_stage(
            "MapPipe",
            "ReducePipe",
            lambda df: df.select(F.concat("value", F.lit("!")).alias("value")),
        )
        .with_consumer("ReducePipe", lambda df: df.agg(F.sum(F.length("value"))).head()[0])
        .build()
        .wait()
    )
    assert res["ReducePipe"] == 9


def test_m2_map_emits(spark):
    """Map n+1 over [1,2,3] emits {2,3,4} (src/lib.rs:49-68)."""
    res = (
        Pipeline.builder(spark)
        .with_inputs("in", [1, 2, 3])
        .with_stage("in", "out", lambda df: df.select((F.col("value") + 1).alias("value")))
        .with_consumer("out", lambda df: sorted(r.value for r in df.collect()))
        .build()
        .wait()
    )
    assert res["out"] == [2, 3, 4]


def test_m3_stateful_running_sum(spark):
    """Stateful stage running sum over [1,2,3] → final state 6
    (src/lib.rs:158-187); shared state ≙ aggregation."""
    res = (
        Pipeline.builder(spark)
        .with_inputs("in", [1, 2, 3])
        .with_consumer("in", _sum_consumer())
        .build()
        .wait()
    )
    assert res["in"] == 6


def test_m4_dynamic_producer_pull_protocol(spark):
    """Producer counting 1..10 pulled until None → fold 55
    (src/pipeline/mod.rs:236-270)."""
    state = {"n": 0}

    def produce():
        state["n"] += 1
        return state["n"] if state["n"] <= 10 else None

    res = (
        Pipeline.builder(spark)
        .with_producer("nums", produce)
        .with_consumer("nums", _sum_consumer())
        .build()
        .wait()
    )
    assert res["nums"] == 55


def test_m5_branching_producer_routes_evens_odds(spark):
    """Branching producer 1..10 → (odds, evens): 25 / 30
    (src/pipeline/mod.rs:274-330)."""
    state = {"n": 0}

    def produce():
        state["n"] += 1
        if state["n"] > 10:
            return None
        if state["n"] % 2 == 1:
            return [state["n"], NoOutput]
        return [NoOutput, state["n"]]

    res = (
        Pipeline.builder(spark)
        .with_branching_producer(["odds", "evens"], produce)
        .with_consumer("odds", _sum_consumer())
        .with_consumer("evens", _sum_consumer())
        .build()
        .wait()
    )
    assert res["odds"] == 25
    assert res["evens"] == 30


def test_m6_branching_producer_two_streams(spark):
    """Branching producer c<10 → (c, c*2): sums 45 and 90
    (tests/stage_tests.rs:39-106)."""
    state = {"c": -1}

    def produce():
        state["c"] += 1
        if state["c"] >= 10:
            return None
        return [state["c"], state["c"] * 2]

    res = (
        Pipeline.builder(spark)
        .with_branching_producer(["one", "two"], produce)
        .with_consumer("one", _sum_consumer())
        .with_consumer("two", _sum_consumer())
        .build()
        .wait()
    )
    assert res["one"] == 45
    assert res["two"] == 90


@pytest.mark.parametrize(
    "inputs,expected",
    [([[1, 2], [3, 4, 5]], 15), ([[1, 2, 3]], 6)],
    ids=["m7", "m8"],
)
def test_m7_m8_flattener_fold(spark, inputs, expected):
    """Flattener → fold (src/pipeline/builder.rs:303-330 sum 15;
    tests/stage_tests.rs:140-164 sum 6)."""
    res = (
        Pipeline.builder(spark)
        .with_inputs("lists", inputs, "value: array<bigint>")
        .with_flattener("lists", "flat")
        .with_consumer("flat", _sum_consumer())
        .build()
        .wait()
    )
    assert res["flat"] == expected


def test_m8b_flattener_with_positions(spark):
    """M8 variant with index preservation (VERDICT r2 #6): posexplode
    keeps each element's ordinal within its source record — the
    ordering the reference's in-order channel delivery implies
    (src/pipeline/builder.rs:336-364)."""
    res = (
        Pipeline.builder(spark)
        .with_inputs("lists", [(10, [7, 8, 9])], "rec: bigint, value: array<bigint>")
        .with_flattener("lists", "flat", positions=True)
        .with_consumer(
            "flat",
            lambda df: sorted((r.rec, r.pos, r.value) for r in df.collect()),
        )
        .build()
        .wait()
    )
    assert res["flat"] == [(10, 0, 7), (10, 1, 8), (10, 2, 9)]


def test_m8c_flattener_map_with_positions(spark):
    """Map-typed pipe flattened with positions → (pos, key, value)."""
    res = (
        Pipeline.builder(spark)
        .with_inputs("maps", [({"a": 1, "b": 2},)], "value: map<string,bigint>")
        .with_flattener("maps", "flat", positions=True)
        .with_consumer(
            "flat",
            lambda df: sorted((r.pos, r.key, r.value) for r in df.collect()),
        )
        .build()
        .wait()
    )
    assert res["flat"] == [(0, "a", 1), (1, "b", 2)]


def test_m8d_flattener_string_to_chars(spark):
    """String is IntoIterator<char> in the reference's flattener
    (builder.rs:336-364): a string pipe explodes to one character per
    record, with positions when asked."""
    res = (
        Pipeline.builder(spark)
        .with_inputs("words", ["ab", "cde"], "value: string")
        .with_flattener("words", "chars", positions=True)
        .with_consumer(
            "chars",
            lambda df: sorted((r.pos, r.value) for r in df.collect()),
        )
        .build()
        .wait()
    )
    assert res["chars"] == [(0, "a"), (0, "c"), (1, "b"), (1, "d"), (2, "e")]


def test_m8e_flattener_string_golden_sum(spark):
    """The reference's flattener golden (stage_tests.rs:141-164:
    [1,2,3] flattens and folds to sum=6) rerun on a STRING input —
    '123' explodes to chars whose digit-sum folds to the same 6,
    pinning that String-as-IntoIterator (builder.rs:336-364 accepts
    any IntoIterator; String yields chars) walks the same explode
    lane as Vec."""
    res = (
        Pipeline.builder(spark)
        .with_inputs("first", ["123"], "value: string")
        .with_flattener("first", "second")
        .with_consumer(
            "second",
            lambda df: df.agg(F.sum(F.col("value").cast("int"))).head()[0],
        )
        .build()
        .wait()
    )
    assert res["second"] == 6


def test_m9_multi_stage_linear(spark):
    """[1] through chained maps +1,+2,+3 → 7 (tests/pipeline_tests.rs:83-134)."""

    def plus(k):
        return lambda df: df.select((F.col("value") + k).alias("value"))

    res = (
        Pipeline.builder(spark)
        .with_inputs("p0", [1])
        .with_stage("p0", "p1", plus(1))
        .with_stage("p1", "p2", plus(2))
        .with_stage("p2", "p3", plus(3))
        .with_consumer("p3", lambda df: [r.value for r in df.collect()])
        .build()
        .wait()
    )
    assert res["p3"] == [7]


def test_m10_cyclic_pipeline(spark):
    """Cycle: 0 loops producer→A→B→A→B→sink, +1 each hop, exits ≥4
    (tests/pipeline_tests.rs:145-208). Quiescence = empty frontier."""

    def a_stage(df):
        return df.select((F.col("value") + 1).alias("value"))

    def b_router(df):
        inc = df.select((F.col("value") + 1).alias("value"))
        return [inc.filter(F.col("value") < 4), inc.filter(F.col("value") >= 4)]

    res = (
        Pipeline.builder(spark)
        .with_inputs("a_in", [0])
        .with_stage("a_in", "b_in", a_stage)
        .with_branching_stage("b_in", ["a_in", "sink"], b_router)
        .with_consumer("sink", lambda df: [r.value for r in df.collect()])
        .build()
        .wait()
    )
    assert res["sink"] == [4]


def test_m11_branch_inputs_fan_in(spark):
    """(1,1,1) fanned to 3 pipes, all +1, fan-in union → total 6
    (tests/pipeline_tests.rs:220-273)."""
    b = Pipeline.builder(spark).with_branching_inputs(
        ["one", "two", "three"], [(1, 1, 1)]
    )
    for p in ["one", "two", "three"]:
        b = b.with_stage(p, "merged", lambda df: df.select((F.col("value") + 1).alias("value")))
    res = b.with_consumer("merged", _sum_consumer()).build().wait()
    assert res["merged"] == 6


def test_m12_no_producer_error(spark):
    """Build error parity (tests/pipeline_tests.rs:7-25)."""
    with pytest.raises(PipelineBuildError, match="pipeline must have at least one producer"):
        (
            PipelineBuilder(spark)
            .with_stage("one", "two", lambda df: df)
            .with_consumer("two", lambda df: None)
            .build()
        )


def test_m13_open_ended_pipe_error(spark):
    """Build error parity (tests/pipeline_tests.rs:27-41)."""
    with pytest.raises(PipelineBuildError, match="pipeline has open-ended pipe: 'two'"):
        (
            PipelineBuilder(spark)
            .with_inputs("one", [1])
            .with_stage("one", "two", lambda df: df)
            .build()
        )


def test_m13b_reader_reuse_error(spark):
    """Two readers of one pipe (src/pipeline/mod.rs:408)."""
    with pytest.raises(PipelineBuildError, match="reader was already used"):
        (
            PipelineBuilder(spark)
            .with_inputs("one", [1])
            .with_stage("one", "two", lambda df: df)
            .with_stage("one", "three", lambda df: df)
            .with_consumer("two", lambda df: None)
            .with_consumer("three", lambda df: None)
            .build()
        )


def test_m14_task_failure_propagates(spark):
    """A failing task fails the whole pipeline run
    (tests/stage_tests.rs:166-180)."""

    def boom(df):
        raise RuntimeError("task failed")

    p = (
        Pipeline.builder(spark)
        .with_inputs("in", [1])
        .with_consumer("in", boom)
        .build()
    )
    with pytest.raises(RuntimeError, match="task failed"):
        p.wait()


def test_also_combinator(spark):
    """also() composes builder fragments (builder.rs:406-408)."""

    def add_sink(b):
        return b.with_consumer("out", _sum_consumer())

    res = (
        Pipeline.builder(spark)
        .with_inputs("out", [1, 2])
        .also(add_sink)
        .build()
        .wait()
    )
    assert res["out"] == 3


def test_worker_options_validation():
    """WorkerOptions validated non-zero (src/pipeline/mod.rs:93-105)."""
    from async_pipes_spark import WorkerOptions

    with pytest.raises(ValueError):
        WorkerOptions(pipe_buffer_size=0)
    with pytest.raises(ValueError):
        WorkerOptions(max_task_count=0)
    assert WorkerOptions.default_single_task().max_task_count == 1
    assert WorkerOptions.default_multi_task().max_task_count == 100


def test_infinite_producer_raises_with_guidance(spark, monkeypatch):
    """An unbounded pull-protocol closure must fail fast with a pointer
    to the streaming path, not hang (reference's infinite producers map
    to readStream; the driver pull loop is for bounded closures)."""
    import async_pipes_spark.pipeline.pipeline as pl
    from async_pipes_spark.pipeline.pipeline import Pipeline

    monkeypatch.setattr(pl, "MAX_PRODUCER_PULLS", 50)
    p = (
        Pipeline.builder(spark)
        .with_producer("p", lambda: 1)  # never returns None
        .with_consumer("p", lambda df: df.count())
        .build()
    )
    with pytest.raises(RuntimeError, match="streaming"):
        p.wait()


def test_m8e_flattener_empty_string_yields_no_rows(spark):
    """'' is IntoIterator over zero chars — it must contribute zero
    rows, not a phantom empty-string row (Spark's split('','') is ['']).
    """
    res = (
        Pipeline.builder(spark)
        .with_inputs("words", ["ab", ""], "value: string")
        .with_flattener("words", "chars")
        .with_consumer("chars", lambda df: sorted(r.value for r in df.collect()))
        .build()
        .wait()
    )
    assert res["chars"] == ["a", "b"]
