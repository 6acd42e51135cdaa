"""Async task closures through the PUBLIC builder (VERDICT r2 #4).

Reference stage/producer/consumer tasks are async fns
(src/pipeline/builder.rs:104-119, 202-224, 169-183); the builder now
accepts coroutine functions natively: producers drive the pull protocol
on a private loop, stages route through the bounded-concurrency Arrow
kernel (operators.async_map), consumers run at consume time.
"""

import asyncio

from pyspark.sql import functions as F

from async_pipes_spark import Pipeline
from async_pipes_spark.pipeline.options import WorkerOptions


def test_async_producer_pull_protocol(spark):
    state = {"n": 0}

    async def produce():
        await asyncio.sleep(0)
        state["n"] += 1
        return state["n"] if state["n"] <= 5 else None

    res = (
        Pipeline.builder(spark)
        .with_producer("nums", produce)
        .with_consumer("nums", lambda df: df.agg(F.sum("value")).head()[0])
        .build()
        .wait()
    )
    assert res["nums"] == 15


def test_async_stage_per_record_with_drop(spark):
    async def double_odd(rec):
        await asyncio.sleep(0)
        if rec["value"] % 2 == 0:
            return None  # reference map+filter fusion: None drops
        return {"value": rec["value"] * 2}

    res = (
        Pipeline.builder(spark)
        .with_inputs("in", [1, 2, 3, 4, 5])
        .with_stage("in", "out", double_odd, options=WorkerOptions(max_task_count=3))
        .with_consumer("out", lambda df: sorted(r.value for r in df.collect()))
        .build()
        .wait()
    )
    assert res["out"] == [2, 6, 10]


def test_async_stage_output_schema_override(spark):
    async def stringify(rec):
        return {"s": f"v{rec['value']}"}

    res = (
        Pipeline.builder(spark)
        .with_inputs("in", [1, 2])
        .with_stage("in", "out", stringify, schema="s string")
        .with_consumer("out", lambda df: sorted(r.s for r in df.collect()))
        .build()
        .wait()
    )
    assert res["out"] == ["v1", "v2"]


def test_async_consumer(spark):
    async def consume(df):
        await asyncio.sleep(0)
        return df.count()

    res = (
        Pipeline.builder(spark)
        .with_inputs("in", [1, 2, 3])
        .with_consumer("in", consume)
        .build()
        .wait()
    )
    assert res["in"] == 3


def test_async_branching_producer(spark):
    state = {"n": 0}

    async def produce():
        state["n"] += 1
        if state["n"] > 3:
            return None
        # evens left, odds right
        return (state["n"], None) if state["n"] % 2 == 0 else (None, state["n"])

    res = (
        Pipeline.builder(spark)
        .with_branching_producer(["evens", "odds"], produce)
        .with_consumer("evens", lambda df: sorted(r.value for r in df.collect()))
        .with_consumer("odds", lambda df: sorted(r.value for r in df.collect()))
        .build()
        .wait()
    )
    assert res["evens"] == [2]
    assert res["odds"] == [1, 3]
