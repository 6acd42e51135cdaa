"""The declared query set (SURVEY.md §2.4): P1-P9 dataflow shapes from
the reference's operator inventory, X1-X6 north-star extensions.

Each function takes ``(spark, sf_dir)`` and returns a lazy DataFrame.
Every computed column is aliased to match the DuckDB oracle exactly
(driver hash-compares values after sorting columns by name).

Scale design notes appear per-query; the common rules:
- no ``collect`` inside a query; terminal ordering only where semantics
  require it (top-k) — the driver compares order-insensitively;
- filters/projections written directly against the scan so Catalyst
  pushes them into parquet;
- pre-aggregate before joins; broadcast dimension sides explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from async_pipes_spark.functions.json import json_get_int
from async_pipes_spark.functions.money import cents, revenue_cents
from async_pipes_spark.functions.vectors import micro_units
from async_pipes_spark.operators.iterate import iterate_inplace
from async_pipes_spark.sources.tables import load_table


def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row revenue map (reference `with_stage` pure map,
    src/pipeline/builder.rs:202-224). Narrow, no shuffle at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue_cents("l_extendedprice", "l_discount").alias("revenue_cents"),
    )


def p2_filter_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-drop + fold (reference stage returning None to drop,
    builder.rs:194-196; shared-state fold lib.rs:140-187). The predicate
    is pushed into the parquet scan; agg is a partial+final 1-row fold."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")) & (F.col("l_quantity") > 30))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("l_quantity")).alias("qty_cents"),
        )
    )


def p3_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattener (reference `with_flattener`, builder.rs:336-364) →
    posexplode. pos+1 matches DuckDB's 1-based generate_subscripts."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("p", "v"))
        .select(
            "vec_id",
            (F.col("p") + 1).alias("pos"),
            micro_units("v").alias("val_micro"),
        )
    )


def p4_route_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch/route by order status + per-branch fold (reference
    `with_branching_stage`, builder.rs:251-282). Routing N ways + folding
    each branch ≡ one hash aggregation — Spark's partial aggregation
    does the per-branch fold map-side, one shuffle of 3 groups."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
    )


def p5_fan_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-in union (many writers, one pipe — reference
    tests/pipeline_tests.rs:220-273) + fold, routed through the FLUENT
    BUILDER end-to-end (two DataFrame producers writing pipe 'k', the
    second attached via ``also`` composition) so the public API
    surface — not just the plans module — is oracle-checked. The built
    plan is the identical no-shuffle unionByName + 1-row fold; the
    consumer returns the lazy DataFrame."""
    from async_pipes_spark.pipeline.pipeline import Pipeline

    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_suppkey").cast("bigint").alias("k"))
    res = (
        Pipeline.builder(spark)
        .with_inputs("k", cust)
        .also(lambda b: b.with_inputs("k", supp))
        .with_stage(
            "k",
            "folded",
            lambda df: df.agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")),
        )
        .with_consumer("folded", lambda df: df)
        .build()
        .wait()
    )
    return res["folded"]


def p6_map_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README's map-reduce shape (README.md:21-54):
    map each record, fold into one total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum(revenue_cents("l_extendedprice", "l_discount")).alias("total_revenue_cents")
    )


def p7_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful stage / running fold (reference shared-state pattern,
    lib.rs:152-187) as a window frame. One shuffle on o_custkey; at
    100 TB the per-customer partitions are small (no skew: keys are
    near-uniform), so the sort-based window is safe.

    The shuffle is an explicit hash repartition: AQE's size-based
    coalescing optimizes shuffle volume, not downstream CPU — on small
    inputs it folds the window sort onto one core. Pinning partition
    count to cluster parallelism keeps the compute-bound sort parallel
    at every scale (2x faster here)."""
    orders = load_table(spark, sf_dir, "orders")
    orders = orders.repartition(
        spark.sparkContext.defaultParallelism, "o_custkey"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents("o_totalprice")).over(w).alias("running_cents"),
    )


def p8_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclic pipeline (reference tests/pipeline_tests.rs:145-208):
    halve o_totalprice until < 100, report halving steps per order.
    Runs the engine's driver-side fixpoint loop (operators.iterate),
    the Spark analogue of the reference's quiescence detection
    (src/pipeline/sync.rs). ≙ DuckDB WITH RECURSIVE."""
    orders = load_table(spark, sf_dir, "orders")
    initial = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("v"),
        F.lit(0).cast("int").alias("n"),
    )
    # elementwise body → records carry their own state around the cycle
    # (one plan branch, unroll-fused); every order exits exactly once
    # with its final step count. selectExpr: one py4j round-trip per
    # step instead of ~10 Column-API calls.
    out = iterate_inplace(
        initial,
        body=lambda df: df.selectExpr(
            "o_orderkey",
            "IF(v >= 100, v / 2, v) AS v",
            "IF(v >= 100, n + 1, n) AS n",
        ),
        active=lambda df: F.col("v") >= 100,
    )
    return out.select("o_orderkey", F.col("n").cast("bigint").alias("steps"))


def p9_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (batch form; the streaming
    twin in streaming/ uses window() + watermark and must agree)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("w"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("value")).alias("total_cents"),
        )
    )


def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash — the baseline dedup operator.
    One shuffle on the hash; at 100 TB use this shape verbatim
    (hash keys distribute uniformly by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("dups"),
    )


def x2_cosine_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-1 cosine neighbor for a bounded query set.

    The query side (20 vectors) is closed over by an Arrow-vectorized
    kernel (similarity.cosine_pairs); the candidate scan streams past it
    — no shuffle of the big side, numpy batch math instead of per-pair
    folds, bit-identical to the sequential-f32 contract. The
    unbounded-scale path is functions.similarity (LSH/IVF); this exact
    form is the oracle-checked baseline and re-ranker."""
    from async_pipes_spark.functions.similarity import cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    sims = cosine_pairs(emb, emb.filter(F.col("vec_id") < 20))
    w = Window.partitionBy("q_id").orderBy(F.col("sim_micro").desc(), F.col("c_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("q_id", F.col("c_id").alias("best_id"), F.col("sim_micro").alias("best_sim_micro"))
    )


def x3_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language text analysis fold: counts, chars, whitespace
    tokens, keyword hits — all JVM-side string functions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.size(F.split("text", " ", -1))).cast("bigint").alias("tokens"),
        F.count_if(F.col("text").like("%spark%")).alias("with_kw"),
    )


def x4_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute gap rule via lag() — the batch
    twin of streaming session_window. One shuffle on user_id (explicit
    repartition: keeps the per-user sort parallel, see p7)."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.repartition(spark.sparkContext.defaultParallelism, "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(
        F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    return (
        ev.select("user_id", new_s.alias("new_s"))
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"))
    )


def x5_json_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + bucketing (semi-structured props column).
    json_get_int's regex fast lane skips the JSON tokenizer for flat
    single-key objects and falls back to get_json_object per-row —
    measured ~30% faster than get_json_object alone at sf0.1 (which in
    turn beat from_json by ~25% for single-key extraction; multi-key
    extraction should switch to from_json: one parse)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select((json_get_int("props", "k") % 10).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def x6_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + top-k. Pre-aggregate orders by custkey BEFORE the join
    (shrinks the join's left side to #customers), then broadcast-join
    the customer dimension; orderBy+limit compiles to TakeOrderedAndProject
    (no full sort). At 100 TB: same plan; the pre-agg is the key move."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("spend_cents")
    )
    return (
        spend.join(F.broadcast(cust), spend.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "spend_cents")
        .orderBy(F.col("spend_cents").desc(), F.col("c_custkey"))
        .limit(10)
    )


DECLARED_QUERIES = {
    "p1_projection": p1_projection,
    "p2_filter_fold": p2_filter_fold,
    "p3_flatten": p3_flatten,
    "p4_route_fold": p4_route_fold,
    "p5_fan_in": p5_fan_in,
    "p6_map_reduce": p6_map_reduce,
    "p7_running_total": p7_running_total,
    "p8_cycle": p8_cycle,
    "p9_tumbling_window": p9_tumbling_window,
    "x1_exact_dedup": x1_exact_dedup,
    "x2_cosine_top1": x2_cosine_top1,
    "x3_text_stats": x3_text_stats,
    "x4_sessionize": x4_sessionize,
    "x5_json_buckets": x5_json_buckets,
    "x6_top_customers": x6_top_customers,
}
