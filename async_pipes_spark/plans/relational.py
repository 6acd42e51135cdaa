"""Relational-layer query set (r*): the capability surface the engine
commits to beyond the reference's raw dataflow (SURVEY.md §2.3-2.4 —
the reference has no joins/aggs/set-ops at all; users built them inside
stage closures, the engine exposes Spark built-ins directly).

Each query exercises one relational family end-to-end with a DuckDB
oracle: rollup hierarchies, set operations, pivot, semi/anti joins,
post-aggregation filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from async_pipes_spark.functions.money import cents
from async_pipes_spark.sources.tables import load_table


def r1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (status, priority) → (status) → () subtotals.
    One shuffle; Spark expands grouping sets map-side."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
    )


def r2_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations on key domains: |customer \\ supplier| and
    |customer ∩ supplier| (distinct semantics, like SQL EXCEPT/
    INTERSECT).

    Both counts come from ONE pass: tag each side, union, and reduce
    per key — a single shuffle with map-side partial aggregation,
    instead of the naive EXCEPT-job + INTERSECT-job (two full shuffles
    of both inputs and two driver actions). Same plan shape wins at
    100 TB: set ops over the same inputs should share one scan."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"))
        .withColumn("in_c", F.lit(1))
        .withColumn("in_s", F.lit(0))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").cast("bigint").alias("k"))
        .withColumn("in_c", F.lit(0))
        .withColumn("in_s", F.lit(1))
    )
    per_key = (
        cust.unionByName(supp)
        .groupBy("k")
        .agg(F.max("in_c").alias("in_c"), F.max("in_s").alias("in_s"))
    )
    return per_key.agg(
        F.sum(F.col("in_c") * (1 - F.col("in_s"))).alias("n_except"),
        F.sum(F.col("in_c") * F.col("in_s")).alias("n_intersect"),
    )


def r3_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: one row per priority, one column per status.
    Explicit pivot values keep the plan a single pass (no distinct-scan
    to discover columns — the 100 TB-safe form)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def r4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all four grouping sets of (status, priority) in one pass —
    rollup's full-lattice sibling. Same single-shuffle expansion."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
    )


def r5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left_semi: customers having ≥1 URGENT order, counted
    per market segment. Semi joins ship only the join key — no
    payload duplication at scale."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def r6_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti: customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


def r7_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment — the windowed
    top-k-per-group idiom. WindowGroupLimit pushes the rank cutoff
    below the shuffle (partial limit map-side), so only ~k rows per
    group per partition ever move."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_mktsegment",
            F.col("rnk").cast("bigint").alias("rnk"),
            "c_custkey",
            cents("c_acctbal").alias("bal_cents"),
        )
    )


def r8_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING): parts appearing on more than
    40 lineitems. The filter runs after the agg — Catalyst keeps the
    pre-agg scan pruned to two columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 40)
    )


def r9_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (quartiles of order value per status).

    ``percentile`` is Spark's exact sort-based percentile; run over
    BIGINT cents at p ∈ {.25,.5,.75} the interpolated result
    (1-f)·x + f·y has f a multiple of 2^-2, so the double arithmetic is
    exact and engine-independent (matches DuckDB ``percentile_cont``
    bit-for-bit — no rounding canonicalization needed).

    100 TB path: exact percentile sorts each group's values in memory;
    switch to ``approx_percentile(c, p, accuracy)`` (mergeable
    Greenwald-Khanna sketch, bounded memory) when groups stop fitting."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderstatus", cents("o_totalprice").alias("c"))
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(c, 0.25)").alias("q1_cents"),
            F.expr("percentile(c, 0.5)").alias("median_cents"),
            F.expr("percentile(c, 0.75)").alias("q3_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def r10_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: top-20 tokens by frequency across the corpus.

    explode → count per token (map-side partial agg absorbs the token
    Zipf skew: hot tokens pre-reduce in every task before the shuffle)
    → global top-k compiles to TakeOrderedAndProject (per-partition
    heaps, no full sort). 100 TB: same plan; if even the distinct-token
    count explodes, pre-filter with a count-min/frequent-items sketch
    pass and re-count only candidates."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


def r11_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregation (operators.skew) producing the
    same result as a direct groupBy — the oracle IS the direct SQL
    aggregation, proving salt-invariance on real data. Integer cents
    keep the two-phase sum exact under any partial combine order."""
    from async_pipes_spark.operators.skew import salted_aggregate

    orders = load_table(spark, sf_dir, "orders")
    prepared = orders.select(
        "o_orderpriority", cents("o_totalprice").alias("c")
    )
    return salted_aggregate(
        prepared,
        keys=["o_orderpriority"],
        aggs=[
            ("count", "c", "n"),
            ("sum", "c", "total_cents"),
            ("min", "c", "min_cents"),
            ("max", "c", "max_cents"),
        ],
        num_salts=8,
    )


def r12_approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB quantile path (mergeable Greenwald-Khanna
    ``approx_percentile``) verified AS A PROPERTY: sketch estimates are
    implementation-specific so they can't hash-match another engine,
    but 'approx within 1% of exact' is engine-independent — the oracle
    asserts the booleans. Keeps the approximate path from being
    dead documentation."""
    orders = load_table(spark, sf_dir, "orders")
    per_status = (
        orders.select("o_orderstatus", cents("o_totalprice").alias("c"))
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(c, 0.5)").alias("exact_med"),
            F.expr("approx_percentile(c, 0.5, 10000)").alias("approx_med"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return per_status.select(
        "o_orderstatus",
        "n",
        (
            F.abs(F.col("approx_med") - F.col("exact_med"))
            <= F.col("exact_med") * 0.01
        ).alias("approx_within_1pct"),
    )


def r13_hll_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count (the constant-memory scale path
    next to the exact groupBy and the KMV sketch), verified as a
    property: |approx - exact| / exact ≤ 5% (rsd passed = 0.01)."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.countDistinct("o_custkey").alias("exact_d"),
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_d"),
    )
    return agg.select(
        "exact_d",
        (
            F.abs(F.col("approx_d") - F.col("exact_d"))
            <= F.col("exact_d") * 0.05
        ).alias("approx_within_5pct"),
    )


def r14_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval window frame: per customer, trailing-7-day order
    spend (RANGE BETWEEN INTERVAL frame — the value-based frame p7's
    ROWS frame can't express). Spark's rangeBetween needs a numeric
    ordering column, so the frame runs over epoch seconds; RANGE
    includes ALL peers of the current timestamp, making the result
    deterministic even when a customer places several orders the same
    instant. One shuffle on o_custkey; frames evaluate with a sliding
    accumulator inside each sorted partition."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    epoch = F.unix_timestamp("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-7 * 86400, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderdate",
            cents("o_totalprice").alias("c"),
        )
        .select(
            "o_custkey",
            "o_orderdate",
            F.sum("c").over(w).alias("trailing_cents"),
            F.count(F.lit(1)).over(w).alias("trailing_n"),
        )
        .orderBy("o_custkey", "o_orderdate", "trailing_cents")
    )


def r15_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily resample of the event stream with gap-fill and
    forward-fill (operators.resample — the pandas resample().ffill() /
    TimescaleDB gapfill+locf shape Spark lacks natively): one row per
    (user, day) across each user's own observed span, event counts
    zeroed on gap days, the daily spend carried forward. Oracle: dense
    generate_series grid + LAST_VALUE IGNORE NULLS."""
    from async_pipes_spark.operators.resample import resample_ffill

    ev = load_table(spark, sf_dir, "events")
    out = resample_ffill(
        ev.select("user_id", "ts", cents("value").alias("vc")),
        ts_col="ts",
        key_col="user_id",
        agg_cols={
            "n_events": F.count(F.lit(1)),
            "day_cents": F.sum("vc"),
        },
        fill_cols=["day_cents"],
        unit="day",
    )
    return out.select(
        "user_id",
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        "day_cents",
    ).orderBy("user_id", "bucket")


def r16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the lattice rollup/cube can't express:
    exactly ((status, priority), (priority), ()) in ONE pass. Rollup
    would add (status) and cube all four; grouping sets computes only
    the analyst-chosen levels, still a single shuffle with map-side
    expansion. ``grouping_id`` disambiguates a genuine NULL group key
    from a subtotal row (bit i set ⇔ column i aggregated away)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


def r17_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted JOIN (operators.skew.salted_join) — the explicit
    pre-shuffle form of AQE's skew split: hot keys (picked by a
    skew-safe salted count, bounded broadcast list) join on
    (key, salt) with the right side's hot slice replicated per salt;
    cold keys take the ordinary shuffle join. hot_threshold=5 on
    lineitem-per-order counts puts real keys on BOTH branches here.
    The oracle is the direct join + GROUP BY — the salt split must be
    invisible in the result (integer cents keep sums exact under any
    combine order)."""
    from async_pipes_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        cents("l_extendedprice").alias("price_cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, ["okey"], num_salts=8, hot_threshold=5)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("price_cents").alias("total_cents"),
        )
    )


def r18_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-FREE co-located join + aggregation via bucketed layout
    (sources.sinks.write_bucketed_table). Both sides land pre-hashed on
    the join key into the same bucket scheme (8 buckets, sorted), so
    the SortMergeJoin consumes the scans' reported hash partitioning
    directly and the per-order aggregation reuses it (HashPartitioning
    on a subset of the grouping keys satisfies the agg's clustered
    distribution): ZERO Exchange between scan and result — plan-pinned
    in tests/test_plans.py. At 100 TB this is the storage-layout
    contract that turns every repeated fact-fact join on the
    distribution key from a full re-shuffle into a local merge;
    shuffle once at ingest, never again. Broadcast is disabled in the
    cloned session to force the merge path the pin is about."""
    import shutil
    import tempfile

    from async_pipes_spark.session import ensure_engine_confs
    from async_pipes_spark.session import pin as _pin
    from async_pipes_spark.sources.sinks import write_bucketed_table

    session = spark.newSession()
    ensure_engine_confs(session)
    session.conf.set("spark.sql.shuffle.partitions", "8")
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    base = tempfile.mkdtemp(prefix="r18_buckets_")
    li = load_table(session, sf_dir, "lineitem").select(
        "l_orderkey", cents("l_extendedprice").alias("price_cents")
    )
    orders = load_table(session, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    # one file per bucket (repartition shares bucketBy's hash), so the
    # sorted buckets also skip the pre-merge Sort
    write_bucketed_table(
        li.repartition(8, "l_orderkey"),
        "r18_lineitem_b",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=f"{base}/lineitem",
    )
    write_bucketed_table(
        orders.repartition(8, "o_orderkey"),
        "r18_orders_b",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
        path=f"{base}/orders",
    )
    try:
        out = (
            r18_joined_plan(session)
            .orderBy("o_orderkey")
            .transform(_pin)
        )
    finally:
        session.sql("DROP TABLE IF EXISTS r18_lineitem_b")
        session.sql("DROP TABLE IF EXISTS r18_orders_b")
        shutil.rmtree(base, ignore_errors=True)
    return out


def r18_joined_plan(session: SparkSession) -> DataFrame:
    """The exchange-free join+agg over the two bucketed tables —
    factored out so the plan test can pin its physical shape (one
    SortMergeJoin, zero Exchange, zero Sort below the join)."""
    return (
        session.table("r18_lineitem_b")
        .join(
            session.table("r18_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("price_cents").alias("total_cents"),
        )
    )


RELATIONAL_QUERIES = {
    "r1_rollup": r1_rollup,
    "r2_set_ops": r2_set_ops,
    "r3_pivot": r3_pivot,
    "r4_cube": r4_cube,
    "r5_semi_join": r5_semi_join,
    "r6_anti_join": r6_anti_join,
    "r7_topk_per_group": r7_topk_per_group,
    "r8_having": r8_having,
    "r9_quantiles": r9_quantiles,
    "r10_heavy_hitters": r10_heavy_hitters,
    "r11_salted_agg": r11_salted_agg,
    "r12_approx_quantile_check": r12_approx_quantile_check,
    "r13_hll_distinct_check": r13_hll_distinct_check,
    "r14_interval_frame": r14_interval_frame,
    "r15_resample_ffill": r15_resample_ffill,
    "r16_grouping_sets": r16_grouping_sets,
    "r17_salted_join": r17_salted_join,
    "r18_bucketed_join": r18_bucketed_join,
}

_APPROX_CHECK_ORACLES = {
    # sketch outputs are implementation-specific; the engine-independent
    # contract is the tolerance property, which the oracle asserts
    "r12_approx_quantile_check": """
        SELECT o_orderstatus, COUNT(*) AS n, true AS approx_within_1pct
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "r13_hll_distinct_check": """
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_d,
               true AS approx_within_5pct
        FROM orders
    """,
}

_R14_ORACLE = {
    "r15_resample_ffill": """
        WITH obs AS (
            SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS day_cents
            FROM events GROUP BY 1, 2
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 DAY)) AS bucket
            FROM obs GROUP BY user_id
        ),
        j AS (
            SELECT g.user_id, g.bucket, o.n_events, o.day_cents
            FROM grid g
            LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket
        )
        SELECT user_id, bucket,
               COALESCE(n_events, 0) AS n_events,
               LAST_VALUE(day_cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_cents
        FROM j ORDER BY user_id, bucket
    """,
    "r14_interval_frame": """
        SELECT o_custkey, o_orderdate,
               CAST(SUM(c) OVER w AS BIGINT) AS trailing_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n
        FROM (
            SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
            FROM orders WHERE o_custkey < 200
        )
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
        )
        ORDER BY o_custkey, o_orderdate, trailing_cents
    """,
}

RELATIONAL_ORACLES = {
    "r1_rollup": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus, o_orderpriority
    """,
    "r2_set_ops": """
        SELECT (SELECT COUNT(*) FROM
                  (SELECT c_custkey AS k FROM customer
                   EXCEPT
                   SELECT CAST(s_suppkey AS BIGINT) FROM supplier)) AS n_except,
               (SELECT COUNT(*) FROM
                  (SELECT c_custkey AS k FROM customer
                   INTERSECT
                   SELECT CAST(s_suppkey AS BIGINT) FROM supplier)) AS n_intersect
    """,
    "r3_pivot": """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "r4_cube": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus, o_orderpriority
    """,
    "r7_topk_per_group": """
        SELECT c_mktsegment, CAST(rnk AS BIGINT) AS rnk, c_custkey,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey) AS rnk
            FROM customer
        ) WHERE rnk <= 3
        ORDER BY c_mktsegment, rnk
    """,
    "r5_semi_join": """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "r6_anti_join": """
        SELECT COUNT(*) AS n_customers_without_orders
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "r8_having": """
        SELECT l_partkey, COUNT(*) AS n
        FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 40
        ORDER BY l_partkey
    """,
    "r9_quantiles": """
        SELECT o_orderstatus,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY c) AS q1_cents,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY c) AS median_cents,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY c) AS q3_cents,
               COUNT(*) AS n
        FROM (SELECT o_orderstatus,
                     CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
              FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "r10_heavy_hitters": """
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    "r11_salted_agg": """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(c) AS BIGINT) AS total_cents,
               CAST(MIN(c) AS BIGINT) AS min_cents,
               CAST(MAX(c) AS BIGINT) AS max_cents
        FROM (SELECT o_orderpriority,
                     CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
              FROM orders)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "r16_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
    """,
    # the salt split must be invisible: the oracle is the direct join
    "r17_salted_join": """
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    # the bucketed layout must be invisible in the result — the oracle
    # is the direct join + per-order GROUP BY
    "r18_bucketed_join": """
        SELECT o_orderkey, o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_orderpriority
        ORDER BY o_orderkey
    """,
    **_APPROX_CHECK_ORACLES,
    **_R14_ORACLE,
}
