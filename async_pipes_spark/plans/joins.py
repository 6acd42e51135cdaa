"""Temporal-join query set: the custom operators Spark lacks natively
(as-of join, interval/range join) exposed through the driver contract
with DuckDB oracles (DuckDB's native ASOF JOIN / range predicates).

The reference has no joins at all (SURVEY.md §2.3) — users would build
them inside stage closures; here they are first-class operators
(`operators/asof.py`, `operators/range_join.py`) with oracle-checked
semantics on the `events` table.

j1 — click→purchase as-of attribution: each click carries the most
recent at-or-before purchase total of the same user (backward as-of).
j2 — click→purchase-window range attribution: every (click, purchase)
pair where the click lands inside the purchase's 2-hour window; left
semantics keep unmatched clicks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from async_pipes_spark.operators.asof import asof_join
from async_pipes_spark.operators.range_join import range_join
from async_pipes_spark.sources.tables import load_table


# shared money canonicalization — ONE definition with the r-series
# (functions.money.cents), so the two families can never round
# differently and break oracle parity in only one of them
from async_pipes_spark.functions.money import cents as _cents


def j1_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join, exact-match-allowed, null when no prior
    purchase. Purchases are pre-aggregated per (user, ts) so the match
    is deterministic under timestamp ties."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.sum(_cents("value")).alias("purch_cents"))
    )
    return asof_join(clicks, purchases, on="ts", by="user_id").select(
        "event_id", "user_id", "purch_cents"
    )


def j2_range_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized interval join (no cross product): clicks × 2-hour
    purchase windows per user, left semantics."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    return range_join(
        clicks, windows, "ts", "w_start", "w_end", by="user_id", how="left"
    ).select("click_id", "purchase_id")


def j4_forward_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each click carries the EARLIEST at-or-after
    purchase of the same user (the refund/attribution-lookahead shape;
    exercises the operator's forward direction end-to-end against
    DuckDB's ASOF with a <= ordering predicate)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.sum(_cents("value")).alias("next_purch_cents"))
    )
    return asof_join(
        clicks, purchases, on="ts", by="user_id", direction="forward"
    ).select("event_id", "user_id", "next_purch_cents")


def j5_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j1 with a ONE-HOUR staleness bound — pandas merge_asof's
    ``tolerance``: an as-of match older than the bound is NULLED (the
    row survives; only the stale payload is refused). Same one-shuffle
    union+window plan as j1; the tolerance is a post-window column
    guard, not a join-condition explosion."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.sum(_cents("value")).alias("purch_cents"))
    )
    return asof_join(
        clicks, purchases, on="ts", by="user_id", tolerance_seconds=3600
    ).select("event_id", "user_id", "purch_cents")


def j3_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 shape): orders ⋈ customer ⋈
    nation ⋈ region, revenue per nation for one region's customers.

    nation/region are forced broadcasts (always tiny); the
    customer-side join is left to AQE, which broadcasts at this scale
    and falls back to a shuffle join when the filtered dimension
    outgrows the threshold at 100 TB. Orders are pre-aggregated per
    custkey BEFORE the join chain: the join then moves one row per
    customer, not one per order."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("cents")
    )
    dims = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    return (
        spend.join(dims, spend.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


JOIN_QUERIES = {
    "j1_asof_attribution": j1_asof_attribution,
    "j2_range_attribution": j2_range_attribution,
    "j3_revenue_by_nation": j3_revenue_by_nation,
    "j4_forward_asof": j4_forward_asof,
    "j5_asof_tolerance": j5_asof_tolerance,
}

JOIN_ORACLES = {
    # ASOF picks the LATEST at-or-before match; if that one is stale the
    # tolerance nulls the payload (no fresher match can exist), so the
    # CASE over the matched ts reproduces merge_asof tolerance exactly
    "j5_asof_tolerance": """
        WITH clicks AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS purch_cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        )
        SELECT c.event_id, c.user_id,
               CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR THEN p.purch_cents END
                   AS purch_cents
        FROM clicks c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY c.event_id
    """,
    "j1_asof_attribution": """
        WITH clicks AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS purch_cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        )
        SELECT c.event_id, c.user_id, p.purch_cents
        FROM clicks c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY c.event_id
    """,
    "j2_range_attribution": """
        WITH clicks AS (
            SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'click'
        ),
        w AS (
            SELECT event_id AS purchase_id, user_id,
                   CAST(ts AS TIMESTAMP) AS w_start,
                   CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS w_end
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.click_id, w.purchase_id
        FROM clicks c LEFT JOIN w
          ON c.user_id = w.user_id AND c.ts BETWEEN w.w_start AND w.w_end
        ORDER BY click_id, purchase_id
    """,
    "j4_forward_asof": """
        WITH clicks AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS next_purch_cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        )
        SELECT c.event_id, c.user_id, p.next_purch_cents
        FROM clicks c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.event_id
    """,
    "j3_revenue_by_nation": """
        WITH spend AS (
            SELECT o_custkey,
                   SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
            FROM orders GROUP BY o_custkey
        )
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM spend
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY n_name
    """,
}
