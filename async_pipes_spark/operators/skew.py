"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join handling covers joins, but a groupBy on a pathological
key distribution (one key holding 30% of 100 TB) still funnels that
key's rows into one reduce task. Salting splits every key into
``num_salts`` sub-keys for a partial aggregate, then combines the
partials — two small shuffles instead of one skewed one.

Only algebraic aggregates can be salted this way (sum/count/min/max:
their partials combine losslessly; count combines by sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """GroupBy ``keys`` with skew-safe two-phase aggregation.

    ``aggs`` is a list of (fn, col, alias) with fn ∈ {sum, count, min,
    max}. Results are identical to ``df.groupBy(keys).agg(...)`` for
    any salt assignment — integer/decimal sums are exact; double sums
    can differ in last-ulp ordering exactly as any Spark partial
    aggregation already can.
    """
    unknown = [fn for fn, _, _ in aggs if fn not in _PARTIAL]
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s) cannot be salted: {unknown}")
    # The salt must be deterministic under task retries: after a
    # shuffle-fetch failure, recomputed map tasks must assign each row
    # to the SAME salt group, or partials are lost/double-counted.
    # Hash of row content + partition id is retry-stable (lineage
    # recomputes identical partitions) — monotonically_increasing_id
    # is not. The partition id term keeps identical hot rows spread
    # across salts instead of collapsing onto one.
    value_cols = sorted({col for _, col, _ in aggs if col in df.columns and col not in keys})
    salt = F.pmod(
        F.hash(*keys, *value_cols, F.spark_partition_id()), F.lit(num_salts)
    ).alias("_salt")
    partial_cols: list[Column] = [
        _PARTIAL[fn](col).alias(f"_p_{alias}") for fn, col, alias in aggs
    ]
    combine_cols: list[Column] = [
        _COMBINE[fn](f"_p_{alias}").alias(alias) for fn, _, alias in aggs
    ]
    return (
        df.select(*keys, salt, *value_cols)
        .groupBy(*keys, "_salt")
        .agg(*partial_cols)
        .groupBy(*keys)
        .agg(*combine_cols)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 16,
    hot_threshold: int = 1_000_000,
    max_hot_keys: int = 10_000,
) -> DataFrame:
    """Skew-safe INNER equi-join on same-named keys ``on`` — the
    explicit form of AQE's skew-join split for when runtime re-planning
    isn't enough (a single key holding 30% of 100 TB skews the map
    output itself, and AQE can only subdivide a straggler partition
    AFTER the skewed shuffle files exist; pre-salting never builds
    them).

    Plan shape: per-key counts of ``left`` (computed SKEW-SAFELY via
    :func:`salted_aggregate` — counting a skewed key must not itself
    funnel) pick the hot keys (``count >= hot_threshold``, capped at
    the ``max_hot_keys`` heaviest — a bounded broadcast list by
    construction). Cold keys take the ordinary shuffle join. Hot keys
    join on ``(key, salt)``: the big side salts each row
    (retry-deterministic content+partition hash, the
    :func:`salted_aggregate` discipline), the other side REPLICATES
    each hot row ``num_salts`` ways — so a key that held 30% of the
    table now spreads across ``num_salts`` reduce tasks, at the cost
    of duplicating only the hot slice of ``right`` (in the star shape
    that slice is a handful of dimension rows).

    Results are identical to ``left.join(right, on)`` for ANY
    ``num_salts``/``hot_threshold``/``max_hot_keys`` — the split is a
    partition of the key space and each branch computes the exact
    join; keys beyond the hot cap simply stay on the cold path.
    NULL keys never match in an inner equi-join and are dropped up
    front on both sides (keeping them out of the anti-join hot-set
    arithmetic)."""
    if not on:
        raise ValueError("salted_join needs at least one key column")
    missing = [k for k in on if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"join keys must exist on both sides: {missing}")
    lf = left.na.drop(subset=on)
    rf = right.na.drop(subset=on)
    hot = (
        salted_aggregate(lf, list(on), [("count", "*", "_n")], num_salts)
        .where(F.col("_n") >= hot_threshold)
        .orderBy(F.col("_n").desc(), *on)
        .limit(max_hot_keys)
        .select(*on)
    )
    hot_b = F.broadcast(hot)
    cold = lf.join(hot_b, on, "left_anti").join(
        rf.join(hot_b, on, "left_anti"), on, "inner"
    )
    value_cols = [c for c in lf.columns if c not in on]
    salt = F.pmod(
        F.hash(*on, *value_cols, F.spark_partition_id()), F.lit(num_salts)
    )
    lh = lf.join(hot_b, on, "leftsemi").withColumn("_salt", salt)
    rh = (
        rf.join(hot_b, on, "leftsemi")
        .withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
        )
    )
    hot_join = lh.join(rh, [*on, "_salt"], "inner").drop("_salt")
    return cold.unionByName(hot_join)
