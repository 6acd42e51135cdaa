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
