"""As-of join — a custom operator Spark lacks natively (the brief's
canonical example): for every left row, attach the most recent right
row at-or-before its timestamp (backward) or earliest at-or-after
(forward), per key.

Implemented as a composition of existing DataFrame ops (no UDFs):
union the tagged sides, then a per-key ordered window carries the last
non-null right payload forward onto left rows. Cost = one shuffle on
(by) + one sort — the same as the sort-merge join Spark would need
anyway; no range explosion, no per-row Python.

At 100 TB: partition both sides by `by` (bucketing makes the shuffle
disappear); the window sort is per-key and spills safely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: left rows keep their columns plus the matched
    right payload columns (null when no match). Ties on ``on`` match
    (at-or-before / at-or-after semantics, like pandas merge_asof with
    allow_exact_matches=True)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = [c for c in right.columns if c not in (on, by)]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")

    l_tag = left.select(
        *left.columns,
        F.lit(1).alias("_src"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload],
    )
    r_tag = right.select(
        by,
        on,
        F.lit(0).alias("_src"),
        *payload,
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in (on, by)
        ],
    ).select(*l_tag.columns)
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left at equal ts → exact matches hit
        w = Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("_src").asc())
    else:
        w = Window.partitionBy(by).orderBy(F.col(on).desc(), F.col("_src").asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = unioned
    for c in payload:
        matched = matched.withColumn(c, F.last(c, ignorenulls=True).over(w))
    match_on = F.last(F.when(F.col("_src") == 0, F.col(on)), ignorenulls=True).over(w)
    matched = matched.withColumn("_match_on", match_on)

    out = matched.filter(F.col("_src") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col("_match_on")))
        within = gap <= int(tolerance_seconds * 1_000_000)
        out = out.select(
            *[c for c in left.columns],
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c) for c in payload],
        )
    else:
        out = out.select(*left.columns, *payload)
    return out
