"""Time-series resampling with gap-fill and forward-fill — the
regularize-then-interpolate primitive (pandas ``resample().ffill()``,
TimescaleDB ``time_bucket_gapfill`` + ``locf``) Spark has no native
operator for.

Composition of existing DataFrame ops, no UDFs:

1. bucket observations per (key, truncated timestamp) with the
   aggregates partial-agged map-side;
2. per-key bucket bounds → the dense grid via ``sequence()`` +
   ``explode`` — generated JVM-side, one row per (key, bucket),
   bounded by each key's own span (never a global cross join of
   keys × buckets);
3. left-join observations onto the grid (one shuffle on the grid key);
4. forward-fill gap rows with ``last(value, ignorenulls=True)`` over a
   per-key ordered window — per-key sort, spill-safe, no global order.

At 100 TB: the shuffle keys are (key, bucket) — near-uniform unless
one key dominates the corpus, in which case the per-key window is
still bounded by that key's bucket COUNT (span/unit), not its event
count, because filling happens after aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    agg_cols: dict[str, Column],
    fill_cols: list[str],
    unit: str = "day",
) -> DataFrame:
    """Resample events to a dense per-``key_col`` grid of ``unit``
    buckets spanning each key's [first, last] observation, computing
    ``agg_cols`` (name → aggregate expression over the bucket's rows)
    and forward-filling the ``fill_cols`` subset across gap buckets
    (non-fill aggregates are left NULL on gaps — count-like columns
    should be coalesced to 0 by the caller if desired). ``unit`` is a
    calendar unit that BOTH ``date_trunc`` and the grid's interval
    step understand: year, quarter (stepped as 3 months — Spark's
    interval grammar has no QUARTER), month, week, day, hour, minute,
    second. date_trunc's shorthand aliases ('mon', 'dd', ...) are
    rejected rather than guessed at.

    Rows with a NULL ``ts_col`` are EXCLUDED (they belong to no
    bucket; silently folding them into a dropped NULL-bucket group
    would lose their values from per-key totals without a trace).

    Returns one row per (key, bucket): ``key_col``, ``bucket``, and
    the aggregate columns."""
    steps = {
        "year": "interval 1 year",
        "quarter": "interval 3 month",
        "month": "interval 1 month",
        "week": "interval 1 week",
        "day": "interval 1 day",
        "hour": "interval 1 hour",
        "minute": "interval 1 minute",
        "second": "interval 1 second",
    }
    if unit not in steps:
        raise ValueError(
            f"unit must be one of {sorted(steps)}, got {unit!r}"
        )
    bad_names = {"bucket", key_col} & set(agg_cols)
    if bad_names:
        # a same-named aggregate would duplicate the grid-join key and
        # fail deep in the plan with an ambiguous-reference error
        raise ValueError(f"aggregate names reserved by resample: {sorted(bad_names)}")
    # NULL timestamps have no bucket: they would aggregate into a NULL
    # bucket row that the grid join silently drops — losing their
    # values from per-key totals with no error. Excluding them is the
    # contract (mirrors prefix_sum's NULL-key stance), stated here
    # rather than left to the join's accident.
    obs_src = df.filter(F.col(ts_col).isNotNull())
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    obs = obs_src.groupBy(F.col(key_col), bucket).agg(
        *[expr.alias(name) for name, expr in agg_cols.items()]
    )
    step = F.expr(steps[unit])
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("bucket"),
        )
    )
    joined = grid.join(obs, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for c in fill_cols:
        if c not in agg_cols:
            raise ValueError(f"fill column {c!r} is not an aggregate column")
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
