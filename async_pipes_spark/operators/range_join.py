"""Range join — match point events to intervals (the second custom
operator the brief names alongside as-of join).

A naive ``l.ts BETWEEN r.start AND r.end`` join is a cross product with
a filter (O(n·m) at scale). This implementation bucketizes time: each
interval is exploded to the coarse buckets it spans, points map to one
bucket, and the join becomes an equi-join on (key, bucket) with a final
exact range filter — the standard interval-join decomposition used by
streaming engines. Choose ``bucket_seconds`` near the typical interval
length: intervals then explode to O(1) buckets and the shuffle is
uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: str | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= ts <= end``), optionally also matching on ``by``.

    Returns points columns + intervals columns. ``how`` ∈ {inner,
    left}: left keeps unmatched points with null interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    overlap = (set(points.columns) & set(intervals.columns)) - ({by} if by else set())
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    bucket = lambda c: F.floor(F.unix_micros(F.col(c)) / (bucket_seconds * 1_000_000))  # noqa: E731
    p = points.withColumn("_pb", bucket(point_ts))
    i = intervals.withColumn(
        "_ib", F.explode(F.sequence(bucket(start_ts), bucket(end_ts)))
    )
    on = [p["_pb"] == i["_ib"]] + ([p[by] == i[by]] if by else [])
    joined = p.join(i, on, "inner").filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    out_cols = points.columns + [c for c in intervals.columns if c != by]
    matched = joined.select(*[p[c] for c in points.columns],
                            *[i[c] for c in intervals.columns if c != by])
    if how == "inner":
        return matched
    # left: anti-join the matched point ids back in with null intervals
    matched_keys = matched.select(*points.columns).distinct()
    unmatched = points.join(matched_keys, points.columns, "left_anti").select(
        *points.columns,
        *[
            F.lit(None).cast(dict(intervals.dtypes)[c]).alias(c)
            for c in intervals.columns
            if c != by
        ],
    )
    return matched.select(*out_cols).unionByName(unmatched)
