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
    reserved = {"_pb", "_ib"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        # withColumn would silently OVERWRITE a same-named user column
        # and the output would carry the internal bucket value under
        # the user's name
        raise ValueError(f"column names reserved by range_join: {sorted(reserved)}")

    bucket = lambda c: F.floor(F.unix_micros(c) / (bucket_seconds * 1_000_000))  # noqa: E731
    # Explicit side aliases: both frames often share lineage (two
    # filters of one scan), and bare p[col] == i[col] on same-named
    # columns degenerates to an ambiguity-fragile trivially-true
    # predicate in that case. Qualified names are unambiguous.
    p = points.withColumn("_pb", bucket(F.col(point_ts))).alias("_p")
    # Drop inverted intervals (end < start) BEFORE the explode:
    # sequence(a, b) with b < a silently generates a DESCENDING
    # sequence — one dirty epoch-0 end timestamp would explode into
    # hundreds of thousands of bucket rows that the exact range filter
    # then guarantees can never match (NULL bounds drop too: they can
    # contain no point)
    i = (
        intervals.filter(F.col(end_ts) >= F.col(start_ts))
        .withColumn(
            "_ib",
            F.explode(F.sequence(bucket(F.col(start_ts)), bucket(F.col(end_ts)))),
        )
        .alias("_i")
    )
    cond = F.col("_p._pb") == F.col("_i._ib")
    if by:
        cond &= F.col(f"_p.{by}") == F.col(f"_i.{by}")
    # The exact range predicate lives IN the join condition (not a
    # post-filter): 'left' is then a native left outer join — unmatched
    # points surface with null interval columns in the same pass, with
    # no second points scan, no full-row distinct, and no null-equality
    # pitfalls (a matched row containing NULLs is never re-emitted).
    cond &= (F.col(f"_p.{point_ts}") >= F.col(f"_i.{start_ts}")) & (
        F.col(f"_p.{point_ts}") <= F.col(f"_i.{end_ts}")
    )
    joined = p.join(i, cond, how)
    return joined.select(
        *[F.col(f"_p.{c}").alias(c) for c in points.columns],
        *[F.col(f"_i.{c}").alias(c) for c in intervals.columns if c != by],
    )
