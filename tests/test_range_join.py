"""range_join tests vs a DuckDB range-predicate join on shared
fixtures, covering bucket-boundary straddling and left semantics."""

import datetime as dt

import duckdb
import pandas as pd

BASE = dt.datetime(2024, 1, 1)


def ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


POINTS = pd.DataFrame(
    {
        "user": [1, 1, 1, 2, 2, 3],
        "ts": [ts(5), ts(65), ts(119), ts(30), ts(200), ts(10)],
        "pid": [10, 11, 12, 20, 21, 30],
    }
)
# intervals deliberately straddle hour buckets (bucket_seconds=3600)
INTERVALS = pd.DataFrame(
    {
        "user": [1, 1, 2, 3],
        "start": [ts(0), ts(50), ts(25), ts(100)],
        "end": [ts(60), ts(130), ts(35), ts(110)],
        "iid": [100, 101, 200, 300],
    }
)


def _want(how="inner"):
    con = duckdb.connect()
    con.register("p", POINTS)
    con.register("i", INTERVALS)
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return sorted(
        con.execute(
            f"""
            SELECT p.pid, i.iid FROM p {join} i
              ON p.user = i.user AND p.ts BETWEEN i.start AND i.end
            """
        ).fetchall()
    )


def test_range_join_inner_matches_duckdb(spark):
    from async_pipes_spark.operators.range_join import range_join

    p = spark.createDataFrame(POINTS)
    i = spark.createDataFrame(INTERVALS)
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(p, i, "ts", "start", "end", by="user").collect()
    )
    assert got == _want("inner")
    # sanity: point at minute 5 matches interval 0-60 only; minute 65
    # matches the straddling 50-130 interval
    assert (10, 100) in got and (11, 101) in got


def test_range_join_left_keeps_unmatched(spark):
    from async_pipes_spark.operators.range_join import range_join

    p = spark.createDataFrame(POINTS)
    i = spark.createDataFrame(INTERVALS)
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(p, i, "ts", "start", "end", by="user", how="left").collect()
    )
    assert got == _want("left")
    assert (21, None) in got  # user 2 @ minute 200: no interval
    assert (30, None) in got  # user 3 @ minute 10: interval is 100-110


def test_range_join_small_buckets_same_result(spark):
    """Bucket size must not change semantics, only the explosion
    factor."""
    from async_pipes_spark.operators.range_join import range_join

    p = spark.createDataFrame(POINTS)
    i = spark.createDataFrame(INTERVALS)
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            p, i, "ts", "start", "end", by="user", bucket_seconds=300
        ).collect()
    )
    assert got == _want("inner")


def test_range_join_left_null_payload_not_duplicated(spark):
    """Regression: a matched point carrying a NULL column must appear
    exactly once. (The old implementation recovered unmatched points
    with a null-unsafe anti-join on all columns, so NULL-bearing
    matched rows were re-emitted as unmatched.)"""
    from async_pipes_spark.operators.range_join import range_join

    p = spark.createDataFrame(
        pd.DataFrame(
            {
                "user": [1, 1],
                "ts": [ts(5), ts(200)],
                "note": [None, None],  # NULL in every point row
                "pid": [10, 11],
            }
        )
    )
    i = spark.createDataFrame(INTERVALS)
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(p, i, "ts", "start", "end", by="user", how="left").collect()
    )
    # pid 10 matches interval 100 (0-60); pid 11 matches nothing
    assert got == [(10, 100), (11, None)]


def test_range_join_shared_lineage_sides(spark):
    """Both sides filtered from ONE parent frame (the j2 shape, where
    unaliased p[by] == i[by] degenerates to a trivially-true self
    equality): aliased sides must still join on the key correctly."""
    from pyspark.sql import functions as F

    from async_pipes_spark.operators.range_join import range_join

    base = pd.concat(
        [
            POINTS.assign(kind="p", start=None, end=None, iid=None),
            INTERVALS.assign(kind="i", ts=None, pid=None),
        ]
    )[["kind", "user", "ts", "pid", "start", "end", "iid"]]
    parent = spark.createDataFrame(base)
    p = parent.filter(F.col("kind") == "p").select("user", "ts", "pid")
    i = parent.filter(F.col("kind") == "i").select("user", "start", "end", "iid")
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(p, i, "ts", "start", "end", by="user").collect()
    )
    assert got == _want("inner")


def test_range_join_without_key(spark):
    """by=None: pure time-containment join (no equi key beyond the
    bucket) must match DuckDB's keyless range predicate."""
    from async_pipes_spark.operators.range_join import range_join

    con = duckdb.connect()
    con.register("p", POINTS)
    con.register("i", INTERVALS)
    want = sorted(
        con.execute(
            "SELECT p.pid, i.iid FROM p JOIN i ON p.ts BETWEEN i.start AND i.end"
        ).fetchall()
    )
    p = spark.createDataFrame(POINTS.drop(columns=["user"]))
    i = spark.createDataFrame(INTERVALS.drop(columns=["user"]))
    got = sorted(
        (r.pid, r.iid) for r in range_join(p, i, "ts", "start", "end").collect()
    )
    assert got == want


def test_range_join_drops_inverted_intervals_without_explosion(spark):
    """An interval with end < start (dirty data: epoch-0 end) must be
    dropped before the bucket explode — sequence() would otherwise
    generate a huge DESCENDING bucket list that can never match."""
    import datetime

    from async_pipes_spark.operators.range_join import range_join

    t = lambda d: datetime.datetime(2024, 1, d, 12)  # noqa: E731
    points = spark.createDataFrame([(1, t(5))], "pid bigint, ts timestamp")
    intervals = spark.createDataFrame(
        [
            (10, t(4), t(6)),                              # valid, contains the point
            (11, t(20), datetime.datetime(1970, 1, 1)),    # inverted garbage
        ],
        "iid bigint, s timestamp, e timestamp",
    )
    out = range_join(points, intervals, "ts", "s", "e", how="left").collect()
    assert [(r.pid, r.iid) for r in out] == [(1, 10)]


def test_range_join_rejects_reserved_bucket_columns(spark):
    import datetime

    import pytest as _pytest

    from async_pipes_spark.operators.range_join import range_join

    t = datetime.datetime(2024, 1, 1)
    points = spark.createDataFrame([(1, t, 0)], "pid bigint, ts timestamp, _pb bigint")
    intervals = spark.createDataFrame([(2, t, t)], "iid bigint, s timestamp, e timestamp")
    with _pytest.raises(ValueError, match="reserved"):
        range_join(points, intervals, "ts", "s", "e")
