"""asof_join tests: semantics against DuckDB's native ASOF JOIN on
shared fixtures, plus direction/tolerance edges."""

import datetime as dt

import duckdb
import pandas as pd
import pytest

QUOTES = pd.DataFrame(
    {
        "sym": ["A", "A", "A", "B", "B"],
        "ts": [
            dt.datetime(2024, 1, 1, 10, 0, 0),
            dt.datetime(2024, 1, 1, 10, 0, 5),
            dt.datetime(2024, 1, 1, 10, 0, 9),
            dt.datetime(2024, 1, 1, 10, 0, 2),
            dt.datetime(2024, 1, 1, 10, 0, 8),
        ],
        "px": [10.0, 10.5, 10.2, 99.0, 98.5],
    }
)
TRADES = pd.DataFrame(
    {
        "sym": ["A", "A", "A", "B", "B", "C"],
        "ts": [
            dt.datetime(2024, 1, 1, 10, 0, 1),
            dt.datetime(2024, 1, 1, 10, 0, 5),
            dt.datetime(2024, 1, 1, 10, 0, 20),
            dt.datetime(2024, 1, 1, 10, 0, 1),
            dt.datetime(2024, 1, 1, 10, 0, 30),
            dt.datetime(2024, 1, 1, 10, 0, 3),
        ],
        "qty": [1, 2, 3, 4, 5, 6],
    }
)


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(TRADES)
    quotes = spark.createDataFrame(QUOTES)
    return trades, quotes


def test_asof_backward_matches_duckdb(spark, frames):
    from async_pipes_spark.operators.asof import asof_join

    trades, quotes = frames
    got = {
        (r.sym, r.ts, r.qty): r.px
        for r in asof_join(trades, quotes, on="ts", by="sym").collect()
    }

    con = duckdb.connect()
    con.register("trades", TRADES)
    con.register("quotes", QUOTES)
    want = {
        (sym, ts, qty): px
        for sym, ts, qty, px in con.execute(
            """
            SELECT t.sym, t.ts, t.qty, q.px
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.sym = q.sym AND t.ts >= q.ts
            """
        ).fetchall()
    }
    assert got == want
    # sanity on the semantics themselves
    assert got[("A", dt.datetime(2024, 1, 1, 10, 0, 5), 2)] == 10.5  # exact ts matches
    assert got[("C", dt.datetime(2024, 1, 1, 10, 0, 3), 6)] is None  # no right key


def test_asof_forward(spark, frames):
    from async_pipes_spark.operators.asof import asof_join

    trades, quotes = frames
    got = {
        (r.sym, r.qty): r.px
        for r in asof_join(trades, quotes, on="ts", by="sym", direction="forward").collect()
    }
    assert got[("A", 1)] == 10.5  # next quote at/after 10:00:01 is 10:00:05
    assert got[("A", 3)] is None  # nothing after 10:00:20


def test_asof_tolerance(spark, frames):
    from async_pipes_spark.operators.asof import asof_join

    trades, quotes = frames
    got = {
        (r.sym, r.qty): r.px
        for r in asof_join(
            trades, quotes, on="ts", by="sym", tolerance_seconds=5
        ).collect()
    }
    assert got[("B", 4)] is None  # B@10:00:01: latest quote 10:00:... none before
    assert got[("B", 5)] is None  # B@10:00:30 vs quote 10:00:08 → gap 22s > 5s
    assert got[("A", 2)] == 10.5


def test_asof_rejects_column_collision(spark, frames):
    from async_pipes_spark.operators.asof import asof_join

    trades, quotes = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("px", "qty"), on="ts", by="sym")


def test_asof_match_is_one_row_not_per_column_carry(spark):
    """The matched payload must come from ONE right row: with sparse
    payload columns, per-column carries would assemble x from an older
    row and y from a newer one — a row that never existed."""
    import datetime as dt

    from async_pipes_spark.operators.asof import asof_join

    t = dt.datetime
    right = spark.createDataFrame(
        [("A", t(2024, 1, 1, 10, 0, 0), 1, None),
         ("A", t(2024, 1, 1, 10, 0, 2), None, 2)],
        "sym string, ts timestamp, x bigint, y bigint",
    )
    left = spark.createDataFrame(
        [("A", t(2024, 1, 1, 10, 0, 3))], "sym string, ts timestamp"
    )
    row = asof_join(left, right, on="ts", by="sym").collect()[0]
    # correct as-of (pandas/DuckDB): the 10:00:02 row — x NULL, y 2
    assert (row.x, row.y) == (None, 2)


def test_asof_null_right_timestamp_never_matches(spark):
    """A right row with NULL timestamp must not be reported as a match
    (nulls-first sort would put it at the head of every window); a left
    row with NULL timestamp gets a NULL match."""
    import datetime as dt

    from async_pipes_spark.operators.asof import asof_join

    t = dt.datetime
    right = spark.createDataFrame(
        [("A", None, 7.0), ("A", t(2024, 1, 1, 10, 0, 5), 10.5)],
        "sym string, ts timestamp, px double",
    )
    left = spark.createDataFrame(
        [("A", t(2024, 1, 1, 10, 0, 1)), ("A", None)],
        "sym string, ts timestamp",
    )
    got = {r.ts: r.px for r in asof_join(left, right, on="ts", by="sym").collect()}
    assert got[t(2024, 1, 1, 10, 0, 1)] is None   # no quote at/before
    assert got[None] is None                       # null left ts: no match


def test_asof_duplicate_instant_tiebreak_is_partition_invariant(spark):
    """Duplicate right rows at one (by, on) instant resolve identically
    under any partitioning (full-row-hash tie-break)."""
    import datetime as dt

    from async_pipes_spark.operators.asof import asof_join

    t = dt.datetime
    rows = [("A", t(2024, 1, 1, 10, 0, 0), float(p)) for p in (1, 2, 3)]
    left = spark.createDataFrame(
        [("A", t(2024, 1, 1, 10, 0, 1))], "sym string, ts timestamp"
    )
    picks = set()
    for parts in (1, 3, 7):
        right = spark.createDataFrame(
            rows, "sym string, ts timestamp, px double"
        ).repartition(parts)
        picks.add(asof_join(left, right, on="ts", by="sym").collect()[0].px)
    assert len(picks) == 1


def test_asof_rejects_reserved_columns(spark):
    import datetime as dt

    import pytest as _pytest

    from async_pipes_spark.operators.asof import asof_join

    t = dt.datetime
    left = spark.createDataFrame(
        [("A", t(2024, 1, 1), 1)], "sym string, ts timestamp, _src bigint"
    )
    right = spark.createDataFrame(
        [("A", t(2024, 1, 1), 1.0)], "sym string, ts timestamp, px double"
    )
    with _pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on="ts", by="sym")


def test_asof_forward_null_left_ts_gets_null_match(spark):
    """Finding from review: desc() sorts NULLS LAST, so a NULL-ts left
    row used to sit at the forward window's END and 'match' the
    earliest right row. Both directions must give NULL-ts left rows a
    NULL match."""
    import datetime

    from async_pipes_spark.operators.asof import asof_join

    t = lambda s: datetime.datetime(2024, 1, 1, 10, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [("A", t(3)), ("A", None)], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", t(0), 1.0), ("A", t(5), 2.0)], "k string, ts timestamp, px double"
    )
    for direction, want_matched in [("forward", 2.0), ("backward", 1.0)]:
        out = {
            (r.ts is not None): r.px
            for r in asof_join(left, right, on="ts", by="k", direction=direction).collect()
        }
        assert out[True] == want_matched, (direction, out)
        assert out[False] is None, (direction, out)


def test_asof_rejects_reserved_on_column(spark):
    """A right payload column named '_on' would duplicate the match
    struct's timestamp field — rejected up front."""
    import datetime

    import pytest as _pytest

    from async_pipes_spark.operators.asof import asof_join

    t = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([("A", t)], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("A", t, "x")], "k string, ts timestamp, _on string"
    )
    with _pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on="ts", by="k")
