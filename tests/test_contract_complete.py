"""Driver-contract invariants (VERDICT r2 'Next round' #1).

The verification driver snapshots ``queries()`` and records correctness
rows for the first 50 entries; these tests freeze the contract shape so
a late edit can't silently drop a query's oracle or push a
never-recorded query past the coverage window.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(os_), (
        f"missing oracles: {sorted(set(qs) - set(os_))}; "
        f"orphan oracles: {sorted(set(os_) - set(qs))}"
    )


def test_queries_and_oracles_share_order():
    assert list(entry.queries()) == list(entry.oracle_sql())


def test_stale_and_new_queries_inside_coverage_window():
    """Rotation policy, round 12 (r11 verdict items 1 and 3): the six
    IVM-family rows lead — v4/v5/v6/v7/s32 were the r11 driver-reds
    whose oracles alone emitted HUGEINT (now CAST AS BIGINT: this
    window is the falsification run) with v8 as the same-family green
    control; then the 44 oldest (r09-dated) driver rows, j1/j4/j5
    among them (they verify the same BIGINT casts on the green side).
    After this round's driver run no contract query's freshest green
    row predates r10."""
    qs = list(entry.queries())
    assert [k.split("_", 1)[0] for k in qs[:50]] == [
        "v7", "v8", "v4", "s32", "v5", "v6",
        "j1", "j2", "j3", "j4", "j5",
        "a11", "a1", "a5", "a8", "a9", "b1",
        "d13", "d1", "d2", "d3", "d4", "d5", "d6", "d7", "d8",
        "k2", "k3",
        "s10", "s11", "s12", "s13", "s14", "s15", "s16",
        "s24", "s27", "s30", "s31", "s4", "s5", "s9",
        "t15", "t1", "t2", "t3", "t4",
        "x4", "x5", "x6",
    ], qs[:50]


def test_priority_list_covers_all_keys():
    ranked = entry._PRIORITY
    for key in entry.queries():
        assert any(key.startswith(p) for p in ranked), f"unranked key {key}"


#: DuckDB result types every oracle may emit (r11 verdict items 1-2).
#: The five r11 driver-red queries were EXACTLY the five whose oracle
#: emitted HUGEINT (an uncast SUM(BIGINT) in the final projection) —
#: int128 has no stable twin on the Spark side, so the driver's
#: type-sensitive canonical hash can never match it. This is the
#: symmetric twin of test_declared_queries.py::
#: test_no_decimal_output_columns: the Spark side already refuses
#: DECIMAL outputs; the oracle side now refuses HUGEINT/DECIMAL too.
#: INTEGER is allowed: four long-green queries (p1/d8/d9/x5) emit
#: int32, which hashes identically to the Spark side's int columns.
_ORACLE_TYPES_OK = {"BIGINT", "INTEGER", "VARCHAR", "DOUBLE", "TIMESTAMP", "BOOLEAN"}


def test_oracle_output_types_are_canonical():
    """Every oracle_sql() result column must be a stable-hashing type.

    Schema-only: DuckDB binds each query at sf0.001 and reports result
    types without materializing more than the relation metadata needs.
    A reintroduced uncast SUM / AVG-as-DECIMAL / HUGEINT projection
    fails here instead of surfacing as an unexplainable driver-red
    hash mismatch two rounds later."""
    import duckdb

    from async_pipes_spark.sources.tables import TABLES

    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders: dict[str, list[str]] = {}
    for name, sql in entry.oracle_sql().items():
        types = [str(t) for t in con.sql(sql).types]
        off = [t for t in types if t not in _ORACLE_TYPES_OK]
        if off:
            offenders[name] = off
    assert not offenders, (
        "oracle queries emit non-canonical result types (the r11 "
        f"HUGEINT driver-red class): {offenders} — CAST the final "
        "projection (money/counters AS BIGINT per the §2.4 contract)"
    )
