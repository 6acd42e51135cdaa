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
    """Rotation policy, round 11 (r10 verdict items 1, 2 and 6): v7
    (new: min/max join view — the verdict's missing #1) and v8 (new:
    count-distinct view via the two-level companion reduction) lead,
    then the four r10 driver-red IVM rows v4/s32/v5/v6 (all now
    return fully MATERIALIZED frames + diag fingerprints — the item-1
    falsification experiment); then ALL 43 queries whose freshest
    green driver rows date to r08; then the alphabetically-first
    r09-green refresh. After this round's driver run EVERY contract
    query holds a green driver row from r9 or later."""
    qs = list(entry.queries())
    assert [k.split("_", 1)[0] for k in qs[:50]] == [
        "v7", "v8", "v4", "s32", "v5", "v6",
        "d11", "d12", "d9", "g1", "g2", "mm1", "mm2", "mm3",
        "p1", "p2", "p4", "p7", "p8", "p9",
        "r1", "r2", "r3", "r4", "r5", "r6", "r7", "r8", "r9", "r10",
        "s17", "s18", "s19", "s20", "s21", "s22", "s23", "smp5",
        "t7", "t8", "t9", "t10", "t11", "t12", "t14",
        "v1", "v2", "v3", "x2",
        "a10",
    ], qs[:50]


def test_priority_list_covers_all_keys():
    ranked = entry._PRIORITY
    for key in entry.queries():
        assert any(key.startswith(p) for p in ranked), f"unranked key {key}"
