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
    """Rotation policy, round 9 (r8 verdict item 5): the 4 queries NEW
    this round (z5 skipping under a live merge-on-read backlog, s31
    the merge-on-read change-data-feed, v4 incremental view
    maintenance, s32 its streaming twin), the 5 queries whose code
    paths round 9 rewrote (s30/z4 ride the new keep/contested resolver
    + delta-aware planner; a10/a11/s27 ride the explicit-states index
    pointer + backlogged-probe pruning), and ALL 35 queries whose
    freshest driver rows date to r06 (the exact rotation list the r8
    verdict staged) must LEAD the first 50 entries, so after this
    round's driver run EVERY query in the contract holds a driver row
    from r7 or later. The remaining 6 slots refresh the oldest
    r07-green evidence, including z1 — the r8 verdict's item-8 perf
    watch (s25, f1 and s26 stay r07-green just below the cut)."""
    qs = list(entry.queries())
    # the 44 must-record queries lead the window outright
    assert [k.split("_", 1)[0] for k in qs[:44]] == [
        "z5", "s31", "v4", "s32",
        "s30", "z4", "a10", "a11", "s27",
        "x4", "x5", "x6", "j1", "j2", "j3", "j4", "j5",
        "k2", "k3", "a1", "a5", "b1",
        "s4", "s5", "s9", "s10", "s11", "s12", "s13", "s14", "s15", "s16",
        "d1", "d2", "d3", "d4", "d5", "d6", "d7", "d8",
        "t1", "t2", "t3", "t4",
    ], qs[:44]
    # slots 45-50: the 6 oldest-r07 refreshes (z1 = the perf watch)
    assert [k.split("_", 1)[0] for k in qs[44:50]] == [
        "a8", "s24", "a9", "d13", "t15", "z1",
    ], qs[44:50]


def test_priority_list_covers_all_keys():
    ranked = entry._PRIORITY
    for key in entry.queries():
        assert any(key.startswith(p) for p in ranked), f"unranked key {key}"
