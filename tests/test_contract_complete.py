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
    """Rotation policy, round 8 (r7 verdict item 2): the 2 queries NEW
    this round (z4 auto-pruning scan planner, s30 streaming
    merge-on-read upsert) plus ALL 33 queries whose freshest driver
    rows date to r05 (bpe1/bpe2, d9/d10, g1/g2, mm1, r1-r10, s17-s22,
    t7-t12/t14, v1-v3 — the deferral list the r7 verdict re-verified
    and scheduled) must LEAD the first 50 entries, so after this
    round's driver run EVERY query in the contract holds a driver row
    from r6 or later. The remaining 15 slots refresh the oldest
    r06-green evidence (a6/a7/d11/d12/smp5/s23/mm2/mm3/p1/p2/p4/p7/
    p8/p9/x2); the rest of the r06 set sits first after the cut as the
    round-9 refresh line."""
    qs = list(entry.queries())
    # the 35 must-record queries lead the window outright
    assert [k.split("_", 1)[0] for k in qs[:35]] == [
        "z4", "s30",
        "bpe1", "bpe2", "d9", "d10", "g1", "g2", "mm1",
        *[f"r{i}" for i in range(1, 11)],
        "s17", "s18", "s19", "s20", "s21", "s22",
        "t7", "t8", "t9", "t10", "t11", "t12", "t14",
        "v1", "v2", "v3",
    ], qs[:35]
    # slots 36-50: the 15 oldest-r06 refreshes
    assert [k.split("_", 1)[0] for k in qs[35:50]] == [
        "a6", "a7", "d11", "d12", "smp5", "s23", "mm2", "mm3",
        "p1", "p2", "p4", "p7", "p8", "p9", "x2",
    ], qs[35:50]
    # right after the cut: the r06-green remainder (round-9 line)
    assert [k.split("_", 1)[0] for k in qs[50:63]] == [
        "x4", "x5", "x6", "j1", "j2", "j3", "j4", "j5",
        "k2", "k3", "a1", "a5", "b1",
    ], qs[50:63]


def test_priority_list_covers_all_keys():
    ranked = entry._PRIORITY
    for key in entry.queries():
        assert any(key.startswith(p) for p in ranked), f"unranked key {key}"
