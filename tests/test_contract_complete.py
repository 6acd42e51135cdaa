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
    """Rotation policy, round 10 (r9 verdict items 1 + 5): v4/s32 —
    the only red rows in CORRECTNESS_r09 (driver-env hash divergence,
    now instrumented with in-query parity asserts + diag fingerprints)
    — must LEAD the window, with v5 (new: filtered+avg IVM view) and
    v6 (new: delta-join view) beside them; then ALL 41 queries whose
    freshest green driver rows date to r07 (t16 doubling as the
    verdict's item-4 perf watch); then 5 r08-green refreshes. After
    this round's driver run EVERY contract query holds a green driver
    row from r8 or later."""
    qs = list(entry.queries())
    assert [k.split("_", 1)[0] for k in qs[:50]] == [
        "v4", "s32", "v5", "v6",
        "a2", "a3", "a4", "b2", "f1", "k1", "k4", "k5",
        "mm4", "mm5", "p3", "p5", "p6", "pipe1", "pipe2",
        "r11", "r12", "r13", "r14", "r15", "r16", "r17", "r18",
        "s25", "s26", "s28", "s29",
        "smp1", "smp2", "smp3", "smp4", "smp6", "smp7",
        "t13", "t16", "t5", "t6", "x1", "x3", "z2", "z3",
        "a6", "a7", "bpe1", "bpe2", "d10",
    ], qs[:50]


def test_priority_list_covers_all_keys():
    ranked = entry._PRIORITY
    for key in entry.queries():
        assert any(key.startswith(p) for p in ranked), f"unranked key {key}"
