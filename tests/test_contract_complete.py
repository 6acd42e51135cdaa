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
    """Rotation policy, round 6: the 4 queries NEW this round (a6,
    d11, smp5, s23), mm2/mm3 (only queries without an r4+ driver row —
    the rotation round 5 promised), and the stalest-green r04 families
    (p/x/j/k2-k3/a1/a5/b1/s4-s16/d1-d8/t1-t6, minus the six deferred)
    must sit in the first 50 entries — the driver's observed per-round
    correctness window."""
    import re

    first50 = list(entry.queries())[:50]
    must_cover = [
        k
        for k in entry.queries()
        if re.match(
            r"^(a[67]|d1[12]|smp5|s23|mm[23]|p[124789]|x[2456]|j[1-5]|k[23]"
            r"|a[15]|b1|s(4|5|9|1[0-6])|d[1-8]|t[1-4])_",
            k,
        )
    ]
    missing = [k for k in must_cover if k not in first50]
    assert not missing, f"driver window misses: {missing}"
    # 58 candidates for 50 slots; the eight deferred to round 7 are the
    # repeatedly-verified r01-r04 greens and sit immediately after the
    # cut, first in line next round
    assert list(entry.queries())[50:58] == [
        "p3_flatten",
        "p5_fan_in",
        "p6_map_reduce",
        "x1_exact_dedup",
        "x3_text_stats",
        "b2_flatten_positions",
        "t5_winnow_fingerprint",
        "t6_repetition",
    ]


def test_priority_list_covers_all_keys():
    ranked = entry._PRIORITY
    for key in entry.queries():
        assert any(key.startswith(p) for p in ranked), f"unranked key {key}"
