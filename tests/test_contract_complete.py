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
    """Rotation policy, round 7 (r6 verdict item 1): the 2 queries NEW
    this round (a8 composed IVFPQ, s24 partitioned-manifest CDC) and
    the 11 stale-row queries (t13/smp4/pipe1 — r05 hash-reds from the
    since-fixed oracle casts — plus the deferred
    p3/p5/p6/x1/x3/b2/t5/t6) must LEAD the first 50 entries, followed
    by the r05-green families due a refresh; r1-r10 (green every round
    since r01/r02 — the deepest evidence) sit immediately after the
    cut, first in line for round 8."""
    import re

    qs = list(entry.queries())
    first50 = qs[:50]
    # the 14 must-record queries lead the window outright
    assert [k.split("_", 1)[0] for k in qs[:14]] == [
        "a8", "s24", "a9", "t13", "smp4", "pipe1",
        "p3", "p5", "p6", "x1", "x3", "b2", "t5", "t6",
    ], qs[:14]
    # the rest of the window: every r05-green family not deferred
    # (bpe2, last in priority order, cedes its slot to a9)
    must_cover = [
        k
        for k in entry.queries()
        if re.match(
            r"^(r1[1-6]|a[234]|k[14]|smp[123]|mm1|v[123]|d9|d10"
            r"|t(7|8|9|10|11|12|14)|s(17|18|19|20|21|22)|g[12]|bpe1)_",
            k,
        )
    ]
    missing = [k for k in must_cover if k not in first50]
    assert not missing, f"driver window misses: {missing}"
    # deferred to round 8: bpe2 (a9's slot) then r1-r10, right after
    # the cut
    assert [k.split("_", 1)[0] for k in qs[50:61]] == [
        "bpe2", *[f"r{i}" for i in range(1, 11)]
    ], qs[50:61]


def test_priority_list_covers_all_keys():
    ranked = entry._PRIORITY
    for key in entry.queries():
        assert any(key.startswith(p) for p in ranked), f"unranked key {key}"
