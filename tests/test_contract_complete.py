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
    """Rotation policy, round 7 (r6 verdict item 1): the 25 queries NEW
    this round (a8 composed IVFPQ, s24 partitioned-manifest CDC, a9
    PQ-coded k-NN join, d13 segment dedup, t15 top-bigram, s25
    streaming retrieval, z1 z-order layout, f1 fuzzy join, s26
    manifest diff, z2 stats-pruned scan, a10 stored-index serving,
    r17 skew-salted join, s27 streaming index serving, a11 index
    upsert + optimize, s28 concurrent stream writers, r18 bucketed
    shuffle-free join, k5 mergeable quantile sketch, mm4 perceptual
    image dedup, smp6 temperature mixing, t16 held-out perplexity
    gate, smp7 leakage-proof split, s29 streaming near-dup gate, pipe2
    composed training prep, mm5 audio envelope dedup, z3 bloom-pruned
    point lookup — 25 in all) and the 11 stale-row
    queries (t13/smp4/pipe1 — r05 hash-reds from the since-fixed
    oracle casts — plus the deferred p3/p5/p6/x1/x3/b2/t5/t6) must
    LEAD the first 50 entries, followed by the r05-green families due
    a refresh; each new query displaces one refresh candidate past
    the cut (mm1 and v1-v3 and d9 join
    d10/t7-t12/t14/s17-s22/g1/g2/bpe1/bpe2 and r1-r10 — green every
    round since r01/r02, the deepest evidence — first in line for
    round 8)."""
    import re

    qs = list(entry.queries())
    first50 = qs[:50]
    # the 36 must-record queries lead the window outright
    assert [k.split("_", 1)[0] for k in qs[:36]] == [
        "a8", "s24", "a9", "d13", "t15", "s25", "z1", "f1", "s26",
        "z2", "a10", "r17", "s27", "a11", "s28", "r18", "k5", "mm4",
        "smp6", "t16", "smp7", "s29", "pipe2", "mm5", "z3",
        "t13", "smp4", "pipe1",
        "p3", "p5", "p6", "x1", "x3", "b2", "t5", "t6",
    ], qs[:36]
    # the rest of the window: the r05-green refresh families that fit
    # (smp7/s29/pipe2/mm5/z3's arrival pushed mm1, v1-v3 and d9 past
    # the cut into round 8)
    must_cover = [
        k
        for k in entry.queries()
        if re.match(
            r"^(r1[1-6]|a[234]|k[14]|smp[123]_)",
            k,
        )
    ]
    missing = [k for k in must_cover if k not in first50]
    assert not missing, f"driver window misses: {missing}"
    # deferred to round 8, right after the cut: the displaced refresh
    # candidates then r1-r10
    assert [k.split("_", 1)[0] for k in qs[50:83]] == [
        "mm1", "v1", "v2", "v3", "d9", "d10", "t7", "t8", "t9", "t10",
        "t11", "t12", "t14",
        "s17", "s18", "s19", "s20", "s21", "s22",
        "g1", "g2", "bpe1", "bpe2",
        *[f"r{i}" for i in range(1, 11)],
    ], qs[50:83]


def test_priority_list_covers_all_keys():
    ranked = entry._PRIORITY
    for key in entry.queries():
        assert any(key.startswith(p) for p in ranked), f"unranked key {key}"
