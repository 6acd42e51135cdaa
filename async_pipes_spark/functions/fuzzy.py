"""Exact edit-distance fuzzy joins at scale (entity resolution).

The training-data-pipeline problem: link near-identical names /
titles / source records across tables (or within one) under a
Levenshtein budget, without the O(n²) all-pairs scan. The classic
exact solution is blocked candidate generation + cheap verification
(the Ed-Join family: Xiao, Wang & Lin, VLDB 2008 — public
literature), re-expressed here Spark-first:

- **Long strings** (length ≥ q·(d+1)) go through *positional-free
  q-gram prefix filtering*: every string keeps only its ``q·d + 1``
  globally RAREST distinct q-grams (rarity = document frequency over
  both inputs, one count aggregation). If ``ed(s, t) ≤ d`` the two
  prefixes must share a gram (each edit destroys at most ``q`` grams,
  so at most ``q·d`` of either string's grams can be missing from the
  other — the standard prefix-filter argument over a global gram
  order). Blocking on the rarest grams makes posting lists short BY
  CONSTRUCTION — the hot-gram problem (every name sharing a common
  prefix) never forms a quadratic bucket.
- **Short strings** (length < ``delete_max_len``) go through
  *symmetric delete neighborhoods* (the SymSpell idea): if
  ``ed(s, t) ≤ d`` then deleting ≤ d characters from each reaches a
  common string. Neighborhood size is ``len+1`` keys at d=1 (LINEAR —
  cheap far beyond "short") and ~``len²/2`` at d=2.

The path boundary is a COST choice, not a correctness one: any
boundary ≥ ``q·(d+1) + d`` is complete (below it the gram bound can
be vacuous). Gram blocking is the safe default for free text, but on
KEY-STRUCTURED corpora (serial-numbered names, ids, titles sharing a
long template) the gram alphabet is tiny, so even the rarest-gram
posting lists go quadratic — 15k TPC-H customer names produce 21M
gram candidates but only ~300k delete keys whose buckets are
near-singletons (the bucket key is the whole string minus d chars —
specific by construction, where a q-gram never is). Hence
``delete_max_len`` defaults well above the completeness floor (40 at
d=1, 24 at d=2 — past which neighborhood shuffle bytes ~len^(d+1)
overtake gram costs) and is caller-tunable per corpus shape.

Both length ranges overlap on ``[q·(d+1), delete_max_len)`` and a
qualifying pair's two lengths differ by ≤ d, so every pair lands with
BOTH strings inside at least one path. Candidates are deduplicated and verified
with the JVM ``levenshtein(l, r, threshold)`` (banded DP, O(d·n))
— no Python in any hot path; everything is whole-stage-codegen
expressions plus three key-partitioned shuffles (gram df count,
postings join, candidate distinct). The per-string prefix selection
is a window partitioned BY STRING ID (bounded rows per key — never a
global window).

Completeness of both filters is property-tested against the
brute-force cross join over adversarial small-alphabet strings
(tests/test_fuzzy.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: supported Levenshtein budgets. d=1..2 covers the record-linkage
#: sweet spot; the delete-neighborhood expression is written for ≤ 2
#: applications and the prefix length q·d+1 stays tiny.
MAX_DIST_LIMIT = 2


def _grams_expr(col: str, q: int) -> str:
    """Distinct q-grams of ``col`` as a SQL expression (empty array
    below q characters — never a descending `sequence`)."""
    return (
        f"CASE WHEN length({col}) >= {q} THEN array_distinct(transform("
        f"sequence(1, length({col}) - {q} + 1), i -> substr({col}, i, {q})))"
        f" ELSE cast(array() as array<string>) END"
    )


def _del1_lambda(var: str) -> str:
    """All single-character deletions of HOF variable ``var`` (the
    string itself survives via the caller's union). ``greatest(.,1)``
    keeps `sequence` ascending for the empty string (yielding the
    harmless variant \"\")."""
    return (
        f"transform(sequence(1, greatest(length({var}), 1)), "
        f"i -> concat(substr({var}, 1, i - 1), "
        f"substr({var}, i + 1, length({var}))))"
    )


def _neighborhood_expr(col: str, max_dist: int) -> str:
    """Delete-neighborhood of ``col`` up to ``max_dist`` deletions,
    duplicates removed — pure JVM higher-order functions."""
    parts = [f"array({col})", _del1_lambda(col)]
    if max_dist >= 2:
        parts.append(
            f"flatten(transform({_del1_lambda(col)}, v -> "
            + _del1_lambda("v")
            + "))"
        )
    return f"array_distinct(concat({', '.join(parts)}))"


def _prefix_grams(
    exploded: DataFrame, id_col: str, dfreq: DataFrame, plen: int
) -> DataFrame:
    """Keep each string's ``plen`` globally rarest grams (ties broken
    by gram text for determinism). Window is per-string — bounded
    rows per key."""
    w = Window.partitionBy(id_col).orderBy("df", "g")
    return (
        exploded.join(dfreq, "g")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= plen)
        .drop("_rn", "df")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: tuple[str, str],
    right_on: tuple[str, str],
    max_dist: int = 1,
    q: int = 2,
    delete_max_len: int | None = None,
    _canonical: bool = False,
) -> DataFrame:
    """All pairs (one per left×right id pair) whose text columns are
    within Levenshtein distance ``max_dist`` — EXACT result, never an
    all-pairs plan. ``left_on``/``right_on`` are ``(id_col,
    text_col)``. Returns ``l_id, l_text, r_id, r_text, dist``.

    ``delete_max_len``: strings shorter than this take the
    delete-neighborhood path, the rest the rarest-gram path — a cost
    boundary, not a correctness one (module docstring; any value is
    clamped up to the q·(d+1)+d completeness floor). Lower it for
    free-text corpora, raise it for key-structured ones.

    ``_canonical`` (internal, :func:`fuzzy_pairs`): self-join callers
    only want ``l_id < r_id``, so the filter is applied at candidate
    generation — BEFORE the dedup shuffle and the DP verification —
    halving both, instead of verifying each pair twice plus n exact
    self-pairs and discarding the waste afterwards.

    Rows with NULL text never match (SQL comparison semantics).
    See the module docstring for the blocking proof and the scale
    shape (3 key-partitioned shuffles, all verification JVM-side)."""
    if not 1 <= max_dist <= MAX_DIST_LIMIT:
        raise ValueError(
            f"max_dist must be in 1..{MAX_DIST_LIMIT}, got {max_dist}"
        )
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    d = max_dist
    long_min = q * (d + 1)  # gram count filter provably non-vacuous
    if delete_max_len is None:
        delete_max_len = 40 if d == 1 else 24
    # completeness floor: partners of sub-long_min strings must also
    # take the delete path (their lengths reach long_min + d - 1)
    short_max = max(long_min + d, delete_max_len)
    plen = q * d + 1

    L = left.select(
        F.col(left_on[0]).alias("l_id"), F.col(left_on[1]).alias("l_t")
    ).where(F.col(left_on[1]).isNotNull())
    R = right.select(
        F.col(right_on[0]).alias("r_id"), F.col(right_on[1]).alias("r_t")
    ).where(F.col(right_on[1]).isNotNull())

    # short path: symmetric delete neighborhoods
    ls = L.where(F.length("l_t") < short_max).select(
        "l_id", "l_t", F.explode(F.expr(_neighborhood_expr("l_t", d))).alias("k")
    )
    rs = R.where(F.length("r_t") < short_max).select(
        "r_id", "r_t", F.explode(F.expr(_neighborhood_expr("r_t", d))).alias("k")
    )
    cand_short = ls.join(rs, "k").select("l_id", "l_t", "r_id", "r_t")
    if _canonical:
        cand_short = cand_short.where(F.col("l_id") < F.col("r_id"))

    # long path: rarest-gram prefix postings. Starts d below the
    # delete path's ceiling — NOT at long_min — so the two paths share
    # only the d-wide boundary band instead of re-running every
    # mid-length string through both. Completeness: a pair with its
    # longer string ≥ short_max has its shorter ≥ short_max - d (both
    # here); a pair with both < short_max is wholly in the short path.
    gram_min = max(long_min, short_max - d)
    lg = L.where(F.length("l_t") >= gram_min).select(
        "l_id", "l_t", F.explode(F.expr(_grams_expr("l_t", q))).alias("g")
    )
    rg = R.where(F.length("r_t") >= gram_min).select(
        "r_id", "r_t", F.explode(F.expr(_grams_expr("r_t", q))).alias("g")
    )
    dfreq = (
        lg.select("g")
        .unionAll(rg.select("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    cand_long = (
        _prefix_grams(lg, "l_id", dfreq, plen)
        .join(_prefix_grams(rg, "r_id", dfreq, plen), "g")
        .select("l_id", "l_t", "r_id", "r_t")
    )
    if _canonical:
        cand_long = cand_long.where(F.col("l_id") < F.col("r_id"))

    return (
        cand_short.unionByName(cand_long)
        # length band BEFORE the dedup shuffle: a cheap codegen filter
        # that shrinks the distinct's exchange, not just the DP input
        .where(F.abs(F.length("l_t") - F.length("r_t")) <= d)
        .distinct()
        .withColumn("dist", F.levenshtein("l_t", "r_t", d))
        .where(F.col("dist") >= 0)  # banded DP returns -1 past the budget
        .withColumn(
            "l_text", F.col("l_t")
        )  # stable public names; internal aliases dropped
        .withColumn("r_text", F.col("r_t"))
        .select("l_id", "l_text", "r_id", "r_text", "dist")
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    q: int = 2,
    delete_max_len: int | None = None,
) -> DataFrame:
    """Self-join form: canonical (l_id < r_id) pairs within
    ``max_dist`` — the near-duplicate-record report. Canonicalization
    happens at candidate generation (see ``_canonical``), so neither
    the mirror of a pair nor the n self-pairs ever reach the dedup
    shuffle or the DP verification."""
    return fuzzy_join(
        df,
        df,
        (id_col, text_col),
        (id_col, text_col),
        max_dist,
        q,
        delete_max_len,
        _canonical=True,
    )
