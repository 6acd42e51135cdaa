"""Fuzzy edit-distance join: completeness of the hybrid blocking
(rarest-gram prefix filter + delete neighborhoods) against the
brute-force cross join, plan shape (no cartesian, no Python), and
the customer-name pairs query's scale behavior."""

import contextlib
import io
from itertools import product

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from async_pipes_spark.functions.fuzzy import fuzzy_join, fuzzy_pairs
from async_pipes_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(ls, rs, d):
    return {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in product(enumerate(ls), enumerate(rs))
        if _lev(a, b) <= d
    }


def _run(spark, ls, rs, d, q=2):
    L = spark.createDataFrame(list(enumerate(ls)), "l int, s string")
    R = spark.createDataFrame(list(enumerate(rs)), "r int, s string")
    rows = fuzzy_join(L, R, ("l", "s"), ("r", "s"), max_dist=d, q=q).collect()
    return {(r.l_id, r.r_id, r.dist) for r in rows}


# small alphabet + short-to-boundary lengths hammers the adversarial
# cases: repeated grams, strings straddling the short/long cut, the
# empty string
adversarial = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=9), min_size=1, max_size=12
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(adversarial, adversarial, st.integers(min_value=1, max_value=2))
def test_fuzzy_join_matches_bruteforce(spark, ls, rs, d):
    assert _run(spark, ls, rs, d) == _brute(ls, rs, d)


def test_fuzzy_join_mixed_lengths_exact(spark):
    ls = ["", "a", "abc", "abcd", "abcde", "abcdef", "abcdefgh", "zzzzzzzz"]
    rs = ["b", "ab", "abcf", "abde", "abcdeX", "abcdefg", "abcdefghi", "qqqq"]
    for d in (1, 2):
        assert _run(spark, ls, rs, d) == _brute(ls, rs, d)


def test_fuzzy_pairs_canonical_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alphb"), (3, None), (4, "alpha")],
        "id int, s string",
    )
    got = {
        (r.l_id, r.r_id, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=1).collect()
    }
    assert got == {(1, 2, 1), (1, 4, 0), (2, 4, 1)}


def test_fuzzy_join_validates_args(spark):
    df = spark.createDataFrame([(1, "x")], "id int, s string")
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(df, df, ("id", "s"), ("id", "s"), max_dist=3)
    with pytest.raises(ValueError, match="q must"):
        fuzzy_join(df, df, ("id", "s"), ("id", "s"), max_dist=1, q=1)


def test_fuzzy_join_plan_no_cartesian_no_python(spark):
    """The exactness must come from blocking, not an all-pairs plan:
    no cartesian/NLJ anywhere, no Python evaluation (everything is
    codegen expressions), and the only window is per-string-id."""
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    plan = _plan(fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan


def test_fuzzy_customer_pairs_match_duckdb(spark):
    import duckdb

    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    got = {
        (r.l_id, r.r_id, r.dist)
        for r in fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1).collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(
            f"""
            WITH c AS (SELECT c_custkey, c_name
                       FROM '{SF_SMOKE}/customer.parquet')
            SELECT a.c_custkey, b.c_custkey,
                   levenshtein(a.c_name, b.c_name)
            FROM c a JOIN c b ON a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
            """
        ).fetchall()
    }
    assert got == want and len(want) > 0


def test_fuzzy_blocking_stays_subquadratic_on_hot_prefix(spark):
    """Scale honesty: when EVERY record shares a long hot prefix —
    the worst case for naive gram blocking, where ONE bucket holds
    the whole corpus and a single task gets the n²/2 pair expansion —
    the rarest-gram prefix filter must (1) never form a mega-bucket:
    the largest posting list stays a small fraction of n, so
    per-task work is bounded; (2) keep total candidates well under
    all-pairs. (With a digits-only suffix alphabet the candidate
    total is data-bounded at ~n²/|gram space|, spread across many
    keys — the quadratic-through-one-key funnel is what the design
    eliminates.)"""
    n = 4000
    rows = [(i, f"SharedHotPrefix-{i:06d}") for i in range(n)]
    df = spark.createDataFrame(rows, "id int, s string")

    # count candidates by re-running the long path's blocking exactly
    # as fuzzy_join builds it (q=2, d=1 -> plen 3)
    from async_pipes_spark.functions.fuzzy import _grams_expr, _prefix_grams

    g = df.select("id", F.explode(F.expr(_grams_expr("s", 2))).alias("g"))
    dfreq = g.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    pref = _prefix_grams(g, "id", dfreq, 3)
    max_posting = pref.groupBy("g").count().agg(F.max("count")).first()[0]
    assert max_posting <= n // 10, max_posting  # no one-bucket-holds-all
    cands = (
        pref.alias("a")
        .join(pref.alias("b"), "g")
        .where(F.col("a.id") < F.col("b.id"))
        .count()
    )
    assert cands < (n * (n - 1) // 2) / 8, cands

    # and the result is still exact on a sample of known neighbors
    from async_pipes_spark.functions.fuzzy import fuzzy_pairs

    small = df.where(F.col("id") < 300)
    got = {
        (r.l_id, r.r_id)
        for r in fuzzy_pairs(small, "id", "s", max_dist=1).collect()
    }
    want = {
        (i, j)
        for i in range(300)
        for j in range(i + 1, 300)
        if sum(a != b for a, b in zip(f"{i:06d}", f"{j:06d}")) <= 1
    }
    assert got == want
