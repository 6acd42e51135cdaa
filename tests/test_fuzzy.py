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
