"""Property-based checks of the determinism contract: the money-cents
and micro-unit kernels must agree between Spark and DuckDB for ANY
input in their stated domains, not just the test tables' values."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from async_pipes_spark.functions.money import cents, cents_to_dec, revenue_cents
from async_pipes_spark.functions.vectors import micro_units

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# exact-2-decimal doubles: integer cents / 100
cents_ints = st.lists(
    st.integers(min_value=-(10**12), max_value=10**12), min_size=1, max_size=40
)
# 2-decimal fractions in [0, 0.99]
pct_ints = st.lists(st.integers(min_value=0, max_value=99), min_size=1, max_size=40)
floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=40,
)


@SLOW
@given(cents_ints)
def test_cents_matches_duckdb_decimal_cast(spark, vals):
    xs = [c / 100 for c in vals]
    df = spark.createDataFrame([(x,) for x in xs], "x: double")
    got = [r[0] for r in df.select(cents("x")).collect()]
    want = [
        int(v * 100)
        for (v,) in duckdb.sql(
            "SELECT CAST(x AS DECIMAL(18,2)) FROM (SELECT unnest(?) AS x)", params=[xs]
        ).fetchall()
    ]
    assert got == want == vals


@SLOW
@given(floats)
def test_micro_units_match_duckdb(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x: double")
    got = [r[0] for r in df.select(micro_units("x")).collect()]
    want = [
        v
        for (v,) in duckdb.sql(
            "SELECT CAST(FLOOR(x*1000000 + 0.5) AS BIGINT) FROM (SELECT unnest(?) AS x)",
            params=[xs],
        ).fetchall()
    ]
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.integers(0, 10**9), st.integers(0, 99)), min_size=1, max_size=40))
def test_revenue_kernel_matches_duckdb_decimal_round(spark, pairs):
    rows = [(a / 100, b / 100) for a, b in pairs]
    df = spark.createDataFrame(rows, "price: double, disc: double")
    got = [r[0] for r in df.select(cents_to_dec(revenue_cents("price", "disc"), "rev")).collect()]
    want = [
        v
        for (v,) in duckdb.sql(
            """
            SELECT CAST(ROUND(CAST(price AS DECIMAL(18,2))
                              * (1 - CAST(disc AS DECIMAL(18,2))), 2) AS DECIMAL(18,2))
            FROM (SELECT unnest(?) AS price, unnest(?) AS disc)
            """,
            params=[[r[0] for r in rows], [r[1] for r in rows]],
        ).fetchall()
    ]
    assert got == want


def test_revenue_kernel_rejects_nothing_but_matches_reference_case(spark):
    """The canonical double-rounding trap: 2.675*100 is 267.49999…;
    the cents kernel must still recover exact decimals."""
    df = spark.createDataFrame([(2.67, 0.05), (123.45, 0.10)], "price: double, disc: double")
    got = [str(r[0]) for r in df.select(cents_to_dec(revenue_cents("price", "disc"), "rev")).collect()]
    # 2.67*0.95 = 2.5365 → 2.54 (half-up); 123.45*0.90 = 111.105 → 111.11
    assert got == ["2.54", "111.11"]


@given(
    rates=st.lists(
        st.integers(min_value=0, max_value=1_000_000), min_size=2, max_size=6
    )
)
@SLOW
def test_hash_sample_rates_nest(spark, rates):
    """Nested-sample guarantee: for r1 <= r2, sample(r1) is a SUBSET of
    sample(r2) — growing a training corpus never discards previously
    selected rows. Holds because the keep test is hash < threshold and
    thresholds are monotone in the rate."""
    from async_pipes_spark.functions.sampling import hash_sample

    df = spark.range(0, 500, 1, 4).selectExpr("id", "CAST(id * 7 AS STRING) AS key")
    rates = sorted(rates)
    prev: set = set()
    prev_rate = 0
    for rate in rates:
        got = {r.id for r in hash_sample(df, ["key"], rate).collect()}
        assert prev <= got, (prev_rate, rate)
        prev, prev_rate = got, rate
    # rate extremes are exact
    assert {r.id for r in hash_sample(df, ["key"], 0).collect()} == set()
    assert len({r.id for r in hash_sample(df, ["key"], 1_000_000).collect()}) == 500


@given(k=st.integers(min_value=2, max_value=64))
@SLOW
def test_kmv_exact_below_k(spark, k):
    """KMV must be exact when the true distinct count fits in the
    sketch (n_distinct < k)."""
    from async_pipes_spark.functions.sketches import kmv_distinct

    n = k - 1
    df = spark.range(0, n * 3, 1, 2).selectExpr(f"id % {n} AS v")
    row = kmv_distinct(df, ["v"], k=k).head()
    assert row.est_distinct == n


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-10_000, 10_000)),
        min_size=1,
        max_size=60,
    )
)
def test_salted_aggregate_equals_direct_on_random_data(spark, rows):
    """Property: salted two-phase aggregation == direct groupBy for
    any data, including negative values and singleton groups."""
    from async_pipes_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(rows, "k: bigint, v: bigint")
    got = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs=[("count", "v", "n"), ("sum", "v", "s"), ("min", "v", "mn"), ("max", "v", "mx")],
            num_salts=4,
        ).collect()
    }
    want = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=1, max_size=40),
        min_size=1,
        max_size=8,
    ),
    chunk=st.integers(min_value=2, max_value=12),
)
def test_chunk_documents_reconstructs_original(spark, docs, chunk):
    """Reconstruction invariant: chunk 0 plus each later chunk's
    non-overlapping tail (tokens past the chunk-stride overlap)
    re-concatenates to exactly the original document, for any
    chunk/stride combination."""
    from async_pipes_spark.functions.text import chunk_documents

    stride = max(1, chunk - 2)
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id bigint, text string",
    )
    out = {}
    for r in chunk_documents(df, chunk=chunk, stride=stride).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, toks in enumerate(docs):
        pieces = [t.split(" ") for _, t in sorted(out[i])]
        rebuilt = pieces[0] + [tok for p in pieces[1:] for tok in p[chunk - stride:]]
        assert rebuilt == toks, (i, pieces)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(parts=st.integers(min_value=1, max_value=17), k=st.integers(min_value=1, max_value=6))
def test_group_sample_is_partitioning_invariant(spark, parts, k):
    """The quota sample must select the identical rows under any input
    partitioning (its whole point vs df.sample): selection is a pure
    function of key hashes."""
    from async_pipes_spark.functions.sampling import group_sample

    df = spark.range(200).selectExpr("id AS key", "id % 7 AS grp")
    a = {
        (r.grp, r.key)
        for r in group_sample(df.repartition(parts), ["grp"], ["key"], k).collect()
    }
    b = {
        (r.grp, r.key)
        for r in group_sample(df.coalesce(1), ["grp"], ["key"], k).collect()
    }
    assert a == b
    counts = {}
    for g, _ in a:
        counts[g] = counts.get(g, 0) + 1
    assert all(c == min(k, 29) or c == min(k, 28) for c in counts.values())


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(parts=st.integers(min_value=1, max_value=13))
def test_group_sample_duplicate_keys_still_invariant(spark, parts):
    """Duplicate (group, key) rows with DIFFERENT payloads: the
    full-row-hash tiebreak must keep the selection identical under any
    partitioning (the documented contract for hashable schemas)."""
    from async_pipes_spark.functions.sampling import group_sample

    rows = [(i % 5, i % 11, f"payload-{i}") for i in range(120)]
    df = spark.createDataFrame(rows, "grp bigint, key bigint, payload string")
    a = {
        (r.grp, r.key, r.payload)
        for r in group_sample(df.repartition(parts), ["grp"], ["key"], 3).collect()
    }
    b = {
        (r.grp, r.key, r.payload)
        for r in group_sample(df.coalesce(1), ["grp"], ["key"], 3).collect()
    }
    assert a == b


def test_weighted_mixture_rates_and_invariance(spark):
    """weighted_mixture_sample: a stratum whose budget covers it keeps
    every row (rate capped at 100%); a zero/absent weight drops the
    stratum; selection is identical under any input partitioning."""
    from async_pipes_spark.functions.sampling import weighted_mixture_sample

    rows = [(i, "big" if i % 4 else "rare", 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, toks bigint")
    kept = weighted_mixture_sample(
        df,
        strata_col="lang",
        # rare: 100 docs * 10 tokens = 1000 tokens, budget 50000*0.5
        # covers it -> rate 100%; big: 3000 tokens vs 25000 -> capped too?
        # no: budget_big = 50000*0.1//1e6... use explicit numbers below
        weight_ppm={"rare": 500_000, "big": 20_000},
        token_col="toks",
        budget_tokens=50_000,
        key_cols=["doc_id"],
    )
    got = {r.lang: r for r in kept.groupBy("lang").count().collect()}
    # rare: budget = 50000*0.5 = 25000 tokens >= its 1000 -> all 100 kept
    assert got["rare"]["count"] == 100
    # big: budget = 50000*0.02 = 1000 tokens over 3000 -> rate 333333ppm
    assert 0 < got["big"]["count"] < 300
    sel1 = sorted(r.doc_id for r in kept.collect())
    kept2 = weighted_mixture_sample(
        df.repartition(7),
        strata_col="lang",
        weight_ppm={"rare": 500_000, "big": 20_000},
        token_col="toks",
        budget_tokens=50_000,
        key_cols=["doc_id"],
    )
    assert sorted(r.doc_id for r in kept2.collect()) == sel1
    # unweighted stratum -> dropped entirely
    none_kept = weighted_mixture_sample(
        df,
        strata_col="lang",
        weight_ppm={"rare": 1_000_000},
        token_col="toks",
        budget_tokens=50_000,
        key_cols=["doc_id"],
    )
    assert none_kept.filter("lang = 'big'").count() == 0


def test_weighted_mixture_rejects_bad_args(spark):
    import pytest as _pytest

    from async_pipes_spark.functions.sampling import weighted_mixture_sample

    df = spark.createDataFrame([(1, "en", 5)], "doc_id bigint, lang string, toks bigint")
    with _pytest.raises(ValueError, match="budget_tokens"):
        weighted_mixture_sample(df, "lang", {"en": 1}, "toks", 0, ["doc_id"])
    with _pytest.raises(ValueError, match="weights"):
        weighted_mixture_sample(df, "lang", {"en": 2_000_000}, "toks", 10, ["doc_id"])


def test_column_stats_one_scan_and_values(spark):
    """column_stats: exact profile values (nulls, NDV, min/max) and the
    one-scan plan contract — a single parquet/file scan feeds every
    column's stats (Expand, not one job per column)."""
    from async_pipes_spark.functions.validate import column_stats

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k bigint, s string",
    )
    got = {r["column"]: r for r in column_stats(df, ["k", "s"]).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_null"] == 1
    assert got["k"]["n_distinct"] == 2
    assert (got["k"]["min_val"], got["k"]["max_val"]) == ("1", "2")
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_val"], got["s"]["max_val"]) == ("a", "b")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no columns"):
        column_stats(df, [])
    with _pytest.raises(ValueError, match="not in frame"):
        column_stats(df, ["nope"])


def test_column_stats_two_scan_plan(spark, tmp_path):
    """The profile of N columns reads the source exactly TWICE — one
    hash pass (counts/nulls/NDVs) + one min/max pass — regardless of
    how many columns are profiled, never a job per column. (A single
    combined aggregation would force the whole Expand pipeline into
    SortAggregate via the variable-width string min/max buffers —
    measured 3x slower; see column_stats docstring.)"""
    from async_pipes_spark.functions.validate import column_stats

    p = str(tmp_path / "cs")
    spark.range(100).selectExpr("id AS a", "id % 7 AS b", "id % 3 AS c").write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        column_stats(df, ["a", "b", "c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 2, plan
    assert "SortAggregate" not in plan.split("BroadcastExchange")[0], plan


def test_weighted_mixture_zero_token_stratum_survives(spark):
    """A stratum whose token total is 0 must not DIVIDE_BY_ZERO-kill
    the job: positive weight -> trivially covered (keep all rows),
    zero/absent weight -> dropped."""
    from async_pipes_spark.functions.sampling import weighted_mixture_sample

    df = spark.createDataFrame(
        [(1, "en", 0), (2, "en", 0), (3, "de", 10)],
        "doc_id bigint, lang string, toks bigint",
    )
    kept = weighted_mixture_sample(
        df, "lang", {"en": 500_000, "de": 500_000}, "toks", 100, ["doc_id"]
    )
    got = {r.lang: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert got.get("en") == 2  # zero tokens, positive weight -> all kept
    none = weighted_mixture_sample(
        df, "lang", {"de": 1_000_000}, "toks", 100, ["doc_id"]
    )
    assert none.filter("lang = 'en'").count() == 0


def test_temperature_mixture_sqrt_rebalance_and_invariance(spark):
    """temperature_mixture_sample (α=1/2): a dominant stratum's keep
    RATE drops below a rare stratum's (sqrt rebalancing), the rare
    stratum's quota covering it entirely keeps ALL its rows, and the
    selection is identical under any input partitioning. Also pins the
    exact integer arithmetic: with n=900 vs n=9 (isqrt 30 vs 3,
    total 33) and target 120, quotas are 109//.. -> floor exact."""
    import pytest as _pytest

    from async_pipes_spark.functions.sampling import temperature_mixture_sample

    rows = [(i, "big" if i < 900 else "rare") for i in range(909)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string")
    kept = temperature_mixture_sample(
        df, strata_col="src", key_cols=["doc_id"], target_rows=120
    )
    rates = {
        r.src: r.rate_ppm
        for r in kept.select("src", "rate_ppm").distinct().collect()
    }
    # big: quota = 120*30//33 = 109 of 900 -> 121111 ppm
    # rare: quota = 120*3//33 = 10 >= 9 -> capped at 100%
    assert rates["big"] == 120 * 30 // 33 * 1_000_000 // 900, rates
    assert rates["rare"] == 1_000_000, rates
    counts = {r.src: r["count"] for r in kept.groupBy("src").count().collect()}
    assert counts["rare"] == 9  # rate 100% keeps every row
    assert 0 < counts["big"] < 300  # ~12% of 900, hash noise allowed
    sel = sorted(r.doc_id for r in kept.collect())
    kept2 = temperature_mixture_sample(
        df.repartition(11), strata_col="src", key_cols=["doc_id"], target_rows=120
    )
    assert sorted(r.doc_id for r in kept2.collect()) == sel
    with _pytest.raises(ValueError, match="target_rows"):
        temperature_mixture_sample(df, "src", ["doc_id"], 0)


def test_split_assign_group_disjoint_and_invariant(spark):
    """split_assign: every row of a group gets the SAME split label
    (the leakage-proof property), shares must sum to 1e6 ppm, the
    assignment is identical under any partitioning, and it is
    append-stable (growing the corpus never moves an existing group)."""
    import pytest as _pytest

    from async_pipes_spark.functions.sampling import split_assign

    rows = [(i, f"g{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    shares = {"train": 800_000, "val": 100_000, "test": 100_000}
    a = split_assign(df, ["grp"], shares)
    per_group = (
        a.groupBy("grp").agg(F.countDistinct("split").alias("ns")).collect()
    )
    assert all(r.ns == 1 for r in per_group)  # group-disjoint
    got = {(r.doc_id, r.split) for r in a.collect()}
    a2 = split_assign(df.repartition(13), ["grp"], shares)
    assert {(r.doc_id, r.split) for r in a2.collect()} == got
    # append-stability: the 40-group assignment is a subset of the
    # 80-group corpus's assignment
    grown = spark.createDataFrame(
        [(i, f"g{i % 80}") for i in range(800)], "doc_id bigint, grp string"
    )
    g_map = {
        r.grp: r.split
        for r in split_assign(grown, ["grp"], shares)
        .select("grp", "split")
        .distinct()
        .collect()
    }
    for r in a.select("grp", "split").distinct().collect():
        assert g_map[r.grp] == r.split
    with _pytest.raises(ValueError, match="sum to exactly"):
        split_assign(df, ["grp"], {"train": 900_000, "test": 200_000})
    with _pytest.raises(ValueError, match="at least one"):
        split_assign(df, ["grp"], {})
    with _pytest.raises(ValueError, match="in \\[0,"):
        split_assign(df, ["grp"], {"a": -1, "b": 1_000_001})


def test_bigram_lm_heldout_scores_unseen_as_zero(spark):
    """bigram_lm_scores(model_df=...): a held-out document whose
    bigrams never appear in the training slice scores avg_p_micro 0
    (left-join zero, no smoothing); a document repeating a trained
    bigram scores exactly the model's conditional probability."""
    from async_pipes_spark.functions.text import bigram_lm_scores

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id bigint, text string"
    )
    held = spark.createDataFrame(
        [(10, "x y x"), (11, "a b")], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_p_micro)
        for r in bigram_lm_scores(held, model_df=train).collect()
    }
    assert got[10] == (2, 0)  # 'x y'/'y x' unseen -> zero
    # model: c('a b')=2, c('a c')=1, prefix 'a' total 3 -> P(b|a)=2/3
    assert got[11] == (1, 666667)
