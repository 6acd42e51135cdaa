"""Deterministic sampling — the reproducibility primitive of a
training-data pipeline.

``df.sample()`` is seeded per-partition, so its output changes with the
physical plan (partition count, AQE decisions) — useless for
reproducible corpus construction or an external oracle. These samplers
hash stable key columns instead: a row is kept iff the first 12 hex
chars of md5(key) fall below a rate threshold. The same rows are
selected on any engine, any partitioning, any scale; sampling a
sharded 100 TB corpus needs no coordination at all (pure map-side
filter, pushes past shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from async_pipes_spark.functions.sketches import HEX_WIDTH, hash_hex

PPM = 1_000_000


def _threshold_hex(rate_ppm: int) -> str:
    """Exact hex threshold for a parts-per-million keep rate."""
    if not 0 <= rate_ppm <= PPM:
        raise ValueError(f"rate_ppm must be in [0, {PPM}], got {rate_ppm}")
    if rate_ppm == PPM:
        return "g" * HEX_WIDTH  # lexicographically above every hex string
    return format(rate_ppm * 16**HEX_WIDTH // PPM, f"0{HEX_WIDTH}x")


def hash_sample(df: DataFrame, cols: list[str], rate_ppm: int) -> DataFrame:
    """Deterministic Bernoulli sample: keep each row iff
    hash(key) < rate_ppm/1e6. Same selection on every run/engine."""
    return df.filter(hash_hex(*cols) < F.lit(_threshold_hex(rate_ppm)))


def stratified_sample(
    df: DataFrame, strata_col: str, rates_ppm: dict[str, int], cols: list[str]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep rare ones whole). Strata absent from ``rates_ppm``
    are dropped (rate 0)."""
    threshold: Column = F.lit("0" * HEX_WIDTH)
    for stratum, rate in rates_ppm.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(_threshold_hex(rate))
        ).otherwise(threshold)
    return df.filter(hash_hex(*cols) < threshold)


#: first-N-hex-chars width used for the NUMERIC threshold form
#: (rate_ppm · 16^10 ÷ 1e6 stays far inside int64; the 12-char string
#: form of ``_threshold_hex`` would overflow the multiply)
_NUM_HEX_WIDTH = 10
_NUM_HEX_SPACE = 16**_NUM_HEX_WIDTH  # 1099511627776


def _rate_threshold_keep(
    df: DataFrame, rates: DataFrame, strata_col: str, key_cols: list[str]
) -> DataFrame:
    """The shared tail of every data-derived-rate sampler: broadcast
    the per-stratum ``rate_ppm`` table onto the corpus and keep rows by
    the deterministic md5 threshold, computed INSIDE the plan
    (``printf('%010x', rate_ppm · 16^10 ÷ 1e6)`` — integer ops only,
    bit-identical on any engine). A stratum at rate ≥ 100% keeps every
    row via the short-circuit (its 11-hex-char threshold would compare
    wrongly against 10-char hashes). One definition so the threshold
    arithmetic can never drift between the samplers."""
    kept = df.join(F.broadcast(rates), strata_col)
    hash10 = F.substring(hash_hex(*key_cols), 1, _NUM_HEX_WIDTH)
    threshold = F.expr(
        f"format_string('%0{_NUM_HEX_WIDTH}x',"
        f" rate_ppm * {_NUM_HEX_SPACE} div {PPM})"
    )
    return kept.filter(
        (F.col("rate_ppm") >= F.lit(PPM)) | (hash10 < threshold)
    )


def weighted_mixture_sample(
    df: DataFrame,
    strata_col: str,
    weight_ppm: dict[str, int],
    token_col: str,
    budget_tokens: int,
    key_cols: list[str],
) -> DataFrame:
    """Budget-driven mixture sampling: split a global token budget
    across strata by target weights, derive each stratum's keep rate
    FROM THE OBSERVED DATA (rate_ppm = stratum budget ÷ stratum
    tokens, exact integer arithmetic, capped at 100%), then keep rows
    via the deterministic md5 threshold — the corpus-mixture pass
    ("30% en, 17.5% each of de/es/fr/zh, ~6k tokens total") that must
    reproduce identically on any engine, partitioning, or scale.

    Unlike :func:`stratified_sample` (caller-fixed rates), the rates
    here are data-dependent, so the hex threshold is computed INSIDE
    the plan: ``printf('%010x', rate_ppm · 16^10 ÷ 1e6)`` — integer
    ops only, bit-identical on any engine. A stratum whose budget
    covers it entirely (rate ≥ 100%) keeps every row (its 11-hex-char
    threshold would compare wrongly against 10-char hashes, so the
    predicate short-circuits on ``rate_ppm ≥ 1e6``). Strata without a
    weight get rate 0 (dropped).

    Scale shape: pass 1 reduces per-stratum token totals (tiny);
    pass 2 re-scans with a map-side hash filter against the broadcast
    rate table — row payloads never shuffle. Returns the kept rows
    with their stratum's ``rate_ppm`` attached."""
    if not 0 < budget_tokens:
        raise ValueError("budget_tokens must be positive")
    bad = {s: w for s, w in weight_ppm.items() if not 0 <= w <= PPM}
    if bad:
        raise ValueError(f"weights must be in [0, {PPM}] ppm: {bad}")
    w_col: Column = F.lit(0)
    for stratum, w in weight_ppm.items():
        w_col = F.when(F.col(strata_col) == stratum, F.lit(w)).otherwise(w_col)
    # all-integer arithmetic (SQL `div`, never float division — a
    # double quotient can round UP across an integer boundary and
    # diverge from the oracle's exact `//`)
    rates = (
        df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col)).cast("bigint").alias("_tok_total"))
        .withColumn("_w_ppm", w_col.cast("bigint"))
        .selectExpr(
            strata_col,
            # a stratum with ZERO observed tokens can't divide: any
            # positive weight's budget trivially covers it (keep all);
            # zero weight drops it — never a DIVIDE_BY_ZERO job kill
            f"CASE WHEN _tok_total = 0 THEN "
            f"  CASE WHEN _w_ppm > 0 THEN CAST({PPM} AS BIGINT)"
            f"       ELSE CAST(0 AS BIGINT) END "
            f"ELSE least(CAST({PPM} AS BIGINT), "
            f"((CAST({budget_tokens} AS BIGINT) * _w_ppm) div {PPM})"
            f" * CAST({PPM} AS BIGINT) div _tok_total) END AS rate_ppm",
        )
    )
    return _rate_threshold_keep(df, rates, strata_col, key_cols)


def split_assign(
    df: DataFrame,
    group_cols: list[str],
    splits_ppm: dict[str, int],
    split_col: str = "split",
) -> DataFrame:
    """Leakage-proof train/val/test assignment: adds ``split_col``
    naming the split each row belongs to, where the split is a pure
    function of the GROUP key hash — so every row of a group (the
    leakage unit: a near-dup fingerprint, a source domain, a user id)
    lands in the SAME split by construction. Splitting on row ids
    instead is the classic eval-contamination bug: near-identical
    documents straddle train and test.

    ``splits_ppm`` maps split name -> parts-per-million share, in
    priority order, summing to exactly 1e6: the hash space [0, 16^12)
    is carved into consecutive intervals, the last split taking the
    remainder (so ppm rounding can never orphan a hash value).

    Scale shape: a pure map-side projection — no shuffle, no stats
    pass, no join. Re-running on a grown corpus never moves a
    previously assigned group (assignment depends only on the group
    key), so splits are append-stable across corpus versions — the
    same property that makes :func:`hash_sample` nest across rates."""
    names = list(splits_ppm)
    if not names:
        raise ValueError("splits_ppm must name at least one split")
    bad = {s: p for s, p in splits_ppm.items() if not 0 <= p <= PPM}
    if bad:
        raise ValueError(f"split shares must be in [0, {PPM}] ppm: {bad}")
    if sum(splits_ppm.values()) != PPM:
        raise ValueError(
            f"split shares must sum to exactly {PPM} ppm, got "
            f"{sum(splits_ppm.values())}"
        )
    h = hash_hex(*group_cols)
    expr: Column | None = None
    cum = 0
    for name in names[:-1]:
        cum += splits_ppm[name]
        cond = h < F.lit(_threshold_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assigned = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, assigned)


def group_sample(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    k: int,
) -> DataFrame:
    """Deterministic FIXED-SIZE sample per group: the k rows whose key
    hash sorts lowest within each group — quota sampling for balanced
    eval/holdout sets (k docs per language, k customers per segment),
    where the rate-based :func:`stratified_sample` cannot guarantee a
    per-group count. Selection depends only on the key values, so any
    engine/partitioning reproduces it; groups smaller than ``k`` return
    whole.

    Rows sharing identical key values tie on the hash; a full-row hash
    breaks the tie deterministically (added whenever every column is
    hashable), so even duplicate-key inputs select the same rows under
    any partitioning — only fully identical rows remain
    interchangeable, and those are indistinguishable anyway. With an
    unhashable column type (map) in the frame, pass key columns that
    uniquely identify rows.

    Scale shape: one shuffle on the group key; WindowGroupLimit pushes
    the rank-k cutoff below the exchange (per-partition partial top-k),
    so only ~k rows per group per input partition ever move — the same
    plan as r7's top-k-per-group."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    tiebreak = []
    if not any("map<" in t for _, t in df.dtypes):
        tiebreak = [F.hash(F.struct(*df.columns))]
    w = Window.partitionBy(*group_cols).orderBy(
        hash_hex(*key_cols), *key_cols, *tiebreak
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def temperature_mixture_sample(
    df: DataFrame,
    strata_col: str,
    key_cols: list[str],
    target_rows: int,
) -> DataFrame:
    """Temperature-scaled mixture sampling at α = 1/2 (the multilingual
    rebalancing pass: sample stratum s with probability ∝ n_s^α, so
    dominant strata are downweighted and rare ones upweighted relative
    to natural proportions). A ``target_rows`` budget splits across
    strata by exact INTEGER sqrt weights — ``isqrt(n_s)`` computed as
    floor(sqrt) plus a ±1 correction, so a double's rounding at
    perfect-square boundaries can never diverge from the oracle's
    arithmetic — and each stratum's keep rate is its quota over its
    observed count (integer ppm, capped at 100%). Row selection is the
    deterministic md5 threshold, so the same documents are chosen on
    any engine, partitioning, or scale.

    Scale shape (smp4's): pass 1 is a tiny per-stratum count
    reduction; pass 2 re-scans with a pure map-side hash filter
    against the broadcast rate table. Payloads never shuffle."""
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    isq0 = "CAST(FLOOR(SQRT(CAST(_n AS DOUBLE))) AS BIGINT)"
    weighted = counts.selectExpr(
        strata_col,
        "_n",
        f"CASE WHEN {isq0} * {isq0} > _n THEN {isq0} - 1 "
        f"WHEN ({isq0} + 1) * ({isq0} + 1) <= _n THEN {isq0} + 1 "
        f"ELSE {isq0} END AS _w",
    )
    total = weighted.agg(F.sum("_w").cast("bigint").alias("_w_total"))
    rates = weighted.crossJoin(F.broadcast(total)).selectExpr(
        strata_col,
        # quota = budget share by sqrt weight; rate = quota / count —
        # two integer divs, exactly as the oracle replays them
        f"least(CAST({PPM} AS BIGINT), "
        f"((CAST({target_rows} AS BIGINT) * _w) div _w_total)"
        f" * CAST({PPM} AS BIGINT) div _n) AS rate_ppm",
    )
    return _rate_threshold_keep(df, rates, strata_col, key_cols)
