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
