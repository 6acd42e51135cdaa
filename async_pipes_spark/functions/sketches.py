"""Sketch aggregates: approximate distinct counting that is
deterministic and oracle-checkable.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is fast but
its estimate is implementation-defined — no external oracle can
reproduce it. The engine therefore also ships a **KMV (k-minimum-
values) sketch** built from engine-portable primitives: hash every key
to a 48-bit fraction (first 12 hex chars of md5 — lexicographic order
on fixed-width lowercase hex IS numeric order), keep the k smallest
distinct hashes, estimate D ≈ (k-1)/h_(k).

Scale shape: the sketch is a groupBy-free TakeOrdered over distinct
hashes — partial per-partition top-k on the map side, k rows to the
driver-side reduce. Mergeable: union two sketches' hash sets and re-take
the k smallest (the standard KMV merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_WIDTH = 12  # 48-bit fractions: exact in doubles, wide enough for ppm rates
HEX_SPACE = float(16**HEX_WIDTH)


def hash_hex(*cols: Column | str) -> Column:
    """Uniform 12-hex-char hash of the (concatenated) key columns.
    Components are joined with unit separator 0x1f so ('a','bc') and
    ('ab','c') hash differently."""
    return F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, HEX_WIDTH)


def kmv_distinct(df: DataFrame, cols: list[str], k: int = 256) -> DataFrame:
    """KMV distinct-count estimate: 1 row (kth_hash, est_distinct).

    Exact when the true distinct count is < k (then ``est`` falls back
    to the sketch size). Estimate error ~ 1/sqrt(k)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    mins = df.select(hash_hex(*cols).alias("h")).distinct().orderBy("h").limit(k)
    kth = mins.agg(
        F.max("h").alias("kth_hash"), F.count(F.lit(1)).alias("n_kept")
    )
    frac = F.conv(F.col("kth_hash"), 16, 10).cast("double") / F.lit(HEX_SPACE)
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("bigint")
    ).otherwise(F.floor(F.lit(float(k - 1)) / frac).cast("bigint"))
    return kth.select("kth_hash", est.alias("est_distinct"))
