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


def bloom_build(
    df: DataFrame,
    cols: list[str],
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
    max_partitions: int = 4096,
) -> bytes:
    """Build a DETERMINISTIC Bloom filter over the key columns and
    return its bitset — the classic membership primitive for pruning a
    100 TB probe side before a join (ship the filter to the scan, drop
    rows that cannot match). Spark's internal bloom_filter_agg is not
    SQL-exposed and its bitset is implementation-defined; this one's
    bit positions are md5-derived (position_i = md5(i|key) mod m), so
    any engine — and the DuckDB oracle — agrees on every bit.

    Scale shape: one Arrow kernel pass emits ONE ``m/8``-byte bitset
    per partition (OR-merge is commutative/idempotent, so partial
    bitsets are mergeable like any semigroup agg); the driver ORs at
    most ``max_partitions`` of them (guarded — 4096 × 8 KiB = 32 MiB).
    Corpora with more partitions should pre-coalesce or tree-merge
    through an intermediate mapInPandas round."""
    import hashlib

    import numpy as np
    import pandas as pd

    nbytes = num_bits // 8

    def kernel(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            key_cols = [pdf[c] for c in cols]
            for vals in zip(*key_cols):
                key = "\x1f".join(str(v) for v in vals)
                for i in range(num_hashes):
                    h = int(
                        hashlib.md5(f"{i}|{key}".encode()).hexdigest()[:15], 16
                    ) % num_bits
                    bits[h >> 3] |= 1 << (h & 7)
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    rows = (
        df.select(*cols)
        .mapInPandas(kernel, "bits binary")
        .limit(max_partitions + 1)
        .collect()
    )
    if len(rows) > max_partitions:
        raise ValueError(
            f"more than {max_partitions} partial bitsets; coalesce the input "
            "or raise max_partitions (driver merge is the bounded step)"
        )
    merged = np.zeros(nbytes, dtype=np.uint8)
    import numpy as _np

    for r in rows:
        merged |= _np.frombuffer(r.bits, dtype=_np.uint8)
    return merged.tobytes()


def bloom_probe(
    df: DataFrame,
    cols: list[str],
    bitset: bytes,
    num_hashes: int = 4,
    result_col: str = "might_contain",
) -> DataFrame:
    """Probe a bloom_build bitset: adds ``result_col`` (boolean). The
    bitset is closed over by the kernel (broadcast with the task,
    never shuffled); false negatives are impossible by construction."""
    import hashlib

    import numpy as np
    import pandas as pd

    num_bits = len(bitset) * 8
    bits = np.frombuffer(bitset, dtype=np.uint8)

    def kernel(batches):
        for pdf in batches:
            out = []
            key_cols = [pdf[c] for c in cols]
            for vals in zip(*key_cols):
                key = "\x1f".join(str(v) for v in vals)
                hit = True
                for i in range(num_hashes):
                    h = int(
                        hashlib.md5(f"{i}|{key}".encode()).hexdigest()[:15], 16
                    ) % num_bits
                    if not (bits[h >> 3] >> (h & 7)) & 1:
                        hit = False
                        break
                out.append(hit)
            pdf = pdf.copy()
            pdf[result_col] = pd.Series(out, dtype=bool, index=pdf.index)
            yield pdf

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {result_col} boolean"
    return df.mapInPandas(kernel, out_schema)
