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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_WIDTH = 12  # 48-bit fractions: exact in doubles, wide enough for ppm rates
HEX_SPACE = float(16**HEX_WIDTH)


def _null_safe_key(cols) -> Column:
    """Key-column concatenation for hashing: components joined by unit
    separator 0x1f, with NULL components mapped to a NUL sentinel —
    ``concat_ws`` SKIPS nulls, so without the sentinel ('a', NULL),
    (NULL, 'a') and ('a',) would all hash identically and every
    sketch/sample over nullable keys would silently conflate them.
    Single-column NON-NULL keys produce exactly ``cast(col as string)``
    (what the DuckDB oracles replicate); a real value equal to the
    one-byte NUL string is the only possible collision."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit("\x00"),
        )
        for c in cols
    ]
    return F.concat_ws("\x1f", *parts)


def hash_hex(*cols: Column | str) -> Column:
    """Uniform 12-hex-char hash of the (concatenated) key columns.
    Components are joined with unit separator 0x1f so ('a','bc') and
    ('ab','c') hash differently; NULL components are sentinel-encoded
    (see _null_safe_key) so they stay distinguishable."""
    return F.substring(F.md5(_null_safe_key(cols)), 1, HEX_WIDTH)


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


def _bloom_positions(cols: list[str], num_bits, num_hashes: int):
    """The md5-derived bit positions of one key, as JVM columns:
    position_i = int(md5("i|" + key)[:15 hex], 16) % m, with
    key = values cast to string joined by unit separator 0x1f. Pure
    whole-stage-codegen (md5/conv/pmod are built-ins) — no Python
    touches a row — and engine-replicable (the same formula is plain
    SQL in DuckDB or anything with md5). ``num_bits`` may be an int or
    a Column (per-file filter sizes — the file-level bloom sidecar).
    :func:`bloom_positions_py` is the driver-side twin; the two MUST
    stay bit-identical or skipping grows false negatives."""
    key = _null_safe_key(cols)
    m = F.lit(num_bits) if isinstance(num_bits, int) else num_bits
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}|"), key)), 1, 15), 16, 10
            ).cast("long"),
            m,
        )
        for i in range(num_hashes)
    ]


def bloom_positions_py(key: str, num_bits: int, num_hashes: int) -> list[int]:
    """Driver-side twin of :func:`_bloom_positions` for a single
    already-rendered key string — used by planners that probe stored
    per-file filters without launching a job. Same formula, same
    bytes."""
    import hashlib

    return [
        int(hashlib.md5(f"{i}|{key}".encode()).hexdigest()[:15], 16) % num_bits
        for i in range(num_hashes)
    ]


#: Adaptive sizing: bits per (estimated) distinct key. With k=4
#: hashes, 16 bits/key gives FPR (1 - e^(-4/16))^4 ≈ 0.24% — far
#: inside k2's 10% contract at ANY corpus scale, where a fixed 65536
#: bits saturates (FPR → 1) past ~10^5 keys.
BLOOM_BITS_PER_KEY = 16
BLOOM_MIN_BITS = 1 << 16
#: adaptive-sizing ceiling (16 MB of filter): keeps the driver collect
#: and the task-shipped bitset bounded no matter the corpus (see
#: bloom_build); beyond ~2^23 keys the filter saturates gracefully
BLOOM_MAX_BITS = 1 << 27


def bloom_build(
    df: DataFrame,
    cols: list[str],
    num_bits: int | None = None,
    num_hashes: int = 4,
) -> bytes:
    """Build a DETERMINISTIC Bloom filter over the key columns and
    return its bitset — the classic membership primitive for pruning a
    100 TB probe side before a join (ship the filter to the scan, drop
    rows that cannot match). Spark's internal bloom_filter_agg is not
    SQL-exposed and its bitset is implementation-defined; this one's
    positions are md5-derived (see _bloom_positions), so any engine
    agrees on every bit.

    ``num_bits=None`` (default) sizes the filter from the data: one
    cheap ``approx_count_distinct`` pass (HLL++, mergeable, no extra
    shuffle of the keys) estimates the distinct key count, and the
    filter gets ``BLOOM_BITS_PER_KEY`` bits per key (min
    ``BLOOM_MIN_BITS``, rounded up to whole bytes). A FIXED size is
    scale-fragile — correct at the scale it was tuned for, saturated
    (every probe a false positive) at 10× — so adaptive is the
    default; pass an explicit ``num_bits`` only when two filters must
    be merged bit-for-bit (same size required) or replicated by an
    external engine.

    Scale shape: position hashing is whole-stage-codegen JVM; the only
    data that ever reaches the driver is the DISTINCT SET BIT INDEXES —
    bounded by num_bits (≤ m rows of one long), independent of corpus
    size, arriving pre-deduplicated from a map-side-partial distinct.
    (The earlier per-partition-bitset formulation looped Python md5 per
    row — measured 3 s on 150k rows; this shape is pure JVM.)"""
    if num_bits is None:
        est = df.agg(
            F.approx_count_distinct(_null_safe_key(cols)).alias("d")
        ).head()[0] or 0
        # adaptive sizing is CAPPED: 16 bits/key but never beyond
        # BLOOM_MAX_BITS (default 2^27 = 16 MB of filter). Uncapped,
        # a 1e9-distinct-key corpus would size the filter at 16e9
        # bits, making the "bounded by num_bits" driver collect and
        # the task-shipped bitset effectively O(keys) — the exact
        # unboundedness the sketch exists to avoid. At the cap the
        # filter saturates gracefully (FPR rises, never a false
        # negative); callers needing lower FPR at that scale should
        # partition the key space into multiple filters.
        num_bits = min(
            BLOOM_MAX_BITS,
            max(BLOOM_MIN_BITS, -(-est * BLOOM_BITS_PER_KEY // 8) * 8),
        )
    if num_bits % 8:
        # positions are taken mod num_bits but the bitset holds whole
        # bytes; a ragged tail would either IndexError on build or make
        # bloom_probe re-derive a DIFFERENT modulus from len(bitset)*8 —
        # false negatives, violating the hard guarantee
        raise ValueError("num_bits must be a multiple of 8")
    # Arrow collect (toPandas), not .collect(): at the adaptive cap the
    # distinct set-bit indexes can approach num_bits (~1.3e8) — as
    # heavyweight Row objects that is multi-GB on the driver; as one
    # Arrow int64 column it is ~1 GB worst-case and the bitset assembly
    # is a vectorized scatter instead of a Python loop
    pos = (
        df.select(
            F.explode(
                F.array(*_bloom_positions(cols, num_bits, num_hashes))
            ).alias("p")
        )
        .distinct()
        .toPandas()["p"]
        .to_numpy(dtype=np.int64)
    )
    bits = np.zeros(num_bits // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits.tobytes()


def bloom_probe(
    df: DataFrame,
    cols: list[str],
    bitset: bytes,
    num_hashes: int = 4,
    result_col: str = "might_contain",
) -> DataFrame:
    """Probe a bloom_build bitset: adds ``result_col`` (boolean). The
    positions compute JVM-side; the bitset lookup is one vectorized
    Arrow batch op over the PACKED bytes (closed over and shipped with
    the task at 1/8 the memory of an unpacked bool array — at the
    16 MB adaptive cap, unpacking would pin 128 MB per Python worker).
    False negatives are impossible by construction."""
    from pyspark.sql.functions import pandas_udf

    num_bits = len(bitset) * 8
    packed = np.frombuffer(bitset, dtype=np.uint8)

    @pandas_udf("boolean")
    def _contains(parr: pd.Series) -> pd.Series:
        if len(parr) == 0:
            return pd.Series([], dtype=bool)
        P = np.stack(parr.to_numpy()).astype(np.int64)
        hit = (packed[P >> 3] >> (P & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    pos_array = F.array(*_bloom_positions(cols, num_bits, num_hashes))
    return df.withColumn(result_col, _contains(pos_array))


def count_min_build(
    df: DataFrame,
    cols: list[str],
    width: int = 1024,
    depth: int = 3,
) -> DataFrame:
    """Count-min sketch of key frequencies as a (i, b, cnt) table —
    the mergeable heavy-hitter / frequency primitive (merge = sum
    matching cells; the table is width×depth rows no matter the corpus
    size). Bucket positions reuse the bloom filter's md5-derived
    formula (engine-replicable: the DuckDB oracle rebuilds the exact
    sketch). One explode (depth rows per key occurrence) into one
    partially-aggregated groupBy — map-side combine collapses to at
    most width×depth rows per partition before the shuffle."""
    pos = _bloom_positions(cols, width, depth)
    return (
        df.select(F.posexplode(F.array(*pos)).alias("i", "b"))
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_lookup(
    sketch: DataFrame,
    items: DataFrame,
    cols: list[str],
    width: int = 1024,
    depth: int = 3,
    result_col: str = "cms_n",
) -> DataFrame:
    """Estimate each item's frequency from a count_min_build sketch:
    min over the depth rows of the item's bucket counts (missing
    bucket = 0). Overestimates only — cms_n >= true count is a hard
    guarantee (collisions add, never subtract). The sketch's published
    (i, b, cnt) schema is aliased to internal names before the join,
    so item frames carrying their own 'i'/'b'/'cnt' columns (natural
    for frequency tables) don't hit ambiguous-reference errors."""
    clash = {"_cm_i", "_cm_b", "_cm_cnt", result_col} & set(items.columns)
    if clash:
        raise ValueError(f"column names reserved by count_min_lookup: {sorted(clash)}")
    pos = _bloom_positions(cols, width, depth)
    keyed = items.select(
        *items.columns, F.posexplode(F.array(*pos)).alias("_cm_i", "_cm_b")
    )
    sk = sketch.select(
        F.col("i").alias("_cm_i"),
        F.col("b").alias("_cm_b"),
        F.col("cnt").alias("_cm_cnt"),
    )
    return (
        keyed.join(sk, ["_cm_i", "_cm_b"], "left")
        .fillna(0, subset=["_cm_cnt"])
        .groupBy(*items.columns)
        .agg(F.min("_cm_cnt").cast("bigint").alias(result_col))
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    sketch_size: int = 256,
) -> DataFrame:
    """Mergeable quantile summary (Agarwal et al., "Mergeable
    Summaries" shape): per Arrow BATCH, sort the batch's values per
    group and keep ``sketch_size`` evenly-rank-spaced points, each
    weighted batch_rows/sketch_size. Output (group_cols..., v, w) —
    a weighted CDF whose rank error vs the true CDF is bounded by
    Σ_batches m_b/(2B) = n/(2B), independent of partitioning or
    merge order (the summaries just concatenate).

    Scale shape: ONE pass over the data with NO input shuffle (the
    kernel runs inside the scan stage), executor memory bounded by the
    Arrow batch (never the partition), and only the ≤ B-per-batch
    summary rows ever move. Downstream (:func:`quantile_merge`)
    shuffles summaries, not data — at 100 TB the quantile job moves
    megabytes."""
    if sketch_size < 2:
        raise ValueError("sketch_size must be >= 2")
    clash = {c for c in group_cols if c in ("v", "w")} | (
        {value_col} if value_col == "w" else set()
    )
    if clash:
        # the summary schema reserves 'v'/'w'; a group column of either
        # name (or a value column named 'w') would silently clobber the
        # sorted values or weights. A value column named 'v' is fine —
        # it maps onto the summary's own value column.
        raise ValueError(
            f"column names {sorted(clash)} collide with the summary's "
            "reserved 'v'/'w' columns; alias them before sketching"
        )
    B = sketch_size
    fields = df.select(*group_cols, value_col).schema
    schema_out = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields[:-1]]
        + [f"v {fields[-1].dataType.simpleString()}", "w double"]
    )

    def summarize(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                v = np.sort(g[value_col].to_numpy())
                m = len(v)
                if m <= B:
                    keep, w = v, np.ones(m)
                else:
                    idx = np.floor((np.arange(B) + 0.5) * m / B).astype(np.int64)
                    keep, w = v[idx], np.full(B, m / B)
                summ = pd.DataFrame({"v": keep, "w": w})
                for c, kv in zip(group_cols, key):
                    summ[c] = kv
                out.append(summ[[*group_cols, "v", "w"]])
            if out:
                yield pd.concat(out, ignore_index=True)

    return df.select(*group_cols, value_col).mapInPandas(summarize, schema_out)


def quantile_merge(
    summaries: DataFrame,
    group_cols: list[str],
    probs: list[float],
) -> DataFrame:
    """Merge :func:`quantile_sketch` summaries and read off quantile
    estimates: per group, sort the weighted points, walk the
    cumulative weight, and report the first value whose cumulative
    weight reaches prob×total. Output (group_cols..., prob, est) —
    est is always one of the input values. The merge is a groupBy over
    summary rows only (bounded: batches × sketch_size per group), so
    the shuffle is tiny regardless of corpus size; merging summaries
    of summaries works identically (weighted points concatenate)."""
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not 0.0 < p < 1.0:
            raise ValueError(f"prob {p} outside (0, 1)")
    bad = {c for c in group_cols if c in ("v", "w", "prob", "est")}
    if bad:
        raise ValueError(
            f"group columns {sorted(bad)} collide with the summary/output's "
            "reserved v/w/prob/est columns; alias them before sketching"
        )
    fields = summaries.select(*group_cols, "v").schema
    schema_out = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields[:-1]]
        + [f"prob double", f"est {fields[-1].dataType.simpleString()}"]
    )
    probs_arr = sorted(probs)

    def merge(key, pdf):
        v = pdf["v"].to_numpy()
        w = pdf["w"].to_numpy()
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1]
        idx = np.searchsorted(cw, np.asarray(probs_arr) * total, side="left")
        idx = np.minimum(idx, len(v) - 1)
        out = pd.DataFrame({"prob": probs_arr, "est": v[idx]})
        for c, kv in zip(group_cols, key):
            out[c] = kv
        return out[[*group_cols, "prob", "est"]]

    return summaries.groupBy(*group_cols).applyInPandas(merge, schema_out)
