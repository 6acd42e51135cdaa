"""Multi-dimensional data layout: Z-order (Morton) clustering for
file-level data skipping.

The problem at 100 TB: parquet min/max statistics prune row groups /
files only when the data is CLUSTERED on the filter column. Sorting
clusters one column perfectly and destroys the others; analytics
filters hit several columns. Z-ordering interleaves the bits of the
filter columns into one sort key, so every participating column's
values are approximately clustered — each file covers a small
hyper-rectangle of the filter space, and a selective conjunctive
predicate intersects few files (the Delta Lake / Databricks
``OPTIMIZE ZORDER BY`` idiom, public since the original
Morton-curve literature).

Spark-first shape: the z-value is a pure JVM bit-expression (stays
inside whole-stage codegen — no UDF), the placement is ONE
``repartitionByRange`` (sampled range boundaries, skew-proof) plus a
within-partition sort, and the stats pass is a single bounded
min/max aggregation. Nothing is collected but one stats row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2 dims -> 32-bit z-values, 4 dims -> 64-bit.
DEFAULT_BITS = 16
MAX_ZORDER_COLS = 4


def zorder_value(
    df: DataFrame, cols: Sequence[str], bits: int = DEFAULT_BITS
) -> Column:
    """Morton z-value column over ``cols`` (numeric), each linearly
    quantized to ``bits`` bits against ITS OWN min/max (one bounded
    stats job on ``df``). NULL quantizes to bucket 0 (sorts first —
    nulls cluster together, which is exactly what skipping wants);
    a constant column contributes bucket 0 everywhere.

    The interleave is a sum of ``len(cols) * bits`` shift/mask terms —
    a plain JVM expression Catalyst folds into whole-stage codegen, so
    the z-value costs no Python round-trip at any scale."""
    if not 1 <= len(cols) <= MAX_ZORDER_COLS:
        raise ValueError(
            f"zorder_value takes 1..{MAX_ZORDER_COLS} columns, got {len(cols)}"
        )
    # the interleave must stay below bit 63: bigint's sign bit would
    # make high z-values sort NEGATIVE (4 cols × 16 bits puts the last
    # bit exactly on 63) — clamp bits so n*bits <= 63
    bits = min(bits, 63 // len(cols))
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    n = len(cols)
    top = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        mn = float(stats[f"mn_{j}"]) if stats[f"mn_{j}"] is not None else 0.0
        mx = float(stats[f"mx_{j}"]) if stats[f"mx_{j}"] is not None else 0.0
        if mx > mn:
            scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn)
            q = F.least(
                F.lit(top),
                F.greatest(F.lit(0), F.floor(scaled * F.lit(float(top) + 1.0))),
            ).cast("bigint")
        else:
            q = F.lit(0).cast("bigint")
        q = F.coalesce(q, F.lit(0).cast("bigint"))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j
                ).cast("bigint")
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 16,
    bits: int = DEFAULT_BITS,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on the z-order of ``cols``:
    ``repartitionByRange`` on the z-value (sampled boundaries — equal
    file sizes even when the z-space is skewed) + a within-partition
    sort, so every output file covers a tight hyper-rectangle of the
    filter space and parquet min/max stats prune it against
    conjunctive predicates on any subset of ``cols``.

    At 100 TB this is the table-maintenance job (the OPTIMIZE ZORDER
    shape): one stats row collected, one range shuffle, no skew (range
    boundaries are sampled from the data), out-of-memory-safe (sort
    spills). The z helper column is dropped before writing — layout is
    an on-disk property, not a schema change."""
    (
        zorder_frame(df, cols, num_files=num_files, bits=bits)
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def zorder_frame(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """The Morton-clustered FRAME behind :func:`write_zordered`:
    range-partitioned on the z-value (sampled boundaries, skew-proof)
    and sorted within partitions, helper column dropped. Writers that
    control their own commit (e.g. manifest tables) write this frame
    directly — parquet preserves per-partition row order, so each
    output file stays a tight z-range."""
    z = zorder_value(df, cols, bits=bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def file_clustering_report(path: str, cols: Sequence[str]):
    """Per-file [min, max] bounding boxes for ``cols`` from the
    parquet FOOTERS (metadata only — no data read): a list of
    ``{file, col: (min, max), ...}`` dicts. The clustering quality
    measure for tests/maintenance: the mean normalized box volume of
    a well-z-ordered layout is a small fraction of a random layout's
    (each random file spans nearly the full space)."""
    import pyarrow.dataset as ds

    out = []
    dataset = ds.dataset(path, format="parquet")
    for frag in dataset.get_fragments():
        md = frag.metadata
        names = frag.physical_schema.names
        idx = {c: names.index(c) for c in cols}
        box: dict = {"file": frag.path}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        for c in cols:
            box[c] = (lo[c], hi[c])
        out.append(box)
    return out
