"""Distributed prefix scan (running/cumulative aggregation over a
GLOBAL order) — the scalable form of ``sum() OVER (ORDER BY k)``.

A plain unpartitioned window (``Window.orderBy(k)`` with no
partitionBy) funnels the ENTIRE dataset through one task — the classic
scale-killer Spark even warns about ("No Partition Defined for Window
operation"). The distributed algorithm is the textbook two-phase scan
(Blelloch-style, the same shape every MPP engine uses):

1. range-repartition on the order key, so partition *i* holds a
   contiguous key range below partition *i+1*'s;
2. one pass computing per-partition TOTALS — a bounded driver collect
   of exactly ``num_partitions`` rows (one long each), never data;
3. exclusive-prefix those totals on the driver (trivial) and hand
   partition *i* its offset; a second pass adds local cumsum + offset.

One materialized pass over the data (localCheckpoint pins the range
boundaries between the totals job and the final plan), one bounded
collect, no single-task funnel.
The reference engine has no ordered-scan primitive at all (its pipes
are unordered channels); this is the engine's own surface, used by the
sequence-packing manifest (t10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from async_pipes_spark.session import pin as _pin


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
    return_total: bool = False,
):
    """Add ``out_col`` = inclusive running sum of ``value_col`` in
    ``order_col`` order. Ties are well-defined: range partitioning
    co-locates equal keys and the window's default RANGE frame gives
    tied rows the tied-group total — exactly the serial
    ``SUM() OVER (ORDER BY)`` semantics (property-tested).

    Equals ``SUM(value) OVER (ORDER BY order_col)`` but without the
    single-partition window: per-partition local windows (keyed by the
    range-partition id, so each window task sees one partition's rows)
    plus driver-prefixed offsets. The only driver data is one
    (pid, total) row per partition. NULL order keys are rejected —
    Spark's window default orders them first, most SQL engines' last,
    so a running sum over nullable keys has no portable meaning.

    ``return_total=True`` returns ``(df, grand_total)`` — the totals
    collect already holds the per-partition sums on the driver, so the
    overall sum is free; consumers that need N or ΣV (ntile math,
    coverage denominators) should take it here instead of paying an
    extra aggregation job over the pinned output."""
    sess = df.sparkSession
    n = num_partitions or sess.sparkContext.defaultParallelism
    # localCheckpoint PINS the range partitioning: the totals collect
    # and the returned plan are separate executions, and the range
    # partitioner's reservoir sampling is NOT guaranteed to pick the
    # same boundaries twice on data bigger than its sample — offsets
    # computed against pass-1 boundaries would silently mismatch
    # pass-2 partitions. Materializing once also means one scan, not
    # two.
    ranged = (
        df.repartitionByRange(n, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .transform(_pin)
    )
    # bounded collect: one row per partition (pid, min_key, total).
    # count vs count(order_col) also flags NULL keys without an extra
    # pass — min() skips them, so an all-NULL partition's _lo is None
    # and the offset sort would crash; better to fail with the contract.
    totals = (
        ranged.groupBy("_pid")
        .agg(
            F.min(order_col).alias("_lo"),
            F.sum(value_col).alias("_tot"),
            (F.count(F.lit(1)) - F.count(order_col)).alias("_nulls"),
        )
        .collect()
    )
    if any(r["_nulls"] for r in totals):
        raise ValueError(
            f"prefix_sum requires non-null {order_col!r} keys (engines "
            "disagree on where NULLs sort in a running sum)"
        )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["_lo"]):
        offsets[r["_pid"]] = acc
        acc += r["_tot"] or 0
    if any(offsets.values()):
        off_map = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        offset = F.coalesce(off_map[F.col("_pid")], F.lit(0))
    else:
        # empty input or a single non-empty partition: offsets all zero
        # (create_map() with no entries is untyped and fails analysis)
        offset = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(order_col)
    out = (
        ranged.withColumn(out_col, F.sum(value_col).over(w) + offset)
        .drop("_pid")
    )
    if return_total:
        return out, acc
    return out
