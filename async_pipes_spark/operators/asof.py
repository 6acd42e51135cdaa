"""As-of join — a custom operator Spark lacks natively (the brief's
canonical example): for every left row, attach the most recent right
row at-or-before its timestamp (backward) or earliest at-or-after
(forward), per key.

Implemented as a composition of existing DataFrame ops (no UDFs):
union the tagged sides, then a per-key ordered window carries the last
right row forward onto left rows. Cost = one shuffle on (by) + one
sort — the same as the sort-merge join Spark would need anyway; no
range explosion, no per-row Python.

The carried match is ONE STRUCT (timestamp + payload), never
per-column ``last(ignorenulls)`` carries: independent carries assemble
a "match" from DIFFERENT right rows whenever payload columns are
sparse (x from the older row, y from the newer — a row that never
existed), and the tolerance gate would then check a timestamp that
doesn't belong to the value it admits. Atomic struct carry is the
as-of semantics pandas merge_asof / DuckDB ASOF JOIN define.

Right rows with a NULL timestamp are dropped up front: under Spark's
nulls-first ascending sort they would sit at the head of every
backward window and be reported as matches for rows with no true
at-or-before match. A left row with NULL timestamp gets a NULL match.

At 100 TB: partition both sides by `by` (bucketing makes the shuffle
disappear); the window sort is per-key and spills safely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: "_on" is reserved too: the match struct names its timestamp field
#: _on, and a right payload column with that name would create an
#: ambiguous duplicate field inside the struct
_RESERVED = ("_src", "_m", "_mm", "_on")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: left rows keep their columns plus the matched
    right payload columns (null when no match). Ties on ``on`` match
    (at-or-before / at-or-after semantics, like pandas merge_asof with
    allow_exact_matches=True). Duplicate right rows at the same
    (by, on) instant resolve by a full-row hash — deterministic under
    any partitioning (prefer unique (by, on) on the right side; the
    tie-break only makes the arbitrary choice reproducible)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = [c for c in right.columns if c not in (on, by)]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    reserved = set(_RESERVED) & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"column names reserved by asof_join: {sorted(reserved)}")

    # a NULL-timestamp right row can never be "at or before/after"
    # anything; left NULL-timestamp rows fall through with a NULL match
    right = right.filter(F.col(on).isNotNull())

    rtypes = dict(zip(right.schema.names, [f.dataType for f in right.schema.fields]))
    m_type = T.StructType(
        [T.StructField("_on", rtypes[on])]
        + [T.StructField(c, rtypes[c]) for c in payload]
    )
    l_tag = left.select(
        *left.columns,
        F.lit(1).alias("_src"),
        F.lit(None).cast(m_type).alias("_m"),
    )
    r_tag = right.select(
        by,
        on,
        F.lit(0).alias("_src"),
        F.struct(
            F.col(on).alias("_on"), *[F.col(c) for c in payload]
        ).alias("_m"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in (on, by)
        ],
    ).select(*l_tag.columns)
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left at equal ts → exact matches hit;
        # the hash is the duplicate-right-row tie-break (left rows all
        # carry a NULL struct, so it never reorders them)
        w = Window.partitionBy(by).orderBy(
            F.col(on).asc(), F.col("_src").asc(), F.hash(F.col("_m")).asc()
        )
    else:
        # desc() alone sorts NULLS LAST, which would put a NULL-ts LEFT
        # row at the window's end where it has seen every right row —
        # a spurious "earliest right row" match. NULLS FIRST keeps the
        # docstring's contract: NULL-ts left rows match nothing (the
        # right side is already NULL-free).
        w = Window.partitionBy(by).orderBy(
            F.col(on).desc_nulls_first(),
            F.col("_src").asc(),
            F.hash(F.col("_m")).asc(),
        )
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = unioned.withColumn(
        "_mm", F.last(F.col("_m"), ignorenulls=True).over(w)
    )

    out = matched.filter(F.col("_src") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col(on)) - F.unix_micros(F.col("_mm._on"))
        )
        within = gap <= int(tolerance_seconds * 1_000_000)
        return out.select(
            *[c for c in left.columns],
            *[
                F.when(within, F.col(f"_mm.{c}")).otherwise(F.lit(None)).alias(c)
                for c in payload
            ],
        )
    return out.select(
        *left.columns, *[F.col(f"_mm.{c}").alias(c) for c in payload]
    )
