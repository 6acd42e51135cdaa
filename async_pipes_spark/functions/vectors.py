"""Vector (embedding) primitives on ``array<float>`` columns.

All JVM-side (no Python UDFs): ``zip_with`` + ``aggregate`` run inside
whole-stage codegen, so brute-force similarity scans stay on the Spark
executors at full speed.

Determinism contract: dot products accumulate in **float32** — the same
sequential float fold DuckDB's ``list_inner_product`` performs — so
oracle comparisons are bit-exact. Float outputs are canonicalized to
integer micro-units (``floor(x*1e6 + 0.5)``), never raw doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_f32(a: Column | str, b: Column | str) -> Column:
    """Sequential float32 dot product of two array<float> columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0).cast("float"),
        lambda acc, v: acc + v,
    )


def norm_f32(a: Column | str) -> Column:
    """L2 norm (double sqrt of the float32 self-dot)."""
    return F.sqrt(dot_f32(a, a).cast("double"))


def cosine_sim_f32(a: Column | str, b: Column | str, a_norm: Column | None = None, b_norm: Column | None = None) -> Column:
    """Cosine similarity as double; norms may be precomputed columns."""
    an = a_norm if a_norm is not None else norm_f32(a)
    bn = b_norm if b_norm is not None else norm_f32(b)
    return dot_f32(a, b).cast("double") / (an * bn)


def micro_units(x: Column | str, scale: int = 1_000_000) -> Column:
    """Canonicalize a double to integer micro-units: floor(x*1e6+0.5).

    Pure IEEE-754 ops (*, +, floor) — identical in Spark and DuckDB —
    so hashes match without decimal-rounding edge cases.
    """
    return F.floor(_c(x).cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
