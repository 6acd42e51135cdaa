"""Exact money arithmetic.

Canonicalization contract shared with the DuckDB oracles (FIXTURES.md,
adjusted this build): all money columns in the test data are exact
2-decimal values stored as doubles, so we cast to DECIMAL(18,2) FIRST
and do all arithmetic in decimal space. That makes every money result
bit-exact and engine-independent — no double-rounding divergence
(Spark's round() uses HALF_UP on the shortest decimal representation,
DuckDB rounds the scaled binary value; they disagree on doubles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec2(col: Column | str) -> Column:
    """Cast an exact-2-decimal double column to DECIMAL(18,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def money_sum(col: Column | str, alias: str) -> Column:
    """SUM over decimal money, result re-cast to DECIMAL(18,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast(DEC).alias(alias)
