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


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec2(col: Column | str) -> Column:
    """Cast an exact-2-decimal double column to DECIMAL(18,2)."""
    return _c(col).cast(DEC)


def money_sum(col: Column | str, alias: str) -> Column:
    """SUM over decimal money, result re-cast to DECIMAL(18,2)."""
    return F.sum(_c(col)).cast(DEC).alias(alias)


# -- integer-cents fast path -----------------------------------------
#
# For 2-decimal inputs, money can be carried as BIGINT cents: the hot
# path then runs whole-stage-codegen long arithmetic instead of
# per-row BigDecimal, with identical results (conversion is exact:
# x*100 is within <0.5 of the true integer, so floor(x*100+0.5)
# recovers it for either sign). Half-up rounding of derived 4-decimal
# products assumes positive amounts (all money columns here are).


def cents(col: Column | str) -> Column:
    """Exact BIGINT cents of a 2-decimal double column."""
    return F.floor(_c(col).cast("double") * 100 + F.lit(0.5)).cast("bigint")


def cents_to_dec(col: Column | str, alias: str) -> Column:
    """BIGINT cents → DECIMAL(18,2) (exact decimal division)."""
    return (_c(col).cast("decimal(20,0)") / 100).cast(DEC).alias(alias)


def revenue_cents(amount: Column | str, frac: Column | str) -> Column:
    """ROUND(a * (1 - b), 2) in BIGINT cents, for 2-decimal positive
    ``a`` and 2-decimal ``b`` in [0,1) — the revenue kernel. Exact:
    a_cents * (100 - b_pct) is an integer with 4 implied decimals;
    half-up to cents via floor((x+50)/100) (values < 2^53, so the
    double division is exact)."""
    ten_thousandths = cents(amount) * (100 - cents(frac))
    return F.floor((ten_thousandths + 50) / 100).cast("bigint")
