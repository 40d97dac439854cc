"""Deterministic numeric aggregation helpers.

Double-precision SUM is order-dependent, and Spark's shuffle order differs
from DuckDB's scan order — so a naive ``sum(double)`` can hash-mismatch the
oracle in the last ulp. The fix used engine-wide: cast each row's value to
``DECIMAL(18,4)`` (deterministic rounding of the same IEEE double in both
engines), aggregate exactly in decimal (associative ⇒ order-independent),
and cast the final result back to DOUBLE. At 100 TB this also means partial
(map-side) aggregation is safe to reorder freely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum: decimal-exact internally, DOUBLE result."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent avg: exact decimal sum / count, divided in DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


# Exact decimal factor arithmetic for price*(1-disc)*(1+tax)-style products.
# Casting the double PRODUCT to decimal is engine-dependent at half-way points
# (Spark rounds the shortest-string repr, DuckDB the binary value), but the
# FACTORS are true 2-decimal values, so casting them is unambiguous and the
# decimal multiplication is then exact in both engines.
MONEY = "decimal(12,2)"
RATE = "decimal(3,2)"


def money(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return money("l_extendedprice") * (F.lit(1) - rate("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * (F.lit(1) + rate("l_tax"))


O_DISC_PRICE = "(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))))"
O_CHARGE = f"({O_DISC_PRICE} * (1 + CAST(l_tax AS DECIMAL(3,2))))"


# The oracle-side (DuckDB) equivalents, for building matching SQL strings.
def o_dsum(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)"


def o_davg(expr: str) -> str:
    return f"(CAST(sum(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE) / count({expr}))"
