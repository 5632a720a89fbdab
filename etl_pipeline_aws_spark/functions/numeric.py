"""Deterministic numeric aggregation.

Floating-point addition is not associative: Spark's partial-aggregate tree
and DuckDB's scan order sum doubles in different orders, so ``SUM(double)``
can differ in the last ulp between the engines and break the driver's
value-hash comparison.  The fix is exact decimal arithmetic on both sides:

    Spark : ``F.sum(col.cast("decimal(18,2)")).cast("double")``
    DuckDB: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``

Decimal sums are exact integers under the hood, so both engines produce the
*same* exact decimal, and the final cast to double is deterministic (values
are far below 2^53).  The oracle SQL strings in the operator modules mirror
these helpers expression-for-expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
RATE = "decimal(18,4)"


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum, surfaced as double. Partial aggregation (map-side
    combine) still applies — decimal sum is associative and exact."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """avg = exact decimal sum / count, both deterministic, divided as
    doubles (same two exact operands on both engines => same double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def dmul(a: Column | str, b: Column | str, scale_a: int = 2, scale_b: int = 4) -> Column:
    """Exact product of two decimal-cast columns (decimal × decimal is
    exact; Spark widens the result type, as does DuckDB)."""
    return dec(a, scale_a) * dec(b, scale_b)
