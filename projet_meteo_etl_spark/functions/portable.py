"""Cross-engine-portable numeric helpers.

``ROUND(x, n)`` is NOT portable between engines when x sits exactly on
a half boundary: Spark rounds the exact BigDecimal value of the double
(HALF_UP), DuckDB rounds via scaled floating-point — with exact-cent
source data (prices, 2-decimal measurements) aggregate averages land on
halves systematically and the two engines disagree by one ulp of the
last digit.

``pround`` instead computes ``floor(x * 10^n + 0.5) / 10^n`` — every
step is a deterministic IEEE-754 operation that any engine evaluates
bit-identically, so Spark output and oracle SQL output hash the same.
(Which way an exact half rounds is irrelevant; both engines agreeing is
what matters.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, n: int) -> Column:
    """Portable round-half-up-toward-+inf at ``n`` decimals."""
    c = F.col(col) if isinstance(col, str) else col
    s = float(10**n)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def pround_sql(expr: str, n: int) -> str:
    """The identical formula as SQL text (DuckDB/ANSI)."""
    s = 10**n
    return f"floor(({expr}) * {s}.0 + 0.5) / {s}.0"
