"""Column-expression helpers shared across operators.

The key discipline here is *deterministic aggregation of monetary doubles*.
The reference stores money as NUMERIC(7,2) but lets it travel as double
(SURVEY.md §1.2, a precision hazard we fix): summing doubles is
order-dependent, and Spark's partial aggregation order varies with
partitioning — which would break both run-to-run reproducibility and the
DuckDB-oracle value-hash. Every sum/avg over a 2-decimal "money" double
therefore casts to DECIMAL first (exact, order-independent), aggregates,
and casts the final scalar back to double. The matching oracle SQL uses
the identical CAST chain, so both engines compute bit-identical doubles.

At 100 TB this matters more, not less: more partitions → more summation
orders → more float drift. Decimal aggregation is also whole-stage
codegen'd JVM arithmetic — no Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide-enough exact decimal for 2-dp money at 100 TB row counts:
# DECIMAL(18,2) per row; Spark widens sums to DECIMAL(28,2) internally.
MONEY = "decimal(18,2)"


def money(col: str | Column) -> Column:
    """Exact 2-dp decimal view of a money-ish double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: str | Column) -> Column:
    """Order-independent sum of a 2-dp double, returned as double.

    Oracle-SQL equivalent: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    """
    return F.sum(money(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Deterministic mean of a 2-dp double: exact decimal sum / count.

    Oracle-SQL equivalent:
        CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)
    (double division of two deterministic operands — bit-stable).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(money(c)).cast("double") / F.count(c)


def revenue_expr() -> Column:
    """TPC-H style revenue l_extendedprice*(1-l_discount), exact decimal.

    Both factors are 2-dp doubles; the decimal product is exact
    (DECIMAL(18,2) × DECIMAL(18,2) → DECIMAL(37,4)), so the sum is exact
    and order-independent.  Oracle:
        CAST(l_extendedprice AS DECIMAL(18,2)) *
        (1 - CAST(l_discount AS DECIMAL(18,2)))
    """
    return money("l_extendedprice") * (F.lit(1) - money("l_discount"))


# The oracle-side SQL fragments matching the helpers above.  Centralized so
# every query module builds its SQL from the same strings.
SQL_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE)"
SQL_DAVG = "CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({x})"
SQL_REVENUE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def token_ngrams(toks: str | Column, n: int) -> Column:
    """n-token shingles ("a b c") from a *bound* token-array column — O(L).

    The token array MUST be a materialized column of a prior projection,
    not an inline split(...) expression: each position then reads its
    n-1 right neighbors via element_at on the shared array. Inlining the
    split would make every element access re-split the text — O(L²·n)
    per document, which is exactly the plan CollapseProject would build
    if the array were cheap enough to inline (it isn't, so the
    projection boundary holds and the split runs once per row).
    """
    c = F.col(toks) if isinstance(toks, str) else toks
    return F.transform(
        F.slice(c, F.lit(1), F.greatest(F.size(c) - (n - 1), F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", x, *[F.element_at(c, i + k + 1) for k in range(1, n)]
        ),
    )
