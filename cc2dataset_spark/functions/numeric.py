"""Cross-engine-exact numeric canonicalization.

``round(double, 6)`` is NOT cross-engine reproducible on ratios of
integers: Spark routes doubles through BigDecimal's shortest decimal
representation (so a double whose shortest repr reads "…5625" rounds
UP at 6 dp) while DuckDB rounds the binary value (which for the same
double can sit just below the half boundary and round DOWN). The
sf0.1 oracle sweep caught exactly this flip on q2's unit costs. For
ratios of BIGINTs (Jaccard, containment) the fix is to round the
RATIONAL, not the double: round-half-up in pure integer arithmetic,
then one identical double division by 10^6 — bit-identical in any
engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RATIO6_SCALE = 1_000_000


def ratio_round6(num: Column, den: Column) -> Column:
    """``round(num / den, 6)`` (round-half-up, the exact rational —
    not the double) for BIGINT ``num``/``den`` with ``den > 0``:
    ``(2*10^6*num + den) div (2*den) / 10^6``.

    The integer quotient is Spark's ``div`` (IntegralDivide) — pure
    BIGINT, whole-stage codegen, exact wherever ``n = 2*10^6*num +
    den`` fits a BIGINT, i.e. ``num <~ 4.6e12`` (r8: the previous
    formulation divided in DOUBLE, which silently truncated to q-1
    above ~4.5e9 while DuckDB's BIGINT ``//`` stayed exact). Past the
    BIGINT ceiling BOTH engines now fail loudly (Spark 4 defaults
    ANSI on → ARITHMETIC_OVERFLOW; DuckDB raises on BIGINT overflow)
    rather than drift — for numerators that can genuinely exceed
    ~4.6e12 (corpus-total token budgets at 100 TB) use
    :func:`ratio_round6_big`, the DECIMAL(38) twin.

    SQL twin: :data:`RATIO6_SQL` (str.format with num/den fragments).

    Inputs are widened to BIGINT here: callers routinely pass
    INT-typed counts (``F.size``), and ``2*10^6 * int32`` overflows —
    loudly under ANSI — for any count above 1073.
    """
    num, den = num.cast("bigint"), den.cast("bigint")
    n = F.lit(2 * RATIO6_SCALE) * num + den
    d = F.lit(2) * den
    q = F.call_function("div", n, d)
    return q.cast("double") / F.lit(float(RATIO6_SCALE))


# DuckDB twin of ratio_round6 — `//` is BIGINT floor division there.
RATIO6_SQL = (
    "(CAST((2000000 * ({num}) + ({den})) // (2 * ({den})) AS DOUBLE)"
    " / 1000000)"
)


def ratio_round6_big(num: Column, den: Column) -> Column:
    """:func:`ratio_round6` for numerators beyond the BIGINT ceiling
    (``num`` up to ~10^31): the identical round-half-up rational in
    DECIMAL(38,0) arithmetic. Off the Tungsten long fast path — use
    only where the magnitude demands it (per-language token budgets at
    100 TB reach ~10^13, where the fast path's ``2*10^6*num`` would
    wrap). SQL twin: :data:`RATIO6_BIG_SQL` (HUGEINT ``//``)."""
    n = (F.lit(2 * RATIO6_SCALE) * num.cast("decimal(38,0)") + den).cast(
        "decimal(38,0)"
    )
    d = (F.lit(2) * den).cast("decimal(38,0)")
    q = F.call_function("div", n, d)
    return q.cast("double") / F.lit(float(RATIO6_SCALE))


# DuckDB twin of ratio_round6_big — HUGEINT keeps the product exact
# far past the BIGINT ceiling; `//` floor division matches div.
RATIO6_BIG_SQL = (
    "(CAST((2000000 * CAST(({num}) AS HUGEINT) + ({den}))"
    " // (2 * CAST(({den}) AS HUGEINT)) AS DOUBLE) / 1000000)"
)
