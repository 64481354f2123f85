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
    ``floor((2*10^6*num + den) / (2*den)) / 10^6``.

    Exactness bound: ``n = 2*10^6*num + den`` must stay below 2^53,
    i.e. ``num <~ 4.5e9`` (NOT 2^63 — the integer division is
    computed as ``(n - pmod(n, d)) / d`` and the subtraction only
    makes the double division exact while ``n - pmod(n, d)``, an
    exact multiple of d, is itself representable below 2^53; above
    that the double path can sit 1 ulp low and truncate to q-1 while
    DuckDB's pure-BIGINT ``//`` stays exact). Shingle/fingerprint/
    token counts are bounded by document size — orders of magnitude
    under the 4.5e9 ceiling; for genuinely larger numerators route
    through DECIMAL arithmetic instead of this primitive.

    SQL twin: :data:`RATIO6_SQL` (str.format with num/den fragments).
    """
    n = F.lit(2 * RATIO6_SCALE) * num + den
    d = F.lit(2) * den
    q = ((n - F.pmod(n, d)) / d).cast("bigint")
    return q.cast("double") / F.lit(float(RATIO6_SCALE))


# DuckDB twin of ratio_round6 — `//` is BIGINT floor division there.
RATIO6_SQL = (
    "(CAST((2000000 * ({num}) + ({den})) // (2 * ({den})) AS DOUBLE)"
    " / 1000000)"
)
