"""Cross-engine-reproducible hash primitives.

The LSH family (MinHash shingle hashing, band bucketing) needs a hash
that the DuckDB correctness oracle can replay bit-for-bit. Spark's
``xxhash64`` has no DuckDB twin; ``md5`` exists in both engines, and
DuckDB additionally exposes ``md5_number_lower(s)`` — the lower 8 bytes
of the digest interpreted little-endian as a UBIGINT. This module
reconstructs exactly that value from Spark's hex-string ``md5`` so both
engines agree on every hash (parity fuzz-tested in
tests/test_llm_ops.py).

Scale note: md5 is a few x slower per call than xxhash64, but shingle
hashing is a once-per-token-ish map-side cost dwarfed by the LSH
shuffle; determinism across engines is worth it. Operators whose hash
choice cannot change the OUTPUT keep xxhash64 for speed: skew salting
(operators/joins.py) and LSH band bucket keys (bucket hashing only
creates candidate pairs, which exact verification filters). IVF
centroid seeding (operators/similarity.py) uses md5_number_lower — its
sample IS the output-determining index, so it must be replayable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_number_lower(col: Column | str) -> Column:
    """Lower 64 bits of md5(col), little-endian, as DECIMAL(20,0) —
    exact twin of DuckDB's ``md5_number_lower``.

    Digest bytes 8..15 are hex chars 17..32 of Spark's ``md5`` output;
    little-endian means byte 15 is most significant, so the hex pairs
    are concatenated in reverse before base-16 conversion. ``conv``
    handles the full unsigned-64 range; DECIMAL(20,0) holds it exactly
    (BIGINT would overflow above 2^63).
    """
    c = F.col(col) if isinstance(col, str) else col
    hx = F.md5(c)
    rev = F.concat(*[F.substring(hx, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(rev, 16, 10).cast("decimal(20,0)")


def md5_long63(col: Column | str) -> Column:
    """Lower 63 bits of md5(col) as signed BIGINT — the 8-byte shuffle
    key form of :func:`md5_number_lower` (DECIMAL(20,0) join/sort keys
    fall off the Tungsten long fast path; a BIGINT stays on it).

    value = md5_number_lower(col) % 2^63, i.e. (hi % 2^31)*2^32 + lo
    with hi/lo the big/little 4-byte halves of the little-endian lower
    digest — always non-negative and exact in BIGINT. DuckDB twin when
    an oracle must replay it:
    ``CAST(md5_number_lower(s) % 9223372036854775808 AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return md5_long63_from_hex(F.md5(c))


def md5_long63_from_hex(hx: Column) -> Column:
    """:func:`md5_long63` given an already-computed md5 HEX column —
    same no-CSE-in-HOF-lambdas rationale as :func:`md5_mod_from_hex`:
    hash an array as ``transform(transform(sh, md5), md5_long63_from_hex)``
    so md5 runs once per element."""
    hi, lo = _lower64_halves(hx)
    return F.pmod(hi, F.lit(1 << 31)) * F.lit(1 << 32) + lo


def _lower64_halves(hx: Column) -> tuple[Column, Column]:
    """(hi, lo) 32-bit halves of the little-endian lower-64 md5 value,
    each as BIGINT — the byte-index arithmetic (hex chars 31-2i /
    23-2i) encoding md5_number_lower's layout lives HERE only, so the
    cross-engine twins cannot drift between the callers."""
    hi = F.conv(
        F.concat(*[F.substring(hx, 31 - 2 * i, 2) for i in range(4)]), 16, 10
    ).cast("bigint")
    lo = F.conv(
        F.concat(*[F.substring(hx, 23 - 2 * i, 2) for i in range(4)]), 16, 10
    ).cast("bigint")
    return hi, lo


def md5_mod(col: Column | str, p: int) -> Column:
    """``md5_number_lower(col) % p`` in pure BIGINT arithmetic (hot-path
    form for per-shingle hashing: DECIMAL(20,0) pmod falls out of the
    codegen fast path and measured ~2.5x slower end-to-end on the
    MinHash pipeline).

    The unsigned lower-64 value is hi*2^32 + lo with hi, lo < 2^32, so
    value % p == (hi*(2^32 % p) + lo) % p — both conv() calls handle 8
    hex chars (fits BIGINT), and the fold stays under 2^63 for any
    p < 2^31. DuckDB side stays the literal ``md5_number_lower(s) % p``
    (UBIGINT arithmetic, same residue).
    """
    if not (0 < p < 2**31):
        raise ValueError(f"md5_mod requires 0 < p < 2^31, got {p}")
    c = F.col(col) if isinstance(col, str) else col
    return md5_mod_from_hex(F.md5(c), p)


def md5_mod_from_hex(hx: Column, p: int) -> Column:
    """``md5_mod`` given an already-computed md5 HEX column.

    Split out because expression trees are duplicated, not shared, when
    one value feeds many sub-expressions inside a higher-order-function
    lambda (no CSE there): hashing an array of shingles as
    ``transform(sh, s -> md5_mod(s))`` would re-run md5 once per
    substring reference (~8x). Callers materialize the digests first —
    ``transform(transform(sh, md5), h -> md5_mod_from_hex(h, p))`` —
    so md5 runs exactly once per element.
    """
    hi, lo = _lower64_halves(hx)
    return F.pmod(hi * F.lit((1 << 32) % p) + lo, F.lit(p))
