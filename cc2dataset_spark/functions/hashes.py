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
shuffle; determinism across engines is worth it. Operators that only
need *internal* uniformity (skew salting, centroid seeding) keep
xxhash64.
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
