"""Cross-engine hash parity: functions/hashes.py reconstructs DuckDB's
``md5_number_lower`` (and its mod-p hot-path form) in Spark expressions;
the whole LSH oracle story (dedup_minhash_neardup, ann_ivf_topk
centroid seeding) rests on these being bit-identical, so hypothesis
hunts the corners (unicode, empty, long strings)."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cc2dataset_spark.functions.hashes import md5_mod, md5_number_lower

P = 2147483647


def _duck_lower64(strings):
    con = duckdb.connect()
    return [
        con.execute("SELECT md5_number_lower(?)", [s]).fetchone()[0]
        for s in strings
    ]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
        ),
        min_size=1,
        max_size=24,
        unique=True,
    )
)
@settings(max_examples=5, deadline=None)
def test_md5_number_lower_matches_duckdb(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {
        r.s: (int(r.full), int(r.modp))
        for r in df.select(
            "s",
            md5_number_lower(F.col("s")).alias("full"),
            md5_mod(F.col("s"), P).alias("modp"),
        ).collect()
    }
    for s, want in zip(strings, _duck_lower64(strings)):
        full, modp = got[s]
        assert full == want, (s, full, want)
        assert modp == want % P, (s, modp, want % P)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
        ),
        min_size=1,
        max_size=24,
        unique=True,
    )
)
@settings(max_examples=5, deadline=None)
def test_md5_long63_matches_duckdb_twin(spark, strings):
    """md5_long63 == CAST(md5_number_lower(s) % 2^63 AS BIGINT) — the
    DuckDB twin its docstring promises — and always non-negative (a
    valid Tungsten-long join/sort key)."""
    from cc2dataset_spark.functions.hashes import md5_long63

    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {
        r.s: int(r.h)
        for r in df.select("s", md5_long63(F.col("s")).alias("h")).collect()
    }
    for s, full in zip(strings, _duck_lower64(strings)):
        want = int(full) % (1 << 63)
        assert got[s] == want, (s, got[s], want)
        assert 0 <= got[s] < 1 << 63


def test_md5_mod_rejects_wide_modulus():
    with pytest.raises(ValueError):
        md5_mod(F.lit("x"), 1 << 31)


# --- regex parity (curate_pii_scrub rests on Java-regex == RE2 for the
# deliberately-simple PII patterns) ---

_PII_FRAGMENTS = st.sampled_from(
    [
        "plain words here",
        "user.name+tag@sub.example.co",
        "a@b.io",
        "not@an@email",
        "@nodomain",
        "12345678901",
        "1234567",
        "123456",
        "tel: (555) 1234567!",
        "mixed 9998887776 and x@y.zz end",
        "ünïcode ☃ text",
        "trailing dot a@b.com.",
    ]
)


@given(st.lists(_PII_FRAGMENTS, min_size=1, max_size=6))
@settings(max_examples=5, deadline=None)
def test_pii_regex_parity_with_duckdb(spark, fragments):
    from cc2dataset_spark.functions.text import (
        EMAIL_RE,
        LONG_DIGITS_RE,
        pattern_count,
        pii_redact,
    )

    s = " ".join(fragments)
    df = spark.createDataFrame([(s,)], ["s"])
    row = df.select(
        pattern_count("s", EMAIL_RE).alias("ne"),
        pattern_count("s", LONG_DIGITS_RE).alias("nd"),
        pii_redact("s").alias("red"),
    ).first()
    con = duckdb.connect()
    want = con.execute(
        "SELECT len(regexp_extract_all(?, ?)),"
        " len(regexp_extract_all(?, ?)),"
        " regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'), ?, '<NUM>', 'g')",
        [s, EMAIL_RE, s, LONG_DIGITS_RE, s, EMAIL_RE, LONG_DIGITS_RE],
    ).fetchone()
    assert (row.ne, row.nd, row.red) == want, (s, (row.ne, row.nd, row.red), want)
