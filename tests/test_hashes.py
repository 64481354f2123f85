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


def test_md5_mod_rejects_wide_modulus():
    with pytest.raises(ValueError):
        md5_mod(F.lit("x"), 1 << 31)
