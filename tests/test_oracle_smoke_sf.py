"""The full differential suite again at sf0.001 — near-empty inputs
move every data-dependent rounding boundary (a 6-dp surprisal term
flipped between engines at this scale while sf0.01 stayed green) and
exercise empty-group/single-row edges the larger fixture cannot."""

import pytest

from cc2dataset_spark.plans.catalog import QUERIES, _load_all
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duckdb_conn

_load_all()

_ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def smoke_con():
    con = duckdb_conn(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_query_matches_oracle_at_smoke_sf(spark, smoke_con, name):
    q = QUERIES[name]
    compare(q.fn(spark, SF_SMOKE), smoke_con, q.oracle, name=name)


# --- and the rounding-boundary-sensitive subset at sf0.1 ---
#
# 10x the data puts ~10x more values near every 6-dp rounding boundary.
# The round-6 sf0.1 sweep caught two real cross-engine flips the
# sf0.01/sf0.001 runs never hit: round() on a bit-identical double
# diverges between engines (Spark rounds the shortest decimal repr,
# DuckDB the binary value — q2's "...5625" unit cost), and DuckDB's
# double->BIGINT cast ROUNDS where Spark's truncates (mix_languages'
# thresh). These queries now use integer-exact rounding
# (functions/numeric.ratio_round6) / explicit floor / no round on
# identical binaries; this subset re-proves them at the scale that
# caught the flips. The full catalog at sf0.1 is a once-per-round
# manual sweep (SPARK_GRAFT_SIM_SF=/root/testdata/sf0.1 driver_sim).

_BOUNDARY_SENSITIVE = (
    "q2_min_cost_supplier",
    "curate_mix_languages",
    "dedup_ngram_jaccard",
    "dedup_minhash_neardup",
    "dedup_winnow_overlap",
    "dedup_sorted_neighborhood",
)

_SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def sf01_con():
    con = duckdb_conn(_SF01)
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", _BOUNDARY_SENSITIVE)
def test_boundary_sensitive_queries_at_sf01(spark, sf01_con, name):
    q = QUERIES[name]
    compare(q.fn(spark, _SF01), sf01_con, q.oracle, name=name)
