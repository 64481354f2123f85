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
