"""Library code must not mutate a caller's session conf (r9).

The external driver passes its OWN SparkSession; an operator library
silently flipping plan-shaping SQL confs would retune every query the
caller runs afterwards. Only two runtime conf sets are allowed, both
RESULT-affecting and documented in sources/tables.load_table
(session.timeZone=UTC, legacy.parquet.nanosAsLong); plan-shaping confs
(subset co-partitioning) live in the session.py builders instead.
"""

import pytest

from tests.conftest import SF_SMOKE

CO_PARTITION = "spark.sql.requireAllClusterKeysForCoPartition"


def test_builders_set_subset_copartitioning(spark):
    # Sessions built by session.py opt in to subset co-partitioning so
    # the neardup grid joins share one cell exchange.
    assert spark.conf.get(CO_PARTITION) == "false"


def test_catalog_query_leaves_foreign_session_conf_unchanged(spark):
    """Build AND execute the one operator that benefits from the conf
    on a session where it is explicitly absent: the conf must stay at
    the engine default throughout (and the result must still be
    correct — the conf is plan-shaping only)."""
    from cc2dataset_spark.plans import catalog

    ns = spark.newSession()
    # newSession inherits SparkConf-level entries from the builder;
    # unset restores the ENGINE default, simulating a foreign session.
    ns.conf.unset(CO_PARTITION)
    default = ns.conf.get(CO_PARTITION)
    assert default == "true"  # Spark's default: subset NOT recognized

    q = catalog.queries()["dedup_prefix_jaccard"]
    df = q(ns, SF_SMOKE)
    assert ns.conf.get(CO_PARTITION) == default, "build mutated conf"
    n_foreign = df.count()  # executes the grid join WITHOUT the conf
    assert ns.conf.get(CO_PARTITION) == default, "execution mutated conf"

    # Same query on the builder session (conf=false): identical result,
    # so the conf is provably semantics-preserving on this corpus.
    n_builder = catalog.queries()["dedup_prefix_jaccard"](
        spark, SF_SMOKE
    ).count()
    assert n_foreign == n_builder


def test_load_table_sets_only_result_affecting_confs(spark):
    from cc2dataset_spark.sources.tables import load_table

    ns = spark.newSession()
    ns.conf.unset(CO_PARTITION)
    for t in ("lineitem", "events"):
        load_table(ns, SF_SMOKE, t)
    assert ns.conf.get(CO_PARTITION) == "true"
    # the documented result-affecting confs ARE set
    assert ns.conf.get("spark.sql.session.timeZone") == "UTC"
    assert ns.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
