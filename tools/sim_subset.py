"""Subset driver simulation: tools/driver_sim.py's exact comparison
(row-count + column names + order-insensitive full-precision values vs
the DuckDB oracle at sf0.01) restricted to the query names given on
the command line — the fast per-change correctness gate for the
optimization rounds. Usage:

    python tools/sim_subset.py name [name ...]

Exit 0 iff every named query matches.
"""
import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as contract

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("sim-subset")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def norm(v):
    if isinstance(v, Decimal):
        if v == v.to_integral_value():
            return int(v)
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0
        return f"f:{v!r}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


qs = contract.queries()
osql = contract.oracle_sql()
nbad = 0
for name in sys.argv[1:]:
    fn = qs[name]
    sdf = fn(spark, SF)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(norm(r[c]) for c in scols) for r in sdf.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    if name not in osql:
        print(f"{name}: rows_only:{len(srows)}")
        continue
    rel = con.execute(osql[name])
    dcols = sorted(c[0] for c in rel.description)
    idx = {c[0]: i for i, c in enumerate(rel.description)}
    drows = sorted(
        (tuple(norm(r[idx[c]]) for c in dcols) for r in rel.fetchall()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    if scols != dcols:
        print(f"{name}: SCHEMA_MISMATCH spark={scols} duck={dcols}")
        nbad += 1
    elif len(srows) != len(drows):
        print(f"{name}: COUNT_MISMATCH spark={len(srows)} duck={len(drows)}")
        nbad += 1
    elif srows != drows:
        bad = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
        print(f"{name}: VALUE_MISMATCH {bad}")
        nbad += 1
    else:
        print(f"{name}: match:{len(srows)}")
print(f"TOTAL {len(sys.argv) - 1} queries, {nbad} mismatches")
sys.exit(1 if nbad else 0)
