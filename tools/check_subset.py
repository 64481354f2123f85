"""Run a SUBSET of catalog queries against their DuckDB oracles with
driver_sim's normalization — the fast loop while iterating on new
registrations (driver_sim.py sweeps all 200+, ~5 min).

Usage: python tools/check_subset.py name1 name2 ...
Env: SPARK_GRAFT_SIM_SF (default /root/testdata/sf0.01)
"""
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from cc2dataset_spark.plans import catalog

names = sys.argv[1:]
spark = (
    SparkSession.builder.master("local[32]")
    .appName("check-subset")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def norm(v):
    if isinstance(v, Decimal):
        if v == v.to_integral_value():
            return int(v)
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


qs, oracles = catalog.queries(), catalog.oracle_sql()
bad = 0
for name in names:
    df = qs[name](spark, SF)
    cols = sorted(df.columns)
    srows = sorted(
        tuple(norm(r[c]) for c in cols) for r in df.collect()
    )
    if name not in oracles:
        print(f"{name}: rows_only:{len(srows)}")
        continue
    cur = con.execute(oracles[name])
    ocols_raw = [d[0] for d in cur.description]
    ocols = sorted(ocols_raw)
    fetched = cur.fetchall()
    orows = sorted(
        tuple(norm(row[ocols_raw.index(c)]) for c in ocols)
        for row in fetched
    )
    if cols != ocols:
        print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
        bad += 1
    elif len(srows) != len(orows):
        print(f"{name}: ROWS MISMATCH {len(srows)} vs {len(orows)}")
        bad += 1
    elif srows != orows:
        diff = sum(1 for a, b in zip(srows, orows) if a != b)
        print(f"{name}: VALUE MISMATCH ({diff}/{len(srows)} rows differ)")
        for a, b in zip(srows, orows):
            if a != b:
                print("  spark :", a)
                print("  oracle:", b)
                break
        bad += 1
    else:
        print(f"{name}: match:{len(srows)}")
print(f"{len(names) - bad}/{len(names)} green")
sys.exit(1 if bad else 0)
