#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs every catalog query (minus the intentionally-quadratic exact
verifiers, which exist as oracles for their subquadratic twins) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], forcing full materialization through the
"noop" sink, and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Exact all-pairs verifiers: quadratic by design (they are the ground
# truth for the LSH/SimHash scale paths, benched below).
# dedup_ngram_jaccard is NOT excluded anymore: its registered form
# carries the stop-shingle cap (max_shingle_df), which bounds the
# self-join fan-out, so it is a legitimate benchable operator.
EXCLUDE = {
    "dedup_embedding_cosine",
}


def main() -> None:
    from cc2dataset_spark.plans.catalog import queries
    from cc2dataset_spark.session import build_spark_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = build_spark_session(
        master=f"local[{cpus}]",
        app_name="cc2dataset_spark-bench",
        shuffle_partitions=max(32, cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = {n: fn for n, fn in queries().items() if n not in EXCLUDE}

    # JVM/codegen warmup on the smallest fixture so per-query times
    # measure the plan, not first-call compilation.
    warm = qs.get("q1_pricing_summary")
    if warm is not None:
        warm(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    times: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "n_queries": len(times),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
