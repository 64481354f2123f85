#!/usr/bin/env python
"""Dump full ``explain('formatted')`` output for named catalog queries.

Usage: python tools/plan_dump.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt per query (the optimization-round
evidence files: plans/r13/<query>_before.txt / _after.txt). Uses the
same session shape as bench.py (build_spark_session on local[N]) so
the audited plan is the benched plan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from cc2dataset_spark.plans.catalog import queries
    from cc2dataset_spark.session import build_spark_session

    qs = queries()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark_session(
        master=f"local[{cpus}]",
        app_name="plan-dump",
        shuffle_partitions=max(32, cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
