#!/usr/bin/env python
"""Time named catalog queries in isolation — the optimization-round
measurement loop (guide §1: noop sink, labeled jobs, repeated warm
samples so single-sample host stalls read as outliers, not signal).

Usage: python tools/time_queries.py [-r REPS] query [query ...]

Same session shape as bench.py (build_spark_session, local[N],
driver heap sized to the machine); runs bench.py's warmup shapes
once unless SPARK_GRAFT_WARMUP=0. Prints per-query: every sample,
min and median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 4
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    names = args

    from cc2dataset_spark.plans.catalog import queries
    from cc2dataset_spark.session import build_spark_session

    from cc2dataset_spark.session import pinned_driver_heap_conf

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark_session(
        master=f"local[{cpus}]",
        app_name="time-queries",
        shuffle_partitions=max(32, cpus),
        extra_conf={
            **pinned_driver_heap_conf(),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    if os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0":
        # the bench's shape list, so probes warm exactly what the
        # bench warms (one sf0.001 pass: enough for a probe session,
        # where the target query's own first sample is discarded by
        # reading medians/ratios anyway)
        from bench import _WARMUP_SHAPES, warmup_dirs

        # smallest existing sibling of the probed dir (bench.py's
        # derivation): never hardcode /root/testdata
        dirs = warmup_dirs(sf_dir)
        warm_dir = dirs[0] if dirs else None
        if warm_dir is not None:
            for wname in _WARMUP_SHAPES:
                if wname in qs:
                    qs[wname](spark, warm_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()

    for name in names:
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        body = " ".join(f"{s:.2f}" for s in samples)
        print(
            f"{name}: [{body}] min={min(samples):.2f} "
            f"median={statistics.median(samples):.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
