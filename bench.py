#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs every catalog query (minus the intentionally-quadratic exact
verifiers, which exist as oracles for their subquadratic twins) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], forcing full materialization through the
"noop" sink, and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

The driver records only the LAST ~2000 characters of stdout and parses
the JSON line out of that tail, so the printed line is kept under a
hard byte budget: per-query times are rounded to centiseconds and, if
the dict still overflows the budget, the FASTEST queries are folded
into a single "other:<n>" entry (their total is preserved there and in
"value"). The complete per-query map is always written to
BENCH_FULL.json next to this script.

WARM MEDIANS (r9, closes the third round of cold-sweep forensics): a
single cold execution folds first-call plan compilation and whatever
GC/page-cache state ~100 preceding queries left into every sample —
the documented ~20% host variance, with occasional 1.5-2x swings on
sub-3-second queries. After the cold sweep, the SPARK_GRAFT_WARM_TOP
slowest queries (default 15; 0 disables) re-run SPARK_GRAFT_WARM_REPS
times (default 3) in the now-warm session and their per-query MEDIANS
go to BENCH_WARM.json. Cross-round regression calls use the warm
medians; the cold sweep remains the driver-visible headline (and the
two files record which regime they are via "run").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Nothing is excluded anymore. dedup_ngram_jaccard carries the
# stop-shingle cap (max_shingle_df) bounding its self-join fan-out,
# and dedup_embedding_cosine (r7) runs the blocked exact kernel
# (operators/neardup.embedding_neardup_pairs_blocked) — still O(n^2)
# compares by definition (it IS the ground truth) but with a tiled
# Arrow kernel constant, so even the exact verifier is benchable.
EXCLUDE: set[str] = set()

# JVM/codegen warmup shapes, run on the smallest fixtures so per-query
# times measure the plan, not first-call compilation. Module-level so
# probe tooling (tools/time_queries.py) warms the SAME shapes as the
# bench. r13-opt measurement-bug fix (documented in OPTIMIZATION_r13.md
# with the old single-query-warmup numbers kept): one warmup query does
# not warm the JVM — with it, the first heavy query of a sweep still
# paid interpreter-mode execution plus C1/C2 compilation of the
# whole-stage-codegen/shuffle/Arrow machinery, measured at 30-75 s for
# a query whose warm median is under 2 s (ann_simhash_topk 75.5 s cold
# vs 1.77 s warm; a fresh-session first run of dedup_minhash_neardup on
# an IDLE host: 56 s vs 5 s on its second run). The warmup covers each
# distinct execution shape — scan+hash-agg, multi-join, window,
# explode+distinct+self-join, big-literal expression trees, interpreted
# HOF folds, hash-heavy dedup, and the Arrow/Python mapInPandas worker
# pool — twice at sf0.001 plus once at sf0.01 (1/100th-1/10th of the
# benched data: nothing of the timed computation is precomputed or
# cached — a different scale factor cannot seed any result; it only
# compiles code). Disable with SPARK_GRAFT_WARMUP=0 to reproduce the
# old regime.
_WARMUP_SHAPES = [
    "q1_pricing_summary",       # parquet scan + hash agg + decimal
    "q21_waiting_suppliers",    # SMJ + broadcast + semi/anti joins
    "udaf_user_trend",          # window + pandas-UDAF/Arrow agg
    "profile_cross_source_overlap",  # explode + distinct + self-join
    "ann_simhash_topk",         # big literal tree + bcast + rank
    "dedup_minhash_neardup",    # hash-heavy explode + groupBy
    "multimodal_image_dims",    # interpreted HOF fold (hex/conv)
    "multimodal_resize_pixel_stats",  # mapInPandas x2, Python pool
    "events_followup_pairs_10m",  # events scan (nanosAsLong) + lag
    # r13-opt additions — shapes the 9 above measurably did NOT
    # cover (each first-called at 14-35 s inside the timed sweep
    # vs a sub-2 s warm median, and each drops to its warm value
    # after one sf0.001 self-run):
    "multimodal_decode_errors",  # full decode stack + containment
    "cc_domain_stats",          # PSL 5x broadcast-probe join chain
    "ann_ivf_topk",             # driver-side fit loop + ADC probe
    # the widest composite plan: compiles the largest generated-
    # class set AND is the only query needing 2 concurrent Python
    # stages (64 workers) — its first call grew the worker pool by
    # 33 processes mid-query (measured 22.9 s first call unwarmed
    # vs 6.7 s after one sf0.001 self-run + daemon preload)
    "curate_full_recipe",
    # SNM blocking + connected-components + argmax survivorship:
    # alphabetically the FIRST of the cluster family in the sweep,
    # so it absorbs the whole family's first-call codegen — the
    # largest cold entry of the closing sweep (13.1 s vs a 4-6 s
    # settled state; isolated probe: 44 s first call in a session
    # warmed only by the other 13 shapes, 9 s by the third call)
    "dedup_cluster_best_quality",
]


def warmup_dirs(sf_dir: str) -> list[str]:
    """Warmup scale factors derived from SF_DIR's PARENT (r14, VERDICT
    ask #2): the r13 harness hardcoded /root/testdata/sf0.001 and
    /root/testdata/sf0.01, so pointing SPARK_GRAFT_SF_DIR at any other
    corpus root either warmed the wrong data or crashed the whole
    bench on a missing path. Siblings of the benched dir that don't
    exist (or ARE the benched dir) are skipped — warmup must never
    read the benched scale factor, and a missing sibling degrades to
    fewer warmup passes, never to a failed bench."""
    root = os.path.dirname(os.path.abspath(sf_dir.rstrip("/")))
    return [
        d
        for d in (
            os.path.join(root, "sf0.001"),
            os.path.join(root, "sf0.01"),
        )
        if os.path.isdir(d)
        and os.path.abspath(d) != os.path.abspath(sf_dir.rstrip("/"))
    ]


def main() -> None:
    from cc2dataset_spark.plans.catalog import queries
    from cc2dataset_spark.session import build_spark_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    _warm_dirs = warmup_dirs(sf_dir)

    # Driver-JVM heap sized to the machine (optimization guide §5): in
    # local mode the driver JVM IS the executor, and the PySpark
    # default of 1 GB put a 209-query sweep's shuffles, broadcasts and
    # MEMORY_AND_DISK pins of local[32] under permanent GC pressure —
    # measured r13-opt: cold sweep 657.5 s at -Xmx1g with the early
    # queries inflated 3-13x (ann_simhash_topk 75.5 s cold vs 1.8 s
    # warm) and warm>cold inversions on the persist-heavy family.
    # The heap is MODERATE (RAM/16 clamped [4, 12] GB), PINNED
    # (-Xms == -Xmx) and PRE-TOUCHED, not merely large: this host
    # zeroes fresh pages at a measured 0.07-0.43 GB/s, so G1
    # commit/uncommit cycles under a growable oversized heap charged
    # recurring 10-50 s page-fault storms to whichever query was
    # running (see session.pinned_driver_heap_conf for the full
    # measurement trail). AlwaysPreTouch moves the one-time commit
    # cost to session startup — OUTSIDE the timed region.
    # SPARK_GRAFT_DRIVER_MEM_GB overrides; on a real cluster the
    # submitter sizes executor memory instead and this knob is inert.
    from cc2dataset_spark.session import pinned_driver_heap_conf

    spark = build_spark_session(
        master=f"local[{cpus}]",
        app_name="cc2dataset_spark-bench",
        shuffle_partitions=max(32, cpus),
        # UI on: its REST endpoint is the per-query shuffle-byte
        # accounting source (recorded in BENCH_FULL.json), read from
        # the EXECUTOR cumulative totals (one row in local mode, never
        # evicted) — not by summing retained stages. r13-opt: the
        # previous stage-sum approach needed retainedStages=100000,
        # and holding every stage object of a 209-query sweep in the
        # status store measurably AGED the session (the end-of-sweep
        # warm pass read 2-3x inflated on multi-job iterative queries
        # at a healthy 1.80 s anchor; per-boundary REST calls also
        # serialized thousands of stages). Default retention now
        # applies; eviction cannot shrink executor totals.
        extra_conf={
            **pinned_driver_heap_conf(),
            "spark.ui.enabled": "true",
            # The driver parses the headline JSON out of a fixed-size
            # stdout tail; console progress bars from ~650 warm-pass
            # jobs flooded that tail in r9 and cost the round its
            # bench record — keep the bench session's console silent.
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _shuffle_write_bytes() -> int | None:
        """Cumulative shuffle write bytes since app start, from the
        executor summaries (REST status API — `totalShuffleWrite` is
        maintained per executor and is immune to stage eviction);
        None if the endpoint is unavailable — metrics must never fail
        the bench."""
        try:
            import urllib.request

            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/executors", timeout=10
            ) as r:
                executors = json.load(r)
            return sum(e.get("totalShuffleWrite", 0) for e in executors)
        except Exception:
            return None

    qs = {n: fn for n, fn in queries().items() if n not in EXCLUDE}

    warmup_on = (
        os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0" and bool(_warm_dirs)
    )
    if warmup_on:
        # Two passes at the smallest warmup scale, then one pass at
        # the next size up (when present): tiered compilation promotes
        # the hot loops (parquet reader, hash-agg, Arrow codecs) to C2
        # only after enough invocations, and the smallest batches
        # alone are too small to get there — measured as a residual
        # 2-4x first-call cost on the earliest sweep queries despite
        # two sf0.001 passes. Warmup data stays 1/10th-1/100th of the
        # benched scale: compiles code, cannot precompute any result.
        _warm_plan = [_warm_dirs[0], _warm_dirs[0]] + _warm_dirs[1:]
        for _wdir in _warm_plan:
            for _wname in _WARMUP_SHAPES:
                _wfn = qs.get(_wname)
                if _wfn is not None:
                    _wfn(spark, _wdir).write.format("noop").mode(
                        "overwrite"
                    ).save()

    times: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}
    before = _shuffle_write_bytes()
    for name in sorted(qs):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        after = _shuffle_write_bytes()
        # A failed fetch invalidates TWO samples: this query's (no
        # after) and the next one's (a stale `before` would attribute
        # both queries' bytes to it) — so `before` always takes the
        # post-query reading, None included. A negative delta means
        # stage eviction defeated the accounting — drop the sample
        # rather than record garbage.
        if before is not None and after is not None and after >= before:
            shuffle_mb[name] = round((after - before) / 1048576, 3)
        before = after

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": dict(times),
        "sf": float(sf),
        "n_queries": len(times),
        # Regime label: every bench.py invocation is a cold fresh
        # JVM/process (the only warmup is codegen compilation at
        # sf0.001), so round-over-round comparisons of this file are
        # cold-vs-cold. Anything re-running queries inside an existing
        # session (e.g. ad-hoc warm passes) must NOT overwrite
        # BENCH_FULL.json — point SPARK_GRAFT_BENCH_FULL elsewhere and
        # set SPARK_GRAFT_BENCH_LABEL.
        "run": os.environ.get("SPARK_GRAFT_BENCH_LABEL", "cold"),
        # Whether the codegen warmup ran (and on which sibling dirs):
        # cold/unwarmed and warmed artifacts must never be compared
        # silently (r13 ADVICE) — the regime is now in the artifact.
        "warmup": warmup_on,
        "warmup_dirs": _warm_dirs if warmup_on else [],
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if shuffle_mb:
        # BENCH_FULL.json only (the stdout line has a byte budget):
        # per-query shuffle write volume — the scale-limiting resource
        # the wall time alone doesn't show at fixture size.
        payload["shuffle_write_mb"] = shuffle_mb
        payload["shuffle_write_mb_total"] = round(
            sum(shuffle_mb.values()), 3
        )
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
        ),
    )
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(compact_line(payload), flush=True)

    # Warm-median pass (see module docstring). Runs AFTER the stdout
    # line so a warm-pass failure can never cost the driver its
    # headline record — and the headline is RE-printed as the final
    # stdout act below, because the r9 lesson was the opposite failure
    # mode: ~45 warm executions of console output pushed the
    # early-printed line out of the driver's fixed-size tail capture
    # (BENCH_r09.json parsed null).
    warm_top = int(os.environ.get("SPARK_GRAFT_WARM_TOP", "15"))
    warm_reps = int(os.environ.get("SPARK_GRAFT_WARM_REPS", "3"))
    if warm_top > 0 and warm_reps > 0 and times:
        import statistics

        slowest = sorted(times, key=times.get, reverse=True)[:warm_top]
        # The documented calibration anchor is ALWAYS in the warm set,
        # whatever its cold rank: cross-round host-variance
        # adjudication reads anchor ratios out of BENCH_WARM.json
        # directly instead of re-running ad-hoc forensics
        # (ROTATION.md, r8 drift-cohort protocol).
        anchor = "dedup_minhash_neardup"
        if anchor in times and anchor not in slowest:
            slowest.append(anchor)
        warm_times: dict[str, float] = {}
        reps_used: dict[str, int] = {}
        for name in slowest:
            # The ITERATIVE family (cluster / pagerank / SNM) runs
            # ~20 small jobs whose per-job scheduler/GC jitter does
            # not amortize like one large shuffle job: the r12
            # forensics (ROTATION.md) measured an inherent ±20% warm
            # band that a 3-rep median cannot squeeze, so that
            # cohort gets >=4 reps (r12 verdict ask #5 — the
            # artifact now matches its own protocol).
            iterative = any(
                k in name for k in ("cluster", "pagerank", "snm")
            )
            n_reps = max(warm_reps, 4) if iterative else warm_reps
            samples = []
            for _ in range(n_reps):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            warm_times[name] = round(statistics.median(samples), 3)
            reps_used[name] = n_reps
        warm_payload = {
            "metric": "warm_median_top_queries",
            "unit": "sec",
            "queries": warm_times,
            "cold_queries": {n: times[n] for n in slowest},
            "sf": float(sf),
            "reps": warm_reps,
            "reps_per_query": reps_used,
            # The calibration anchor's warm median rides IN the
            # artifact so cross-round readers decode host state
            # without ROTATION.md: documented steady state is
            # 1.83-1.93 s at sf0.1 on an idle host; read cross-round
            # deltas as ratios to this value.
            "anchor": anchor,
            "anchor_warm": warm_times.get(anchor),
            "anchor_steady_state_sec": [1.83, 1.93],
            "run": "warm",
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        warm_path = os.environ.get(
            "SPARK_GRAFT_BENCH_WARM",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_WARM.json",
            ),
        )
        with open(warm_path, "w") as f:
            json.dump(warm_payload, f, indent=1, sort_keys=True)

    spark.stop()
    # Final stdout act: the same headline line again, AFTER everything
    # that can write to the console, so the driver's tail capture
    # always contains a parseable copy (see the warm-pass comment).
    print(compact_line(payload), flush=True)


def compact_line(payload: dict, budget: int = 1800) -> str:
    """Render the stdout JSON line under ``budget`` bytes.

    Times go to 2 decimals; if the full query dict overflows, the
    fastest entries collapse into one "other:<n>" bucket whose value is
    their summed time, so "value" approximately equals
    sum(queries.values()) (up to per-query rounding of ±0.005) and
    every slow (interesting) query stays individually visible.
    "n_queries" always counts the queries actually benchmarked, which
    can exceed len(queries) after folding; BENCH_FULL.json carries the
    complete unfolded map.
    """
    out = dict(payload)
    # per-query shuffle accounting and the warmup dir list live in
    # BENCH_FULL.json only; the stdout line keeps scalars within its
    # byte budget (the boolean "warmup" regime flag stays)
    out.pop("shuffle_write_mb", None)
    out.pop("warmup_dirs", None)

    def render(qdict: dict) -> str:
        out["queries"] = qdict
        return json.dumps(out, separators=(",", ":"))

    def fits(line: str) -> bool:
        return len(line.encode("utf-8")) <= budget

    q2 = {k: round(v, 2) for k, v in payload["queries"].items()}
    line = render(q2)
    if fits(line):
        return line
    # Drop fastest-first into the rollup bucket until the line fits.
    by_time = sorted(q2, key=lambda k: (q2[k], k))
    folded: dict[str, float] = {}
    for cut in range(1, len(by_time) + 1):
        dropped = by_time[:cut]
        folded = {k: v for k, v in q2.items() if k not in dropped}
        folded[f"other:{cut}"] = round(sum(q2[k] for k in dropped), 2)
        line = render(folded)
        if fits(line):
            return line
    return line


if __name__ == "__main__":
    main()
