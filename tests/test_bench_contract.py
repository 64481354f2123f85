"""bench.py is part of the driver contract: one JSON line with
metric/value/unit/queries/sf. Run it at the smallest scale factor."""

import pytest
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_emits_contract_json(tmp_path):
    # BENCH_FULL goes to a tmp path: the repo's BENCH_FULL.json is the
    # driver-scale (sf0.1) record, and this sf0.001 run overwriting it
    # is exactly the regime-mixing the r5 verdict flagged.
    full_path = tmp_path / "BENCH_FULL.json"
    warm_path = tmp_path / "BENCH_WARM.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_FULL=str(full_path),
        # warm pass redirected + trimmed: the repo's BENCH_WARM.json is
        # the sf0.1 record, and a 15x3 warm sweep would dominate this
        # smoke run's wall time
        SPARK_GRAFT_BENCH_WARM=str(warm_path),
        SPARK_GRAFT_WARM_TOP="2",
        SPARK_GRAFT_WARM_REPS="2",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["unit"] == "sec"
    assert d["value"] > 0
    assert d["sf"] == 0.001
    # compact_line may fold the fastest queries into one "other:<n>"
    # entry to fit the driver's stdout tail window; n_queries counts
    # the queries actually run (the unfolded map is in BENCH_FULL.json).
    assert d["n_queries"] > 50
    assert d["n_queries"] >= len(d["queries"])
    assert all(v >= 0 for v in d["queries"].values())
    # value == total wall; folding preserves the sum up to per-query
    # centisecond rounding.
    assert abs(d["value"] - sum(d["queries"].values())) <= 0.005 * d["n_queries"] + 0.01
    # every run states its regime so round-over-round comparisons can't
    # silently mix cold and warm numbers
    assert d["run"] == "cold"
    # The full record (written by the run above) must carry the whole
    # unfolded catalog: exactly the registered queries minus the named
    # exclusions — a query added to the catalog but missing here means
    # bench.py silently stopped covering it.
    sys.path.insert(0, REPO)
    import bench as bench_mod
    from cc2dataset_spark.plans.catalog import queries

    full = json.load(open(full_path))
    assert full["n_queries"] == len(full["queries"]) == d["n_queries"]
    expected = set(queries()) - bench_mod.EXCLUDE
    assert set(full["queries"]) == expected
    # the warm-median artifact: medians over reps of the slowest cold
    # queries, labeled with its regime, never mixed into the cold file
    warm = json.load(open(warm_path))
    assert warm["run"] == "warm"
    assert warm["reps"] == 2
    # the warm set is the top-N slowest cold queries PLUS the pinned
    # calibration anchor (always present so cross-round host-variance
    # adjudication can read anchor ratios straight from
    # BENCH_WARM.json — ROTATION.md drift-cohort protocol), deduped
    # when the anchor already ranks in the top set
    top2 = sorted(full["queries"], key=full["queries"].get, reverse=True)[:2]
    expected_warm = set(top2) | {"dedup_minhash_neardup"}
    assert set(warm["queries"]) == expected_warm == set(warm["cold_queries"])
    assert all(v >= 0 for v in warm["queries"].values())
