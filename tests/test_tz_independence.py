"""Session-timezone independence guard.

Every fixture timestamp is TIMESTAMP_NTZ by contract
(sources/tables.py), so NO query result may depend on the session (or
process) timezone. The failure class this pins: Spark's date_trunc /
unix_* silently CAST an NTZ input to LTZ through
spark.sql.session.timeZone — the r7 driver-sim TZ sweep caught exactly
that in join_interval_busy_hours (hour buckets rendered in process tz,
DST-gap wall clocks shifted), fixed by functions/datetime_ntz.

The guard flips spark.sql.session.timeZone across three zones chosen
to disagree in offset, DST rules, and :45 granularity, and asserts the
COLLECTED values of every query that emits a timestamp/date column are
identical. (Flipping the session conf exercises the expression-level
conversions; the process-tz rendering path is additionally swept by
tools/driver_sim.py under TZ=America/New_York per the verify recipe.)
"""

from __future__ import annotations

import pytest

from cc2dataset_spark.plans.catalog import QUERIES, _load_all

_load_all()

# Queries whose output schema contains timestamp/date columns — the
# surface where a session-tz dependence could leak into values.
_TEMPORAL_QUERIES = [
    "join_interval_busy_hours",
    "events_retention_cohorts",
    "scalar_json_dates",
    "events_sessionize",
    "events_session_30m",
    "events_tumbling_10m",
    "join_asof_last_order",
    "events_scd2_event_type",
    "events_m4_downsample",
]

_ZONES = ["UTC", "America/New_York", "Pacific/Chatham"]


@pytest.mark.parametrize("name", _TEMPORAL_QUERIES)
def test_values_identical_across_session_timezones(spark, sf_dir, name):
    if name not in QUERIES:
        pytest.skip(f"{name} not registered")
    original = spark.conf.get("spark.sql.session.timeZone")
    results = {}
    try:
        for tz in _ZONES:
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = QUERIES[name].fn(spark, sf_dir)
            rows = df.collect()
            results[tz] = sorted(tuple(r) for r in rows)
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    base = results[_ZONES[0]]
    assert base, name  # nonempty — empty matches are weak evidence
    for tz in _ZONES[1:]:
        assert results[tz] == base, (name, tz)
