"""Session-timezone independence of timestamp-bearing query outputs.

The grading driver (or any host application) hands the engine ITS
SparkSession, whose ``spark.sql.session.timeZone`` is not ours to
pick.  Event timestamps are TIMESTAMP_NTZ wall-clock values, so every
output must be computed with timezone-free arithmetic (field reads /
NTZ intervals) — a cast to TIMESTAMP anywhere on the value path
shifts outputs by the session offset (caught live: session_windows
and stream_event_window_counts both moved by -6h under
America/Chicago) and misaligns hour buckets under half-hour zones
like Asia/Kolkata.
"""

from __future__ import annotations

import pytest

from indigent_defense_stats_spark.operators import funnel, relational, temporal
from indigent_defense_stats_spark.streaming import ingest, sessions

SF_DIR = "/root/testdata/sf0.001"

CASES = {
    "session_windows": sessions.session_windows,
    "stream_event_window_counts": ingest.stream_event_window_counts,
    # epoch-output queries: previously cast NTZ through LTZ timestamp,
    # shifting every *_s column by the session offset (caught by a
    # hostile-session sweep); now functions/epochs.epoch_floor_s
    "sliding_window_counts": ingest.sliding_window_counts,
    "asof_attribution": temporal.asof_attribution,
    "range_attribution": temporal.range_attribution,
    "funnel_stages": funnel.funnel_stages,
    "rolling_week_user_events": relational.rolling_week_user_events,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_output_identical_across_session_timezones(spark, name):
    fn = CASES[name]
    key = "spark.sql.session.timeZone"
    baseline = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    prev = spark.conf.get(key)
    try:
        # half-hour zone: misaligns hour buckets if any instant math
        # leaks in; DST zone: shifts and (near transitions) warps gaps
        for tz in ("Asia/Kolkata", "America/Chicago"):
            spark.conf.set(key, tz)
            got = sorted(map(tuple, fn(spark, SF_DIR).collect()))
            assert got == baseline, f"{name} drifted under {tz}"
    finally:
        spark.conf.set(key, prev)
