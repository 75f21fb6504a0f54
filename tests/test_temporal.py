"""AS-OF and RANGE join operators (operators/temporal.py): semantics
on handcrafted timelines + the plan shapes that make them scale.
(Exact cross-engine values — including DuckDB's NATIVE ASOF JOIN as
the as-of oracle — are covered by scripts/check_oracles.py.)"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import temporal

SF_DIR = "/root/testdata/sf0.001"

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, tmp_path, rows):
    d = str(tmp_path / "ev")
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    return d


def _ev(eid, ts, uid, etype):
    return (eid, ts, uid, etype, 0.0, "{}")


def test_asof_picks_latest_prior_click(spark, tmp_path):
    t = lambda h, m, s=0: datetime(2024, 1, 1, h, m, s)
    d = _write_events(
        spark,
        tmp_path,
        [
            _ev(1, t(9, 0), 1, "click"),
            _ev(2, t(9, 30), 1, "click"),
            _ev(10, t(9, 15), 1, "purchase"),  # -> click 1, lag 900
            _ev(11, t(10, 0), 1, "purchase"),  # -> click 2, lag 1800
            _ev(12, t(8, 0), 1, "purchase"),  # before any click -> null
            _ev(20, t(9, 0), 2, "purchase"),  # user without clicks
            _ev(3, t(11, 0), 3, "click"),  # other user's click: invisible
        ],
    )
    out = {r["event_id"]: r for r in temporal.asof_attribution(spark, d).collect()}
    assert set(out) == {10, 11, 12, 20}
    assert out[10]["click_id"] == 1 and out[10]["lag_s"] == 900
    assert out[11]["click_id"] == 2 and out[11]["lag_s"] == 1800
    assert out[12]["click_id"] is None and out[12]["lag_s"] is None
    assert out[20]["click_id"] is None


def test_asof_simultaneous_click_is_visible(spark, tmp_path):
    """At-or-before semantics: a click at exactly the purchase ts
    attributes (side ordering puts clicks first at equal ts)."""
    ts = datetime(2024, 1, 1, 9, 0)
    d = _write_events(
        spark, tmp_path, [_ev(1, ts, 1, "click"), _ev(10, ts, 1, "purchase")]
    )
    (row,) = temporal.asof_attribution(spark, d).collect()
    assert row["click_id"] == 1 and row["lag_s"] == 0


def test_asof_plan_is_single_shuffle_no_join(spark):
    """The as-of re-expression must be ONE hash exchange (the window)
    with no join operator at all — the shape that survives 100 TB."""
    plan = (
        temporal.asof_attribution(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan


def test_range_window_boundaries_and_bin_crossing(spark, tmp_path):
    t = lambda h, m, s=0: datetime(2024, 1, 1, h, m, s)
    d = _write_events(
        spark,
        tmp_path,
        [
            _ev(10, t(10, 0), 1, "signup"),
            _ev(1, t(10, 0), 1, "click"),  # >= start: counted
            _ev(2, t(10, 59, 59), 1, "click"),  # inside: counted
            _ev(3, t(11, 0), 1, "click"),  # == start + 1h: excluded
            _ev(20, t(10, 30), 2, "signup"),
            _ev(4, t(11, 15), 2, "click"),  # NEXT hour bin, in window
            _ev(5, t(11, 31), 2, "click"),  # past window: excluded
            _ev(30, t(5, 0), 3, "signup"),  # no clicks at all
            _ev(6, t(10, 10), 9, "click"),  # other user: invisible
        ],
    )
    out = {r["event_id"]: r for r in temporal.range_attribution(spark, d).collect()}
    assert set(out) == {10, 20, 30}
    assert out[10]["n_clicks_1h"] == 2
    assert out[20]["n_clicks_1h"] == 1  # bin-crossing match found
    assert out[30]["n_clicks_1h"] == 0


def test_range_plan_is_equi_join(spark):
    """The bucketed range join must compile to equi-joins — never a
    nested-loop/cartesian theta join."""
    plan = (
        temporal.range_attribution(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan


def test_range_matches_bruteforce_on_testdata(spark):
    """Bucketed plan == naive per-row recompute on real sf0.001 data."""
    out = temporal.range_attribution(spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    clicks = [
        (r["user_id"], r["ts"]) for r in ev if r["event_type"] == "click"
    ]
    got = {r["event_id"]: r["n_clicks_1h"] for r in out.collect()}
    for r in ev:
        if r["event_type"] != "signup":
            continue
        want = sum(
            1
            for (u, ts) in clicks
            if u == r["user_id"]
            and ts >= r["ts"]
            and (ts - r["ts"]).total_seconds() < temporal.RANGE_WINDOW_S
        )
        assert got[r["event_id"]] == want, r["event_id"]


def test_retention_cohort_invariants(spark):
    from indigent_defense_stats_spark.operators.temporal import (
        retention_cohorts,
    )

    rows = retention_cohorts(spark, SF_DIR).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["age"] >= 0
        assert 0 < r["n_active"] <= r["cohort_size"]
        assert 0.0 < r["retention"] <= 1.0
        by_cohort.setdefault(r["cohort_d"], {})[r["age"]] = r
    for c, ages in by_cohort.items():
        # age 0 always present and is the cohort size itself
        assert 0 in ages and ages[0]["retention"] == 1.0
        assert ages[0]["n_active"] == ages[0]["cohort_size"]
