"""Ordered conversion funnel (operators/funnel.py): order-sensitivity
on handcrafted timelines + the single-Exchange plan shape.  (Exact
cross-engine values are covered by scripts/check_oracles.py.)"""

from __future__ import annotations

from datetime import datetime

from indigent_defense_stats_spark.operators import funnel

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


def test_funnel_order_sensitivity(spark, tmp_path):
    """A purchase BEFORE the click (or a click before the view) must
    not advance the funnel — the ordered semantics that distinguish a
    funnel from event-type set intersection."""
    t = lambda h, m: datetime(2024, 1, 1, h, m)
    d = _write_events(
        spark,
        tmp_path,
        [
            # user 1: full ordered funnel view(9:00)->click(9:30)->purchase(10:00)
            _ev(1, t(9, 0), 1, "view"),
            _ev(2, t(9, 30), 1, "click"),
            _ev(3, t(10, 0), 1, "purchase"),
            # user 2: has all three types but purchase precedes click -> stage 2
            _ev(4, t(9, 0), 2, "view"),
            _ev(5, t(9, 10), 2, "purchase"),
            _ev(6, t(9, 30), 2, "click"),
            # user 3: click before the first view -> stage 1 (view only)
            _ev(7, t(9, 0), 3, "click"),
            _ev(8, t(9, 30), 3, "view"),
            # user 4: no view at all -> stage 0, all timestamps null
            _ev(9, t(9, 0), 4, "click"),
            _ev(10, t(9, 30), 4, "purchase"),
            # user 5: second, later view must NOT reopen the funnel for
            # an earlier click (t1 is the FIRST view)
            _ev(11, t(9, 0), 5, "view"),
            _ev(12, t(9, 30), 5, "click"),
            _ev(13, t(9, 40), 5, "view"),
        ],
    )
    out = {r["user_id"]: r for r in funnel.funnel_stages(spark, d).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["stage"] == 3
    assert out[1]["t_purchase_s"] - out[1]["t_view_s"] == 3600
    assert out[2]["stage"] == 2 and out[2]["t_purchase_s"] is None
    assert out[3]["stage"] == 1 and out[3]["t_click_s"] is None
    assert out[4]["stage"] == 0 and out[4]["t_view_s"] is None
    assert out[5]["stage"] == 2  # click counted against the 9:00 view


def test_funnel_strictly_after(spark, tmp_path):
    """Steps advance only on STRICTLY later timestamps."""
    t0 = datetime(2024, 1, 1, 9, 0)
    t1 = datetime(2024, 1, 1, 9, 1)
    d = _write_events(
        spark,
        tmp_path,
        [
            _ev(1, t0, 1, "view"),
            _ev(2, t1, 1, "click"),
            # purchase exactly at the click ts on ANOTHER user proves
            # nothing leaks across users
            _ev(3, t1, 2, "purchase"),
        ],
    )
    out = {r["user_id"]: r for r in funnel.funnel_stages(spark, d).collect()}
    assert out[1]["stage"] == 2
    assert out[2]["stage"] == 0


def test_funnel_plan_single_exchange(spark):
    """The three dependent stage windows plus the final per-user
    collapse must share ONE hash exchange — the sequential dependency
    costs window passes, never extra shuffles."""
    plan = (
        funnel.funnel_stages(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan
