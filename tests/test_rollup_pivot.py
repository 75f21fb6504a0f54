"""ROLLUP (grouping sets) and PIVOT aggregation surfaces
(operators/relational.py).  Cross-engine value equality is covered by
scripts/check_oracles.py; these pin the grouping semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import relational

SF_DIR = "/root/testdata/sf0.001"


def test_rollup_levels_are_consistent(spark):
    rows = relational.event_type_day_rollup(spark, SF_DIR).collect()
    detail = [r for r in rows if r["event_type"] is not None and r["day"] is not None]
    subtotal = {r["event_type"]: r for r in rows
                if r["event_type"] is not None and r["day"] is None}
    grand = [r for r in rows if r["event_type"] is None and r["day"] is None]
    # exactly one grand total; no (NULL, day) rows in a rollup
    assert len(grand) == 1
    assert not [r for r in rows if r["event_type"] is None and r["day"] is not None]
    # per-type subtotal == sum of its day details
    for t, s in subtotal.items():
        assert s["n_events"] == sum(
            r["n_events"] for r in detail if r["event_type"] == t
        )
    assert grand[0]["n_events"] == sum(r["n_events"] for r in detail)
    # distinct users do NOT sum across days (re-aggregated, not added)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert grand[0]["n_users"] == ev.select("user_id").distinct().count()


def test_pivot_matches_groupby(spark):
    out = {r["user_id"]: r for r in relational.event_type_pivot(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    base = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    users = {u for (u, _) in base}
    assert set(out) == users
    for (u, t), n in base.items():
        assert out[u][f"n_{t}"] == n
    # absent cells are 0, and the row total equals the user's events
    totals = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for u, r in out.items():
        row_sum = sum(r[f"n_{t}"] for t in ("click", "error", "purchase", "signup", "view"))
        assert row_sum == totals[u]


def test_set_operator_cohorts_partition_clickers(spark):
    rows = relational.clicked_never_purchased(spark, SF_DIR).collect()
    only = {r["user_id"] for r in rows if r["cohort"] == "click_only"}
    both = {r["user_id"] for r in rows if r["cohort"] == "click_and_buy"}
    assert not (only & both)  # cohorts disjoint
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clickers = {r["user_id"] for r in ev.filter("event_type='click'")
                .select("user_id").distinct().collect()}
    buyers = {r["user_id"] for r in ev.filter("event_type='purchase'")
              .select("user_id").distinct().collect()}
    assert only == clickers - buyers
    assert both == clickers & buyers
    assert len(rows) == len(only) + len(both)  # no dup rows


def test_daily_series_is_dense_and_conservative(spark):
    import datetime

    rows = relational.daily_event_series(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    totals = {r["user_id"]: r["n"] for r in ev.groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    for u, rs in by_user.items():
        days = sorted(datetime.date.fromisoformat(r["day"]) for r in rs)
        # dense: every calendar day between min and max present once
        assert len(days) == (days[-1] - days[0]).days + 1
        assert len(set(days)) == len(days)
        # conservative: series total == user's event count
        assert sum(r["n_events"] for r in rs) == totals[u]
    # zero-fill actually occurs somewhere in the test data
    assert any(r["n_events"] == 0 for r in rows)


def test_rolling_range_frame_matches_bruteforce(spark):
    """RANGE frame semantics: count equals a per-row recompute over
    the trailing window, and equal timestamps would share a frame
    (range, not rows)."""
    rows = relational.rolling_week_user_events(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts_s"], r["n_events_7d"]))
    win = relational.ROLLING_WINDOW_S
    for u, lst in by_user.items():
        ts = sorted(t for t, _ in lst)
        for t, n in lst:
            want = sum(1 for x in ts if t - win < x <= t)
            assert n == want, (u, t, n, want)


def test_variant_rollup_matches_string_json_path(spark):
    """The VARIANT extraction (parse_json + variant_get) must agree
    with the legacy string-path get_json_object on every group, and
    the whole plan must stay JVM-side (no EvalPython)."""
    import pyspark.sql.functions as F

    from indigent_defense_stats_spark.operators import relational

    out = relational.variant_props_rollup(spark, SF_DIR)
    legacy = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("vk"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vk").cast("bigint").alias("k_sum"),
            F.max("vk").cast("bigint").alias("k_max"),
            F.count_distinct(F.col("vk")).cast("bigint").alias("k_distinct"),
        )
    )
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in legacy.collect()
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
