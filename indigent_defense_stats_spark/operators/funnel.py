"""Ordered conversion-funnel analysis over the ``events`` table.

:func:`funnel_stages` — the classic product-analytics funnel, and the
engine analog of the reference crawler's own mandatory page sequence
(main page -> search page -> case page; reference:
src/scraper/__init__.py main/search/case fetch order, SURVEY.md §2
S4/S5/S7): for every user, the earliest ``view``, then the earliest
``click`` strictly AFTER that view, then the earliest ``purchase``
strictly after that click.  A later-stage event only counts if the
earlier stages were reached first — set-intersection of event types is
NOT a funnel.

Distributed shape: ONE hash shuffle on ``user_id``, then three
whole-partition window aggregates over the SAME partitioning (Catalyst
collapses them onto one Exchange — pytest asserts the single-Exchange
plan) and a final first-row-per-user aggregate that reuses the
partitioning.  Each stage's timestamp is a conditional ``min`` whose
predicate references the previous stage's window result, so the
sequential dependency costs window passes, not extra shuffles.  At
100 TB the per-user event lists never materialize (no collect_list);
state per group is three longs.

Determinism: ``(user_id, ts)`` is unique in the events table (same
contract as operators/temporal.py), timestamps are compared strictly
and emitted as epoch SECONDS (Spark ``cast(ts as long)`` truncates ==
DuckDB ``epoch_us // 1000000`` floors).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.epochs import epoch_floor_s

FUNNEL_STEPS = ("view", "click", "purchase")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keep TIMESTAMP_NTZ: step comparisons are wall-clock; output
    # epochs use the timezone-free field-extraction helper (same
    # rationale as operators/temporal.py)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3-step ordered funnel: (user_id, t_view_s, t_click_s,
    t_purchase_s, stage) with NULL timestamps for unreached steps and
    ``stage`` = number of steps reached in order (0-3)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    ts = F.col("ts")
    step1, step2, step3 = FUNNEL_STEPS
    t1 = F.min(F.when(F.col("event_type") == step1, ts)).over(w)
    with_t1 = ev.select("user_id", "event_type", "ts", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == step2) & (ts > F.col("t1")), ts
        )
    ).over(w)
    with_t2 = with_t1.select("*", t2.alias("t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == step3) & (ts > F.col("t2")), ts
        )
    ).over(w)
    with_t3 = with_t2.select("*", t3.alias("t3"))
    # t1/t2/t3 are per-user constants: max() collapses to one row per
    # user on the partitioning the windows already established
    return (
        with_t3.groupBy("user_id")
        .agg(
            epoch_floor_s(F.max("t1")).alias("t_view_s"),
            epoch_floor_s(F.max("t2")).alias("t_click_s"),
            epoch_floor_s(F.max("t3")).alias("t_purchase_s"),
        )
        .select(
            "user_id",
            "t_view_s",
            "t_click_s",
            "t_purchase_s",
            (
                F.col("t_view_s").isNotNull().cast("int")
                + F.col("t_click_s").isNotNull().cast("int")
                + F.col("t_purchase_s").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


QUERIES = {"funnel_stages": funnel_stages}

_EPOCH = "CAST(epoch_us({0}) // 1000000 AS BIGINT)"

ORACLE_SQL = {
    # independent formulation: three dependent scalar aggregates via
    # correlated CTE joins (not a window replay of the engine's plan)
    "funnel_stages": f"""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
            GROUP BY 1
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
            GROUP BY 1
        )
        SELECT u.user_id,
               {_EPOCH.format('s1.t1')} AS t_view_s,
               {_EPOCH.format('s2.t2')} AS t_click_s,
               {_EPOCH.format('s3.t3')} AS t_purchase_s,
               CAST((s1.t1 IS NOT NULL)::INT + (s2.t2 IS NOT NULL)::INT
                    + (s3.t3 IS NOT NULL)::INT AS INT) AS stage
        FROM u
        LEFT JOIN s1 ON u.user_id = s1.user_id
        LEFT JOIN s2 ON u.user_id = s2.user_id
        LEFT JOIN s3 ON u.user_id = s3.user_id
    """,
}
