"""Temporal join operators over the ``events`` table: AS-OF join and
RANGE join — the two standard time-alignment joins Spark's optimizer
has no native operator for (both degrade to a per-key theta join if
written naively, which is O(n·m) per key and unusable at 100 TB).

- :func:`asof_attribution` — marketing-attribution as-of join: for
  each ``purchase`` event, the same user's most recent ``click`` at or
  before it.  Distributed re-expression: tag both sides, UNION them,
  and run ONE hash shuffle on ``user_id`` with a per-key time sort;
  ``last(click, ignorenulls)`` over the unbounded-preceding window
  carries the latest click forward to every purchase.  Shuffle bytes
  are linear in the event count, there is no range explosion and no
  join at all — the window IS the join.  (DuckDB grew a native
  ``ASOF JOIN`` for exactly this pattern; the oracle uses it, so the
  engine is checked against a first-class independent implementation.)

- :func:`range_attribution` — bounded-window range join: for each
  ``signup`` event, how many ``click`` events the same user produced
  in the following hour.  Distributed re-expression: bucket both sides
  into window-sized time bins; a signup's matches can only live in its
  own bin or the next one, so exploding the anchor side to 2 bins
  turns the range predicate into an EQUI-join on ``(user_id, bin)``
  followed by an exact range filter — linear shuffle, bounded
  amplification (2x on the small side), never a theta join.  Bin skew
  (flash-crowd hours) is AQE skew-split territory; the bin width is
  chosen equal to the window so the 2-bin cover is exact.

Determinism contract: ``(user_id, ts)`` is unique in the events table
(no as-of ties to break); output timestamps are epoch SECONDS via
integer floor on both engines (Spark: the timezone-free
``functions/epochs.epoch_floor_s`` field extraction; DuckDB
``epoch_us(ts) // 1000000`` — identical post-1970 under ANY session
timezone).

Reference analog: the reference aligns charge dates to events by
scanning within one case record (SURVEY.md §2 A3/W2 family,
reference: src/cleaner/__init__.py earliest-charge-date loop); these
operators are that alignment generalized to corpus-scale temporal
joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.epochs import epoch_floor_s

ASOF_LEFT_TYPE = "purchase"  # rows being attributed
ASOF_RIGHT_TYPE = "click"  # rows attributed to
RANGE_ANCHOR_TYPE = "signup"
RANGE_MATCH_TYPE = "click"
RANGE_WINDOW_S = 3600  # bin width == window length -> 2-bin cover


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keep the parquet TIMESTAMP_NTZ: ordering, comparisons and
    # NTZ+interval arithmetic are all wall-clock; epoch seconds come
    # from the timezone-free field-extraction helper (a cast to LTZ
    # timestamp here shifted every output epoch by the session offset
    # whenever a driver-owned session was not UTC)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most recent prior click per purchase (as-of join), via the
    union + per-key sort + ``last(ignorenulls)`` window — one shuffle,
    no theta join."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == ASOF_RIGHT_TYPE).select(
        "user_id",
        "ts",
        # side orders clicks before purchases at equal ts so an
        # exactly-simultaneous click would be visible (ts are unique
        # per user in this table; kept for semantic completeness)
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == ASOF_LEFT_TYPE).select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "user_id",
        "ts",
        "side",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last(
            F.when(F.col("click_id").isNotNull(), F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("click_ts"),
    )
    ts_s = epoch_floor_s("ts")
    return merged.filter(F.col("side") == 1).select(
        F.col("purchase_id").alias("event_id"),
        "user_id",
        ts_s.alias("ts_s"),
        "click_id",
        (ts_s - epoch_floor_s(F.col("click_ts"))).alias("lag_s"),
    )


def range_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks per user within ``RANGE_WINDOW_S`` after each signup
    (range join), via window-sized time bins: explode the anchor to
    (bin, bin+1), equi-join on (user_id, bin), exact-filter the range."""
    ev = _events(spark, sf_dir)
    bin_of = (epoch_floor_s("ts") / RANGE_WINDOW_S).cast("long")
    s = ev.filter(F.col("event_type") == RANGE_ANCHOR_TYPE).select(
        F.col("event_id").alias("sid"),
        "user_id",
        F.col("ts").alias("sts"),
        bin_of.alias("sbin"),
    )
    c = ev.filter(F.col("event_type") == RANGE_MATCH_TYPE).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
        bin_of.alias("cbin"),
    )
    probe = s.withColumn(
        "b", F.explode(F.array(F.col("sbin"), F.col("sbin") + 1))
    )
    matched = (
        probe.join(
            c, (probe["user_id"] == c["c_user"]) & (probe["b"] == c["cbin"])
        )
        .filter(
            (F.col("cts") >= F.col("sts"))
            & (
                F.col("cts")
                < F.col("sts") + F.expr(f"INTERVAL {RANGE_WINDOW_S} SECONDS")
            )
        )
        .groupBy("sid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        s.join(matched, "sid", "left")
        .select(
            F.col("sid").alias("event_id"),
            "user_id",
            epoch_floor_s(F.col("sts")).alias("ts_s"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_clicks_1h"),
        )
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the canonical product/crawl-health analytic:
    group every user by their FIRST-activity day (the cohort), then
    for each cohort age report how many of its users were active
    again.  Over a crawl log the same query reads "of the hosts first
    seen on day D, how many still serve new pages at age a" — the
    engagement-decay curve.

    Engine shape: one (user, day) distinct (two-phase, linear), one
    per-user min aggregate for the cohort day, a broadcast-sized join
    back (the cohort dim is user-sized but the join key is user —
    co-partitioned with the distinct's output, so AQE reuses the
    exchange), and one final (cohort, age) aggregate.  All integer
    arithmetic + ONE division for the retention rate.
    """
    ev = _events(spark, sf_dir)
    day = F.floor(epoch_floor_s(F.col("ts")) / 86400).cast("long")
    ud = ev.select("user_id", day.alias("d")).distinct().localCheckpoint(
        eager=False
    )
    cohort = ud.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    aged = ud.join(cohort, "user_id").select(
        "cohort_d", (F.col("d") - F.col("cohort_d")).alias("age"), "user_id"
    )
    ret = aged.groupBy("cohort_d", "age").agg(
        F.countDistinct("user_id").cast("long").alias("n_active")
    )
    size = ret.filter(F.col("age") == 0).select(
        F.col("cohort_d").alias("c2"), F.col("n_active").alias("cohort_size")
    )
    return ret.join(size, ret["cohort_d"] == size["c2"]).select(
        "cohort_d",
        "age",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") * 1.0 / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


Z_WIN = 6  # trailing baseline: days d-6 .. d-1
Z_MIN_N = 3  # minimum baseline days for a z-score
Z_THRESH = 2.5


def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection per event type: each day's total
    ``value`` against a TRAILING 7-day baseline (RANGE frame d-6..d-1,
    current day excluded) via rolling mean/std and a z-score — the
    monitoring query a crawl/ingest pipeline alerts on (a host whose
    daily fetch volume jumps 3 sigma is a trap or an incident).

    Cross-engine float discipline: raw values are doubles, and float
    SUMS are order-dependent — so each daily total is first fixed to
    integer CENTI-units (floor(v*100 + 0.5); bounded so the squared
    sums stay in BIGINT), all window sums are exact integers, and the
    float tail is a fixed op chain on identical operands: two
    divisions, one multiply, one subtract, one sqrt — and IEEE 754
    requires sqrt to be correctly rounded (unlike ln/exp), so the
    z-scores are bit-identical in Spark and DuckDB.

    Scale shape: one (type, day) aggregate (linear, map-side partial)
    + one RANGE window per type over the day-sized table.
    """
    ev = _events(spark, sf_dir)
    day = F.floor(epoch_floor_s(F.col("ts")) / 86400).cast("long")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        ev.select("event_type", day.alias("d"), cents.alias("v"))
        .groupBy("event_type", "d")
        .agg(F.sum("v").alias("s"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rangeBetween(-Z_WIN, -1)
    )
    m = F.sum("s").over(w)
    k = F.count("s").over(w)
    sq = F.sum(F.col("s") * F.col("s")).over(w)
    base = daily.select(
        "event_type",
        F.col("d").alias("epoch_day"),
        F.col("s").alias("daily_cents"),
        m.alias("m"),
        k.alias("k"),
        sq.alias("sq"),
    )
    mean = F.col("m") * 1.0 / F.col("k")
    var = F.col("sq") * 1.0 / F.col("k") - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = (F.col("daily_cents") - mean) / std
    ok = (F.col("k") >= Z_MIN_N) & (std > 0)
    return base.select(
        "event_type",
        "epoch_day",
        "daily_cents",
        F.when(ok, F.round(mean, 6)).alias("baseline_mean"),
        F.when(ok, F.round(std, 6)).alias("baseline_std"),
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok, F.abs(z) > Z_THRESH).otherwise(F.lit(False)).alias(
            "is_anomaly"
        ),
    )


QUERIES = {
    "asof_attribution": asof_attribution,
    "range_attribution": range_attribution,
    "retention_cohorts": retention_cohorts,
    "rolling_zscore_anomalies": rolling_zscore_anomalies,
}

# epoch seconds idiom: epoch_us // 1000000 floors exactly like Spark's
# cast(ts as long) (ADVICE round-2: epoch(ts)::BIGINT ROUNDS — wrong)
_EPOCH = "CAST(epoch_us({0}) // 1000000 AS BIGINT)"

ORACLE_SQL = {
    "rolling_zscore_anomalies": f"""
        WITH daily AS (
            SELECT event_type,
                   (epoch_us(ts) // 1000000) // 86400 AS epoch_day,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS s
            FROM events GROUP BY 1, 2
        ),
        win AS (
            SELECT event_type, epoch_day, s,
                   sum(s) OVER w AS m,
                   count(s) OVER w AS k,
                   sum(s * s) OVER w AS sq
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
                         RANGE BETWEEN {Z_WIN} PRECEDING
                               AND 1 PRECEDING)
        ),
        calc AS (
            SELECT event_type, epoch_day, s,
                   CAST(m AS BIGINT) * 1.0 / k AS mean,
                   sqrt(greatest(
                       CAST(sq AS BIGINT) * 1.0 / k
                       - (CAST(m AS BIGINT) * 1.0 / k)
                         * (CAST(m AS BIGINT) * 1.0 / k),
                       CAST(0.0 AS DOUBLE))) AS std,
                   k
            FROM win
        )
        SELECT event_type, epoch_day, s AS daily_cents,
               CASE WHEN k >= {Z_MIN_N} AND std > 0
                    THEN round(mean, 6) END AS baseline_mean,
               CASE WHEN k >= {Z_MIN_N} AND std > 0
                    THEN round(std, 6) END AS baseline_std,
               CASE WHEN k >= {Z_MIN_N} AND std > 0
                    THEN round((s - mean) / std, 6) END AS z,
               coalesce(CASE WHEN k >= {Z_MIN_N} AND std > 0
                             THEN abs((s - mean) / std) > {Z_THRESH}
                        END, FALSE) AS is_anomaly
        FROM calc
    """,
    "retention_cohorts": """
        WITH ud AS (
            SELECT DISTINCT user_id,
                   (epoch_us(ts) // 1000000) // 86400 AS d
            FROM events
        ),
        cohort AS (
            SELECT user_id, CAST(min(d) AS BIGINT) AS cohort_d
            FROM ud GROUP BY 1
        ),
        aged AS (
            SELECT c.cohort_d, CAST(ud.d - c.cohort_d AS BIGINT) AS age,
                   ud.user_id
            FROM ud JOIN cohort c USING (user_id)
        ),
        ret AS (
            SELECT cohort_d, age,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
            FROM aged GROUP BY 1, 2
        ),
        size_t AS (
            SELECT cohort_d, n_active AS cohort_size
            FROM ret WHERE age = 0
        )
        SELECT r.cohort_d, r.age, r.n_active, s.cohort_size,
               round(r.n_active * 1.0 / s.cohort_size, 6) AS retention
        FROM ret r JOIN size_t s USING (cohort_d)
    """,
    # the oracle is DuckDB's NATIVE ASOF JOIN — an independent
    # first-class implementation of the operator, not a replay of the
    # engine's own plan
    "asof_attribution": f"""
        WITH p AS (SELECT * FROM events WHERE event_type = '{ASOF_LEFT_TYPE}'),
        c AS (SELECT * FROM events WHERE event_type = '{ASOF_RIGHT_TYPE}')
        SELECT p.event_id, p.user_id,
               {_EPOCH.format('p.ts')} AS ts_s,
               c.event_id AS click_id,
               {_EPOCH.format('p.ts')} - {_EPOCH.format('c.ts')} AS lag_s
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "range_attribution": f"""
        SELECT s.event_id, s.user_id,
               {_EPOCH.format('s.ts')} AS ts_s,
               count(c.event_id) AS n_clicks_1h
        FROM events s LEFT JOIN events c
          ON c.user_id = s.user_id
         AND c.event_type = '{RANGE_MATCH_TYPE}'
         AND c.ts >= s.ts
         AND c.ts < s.ts + INTERVAL {RANGE_WINDOW_S} SECOND
        WHERE s.event_type = '{RANGE_ANCHOR_TYPE}'
        GROUP BY 1, 2, 3
    """,
}
