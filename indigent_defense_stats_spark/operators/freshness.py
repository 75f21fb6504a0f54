"""Freshness-driven recrawl scheduling — which pages to refetch FIRST.

The reference updater refetches EVERY known case page each run
(updater/__init__.py:69-129, mirrored by ``CrawlEngine.refresh``); at
web scale a crawler instead estimates each page's CHANGE RATE from
its observed update history and spends the politeness-bounded fetch
budget on the stalest pages first (Cho & Garcia-Molina, "Synchronizing
a database to improve freshness", SIGMOD 2000 — the uniform-refresh
vs rate-proportional analysis).

``recrawl_priority`` treats the ``events`` table as the per-page
observed change log (page = user_id, one event = one observed
change):

- rate: n_changes over the page's observation span
  (first change .. the corpus clock ``now`` = the GLOBAL max event
  time — data, not wall-clock now());
- staleness: seconds since the page's last observed change;
- score: expected changes missed = rate * staleness
  = n_changes * staleness / span — computed as ONE IEEE division of
  exact BIGINTs (the cross-engine float contract), span floored at
  1 s to keep just-observed pages defined (score 0 either way).

Top-100 by (score DESC, page) = the next refresh wave's seed list,
ready to feed ``CrawlEngine.refresh`` as a filter instead of its
refetch-everything default.

Scale shape: one linear map-side-combined aggregate keyed by page;
the corpus clock is a 1-row broadcast (the engine-wide 1-row
crossJoin pattern, relational.py); the final global top-N is a
single-partition TakeOrdered over per-partition top-Ns — no full
sort.  Timestamps go through the TZ-free field-extraction epoch
(functions/epochs.py): the score must not shift with the session
zone (tests/test_tz_independence.py discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from indigent_defense_stats_spark.functions.epochs import epoch_floor_s

TOP_N = 100


def recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").alias("page"), epoch_floor_s("ts").alias("s")
    )
    per_page = ev.groupBy("page").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.min("s").alias("first_s"),
        F.max("s").alias("last_s"),
    )
    now = ev.agg(F.max("s").alias("now_s"))
    scored = per_page.crossJoin(F.broadcast(now)).select(
        "page",
        "n_changes",
        (F.col("now_s") - F.col("last_s")).alias("staleness_s"),
        (F.col("now_s") - F.col("first_s")).alias("obs_span_s"),
        (
            (F.col("n_changes") * (F.col("now_s") - F.col("last_s"))).cast(
                "double"
            )
            / F.greatest(F.col("now_s") - F.col("first_s"), F.lit(1))
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("page")).limit(TOP_N)


_ORACLE = f"""
    WITH ev AS (
        SELECT user_id AS page,
               epoch_us(ts) // 1000000 AS s
        FROM events
    ), per_page AS (
        SELECT page,
               CAST(count(*) AS BIGINT) AS n_changes,
               CAST(min(s) AS BIGINT)   AS first_s,
               CAST(max(s) AS BIGINT)   AS last_s
        FROM ev GROUP BY page
    ), now_t AS (
        SELECT CAST(max(s) AS BIGINT) AS now_s FROM ev
    )
    SELECT page,
           n_changes,
           CAST(now_s - last_s AS BIGINT)           AS staleness_s,
           CAST(now_s - first_s AS BIGINT)          AS obs_span_s,
           CAST(n_changes * (now_s - last_s) AS DOUBLE)
             / GREATEST(now_s - first_s, 1)         AS score
    FROM per_page, now_t
    ORDER BY score DESC, page
    LIMIT {TOP_N}
"""

QUERIES = {
    "recrawl_priority": recrawl_priority,
}

ORACLE_SQL = {
    "recrawl_priority": _ORACLE,
}
