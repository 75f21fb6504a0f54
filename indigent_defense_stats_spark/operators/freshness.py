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
from pyspark.sql import DataFrame, SparkSession, Window

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


_HOST_MOD = 20
_HOST_CAP = 12  # heavy-tail host (the big-county skew analog)


def waterfill(demand: DataFrame, budget: int) -> DataFrame:
    """Max-min fair (water-filling) split of an integer fetch budget
    across hosts: ``(host, demand)`` -> ``(host, demand, allocation,
    capped)``.

    A crawl wave has a global fetch budget (politeness x wave wall
    clock); per-host demand is the pending frontier per host.  Giving
    every host its demand overruns the budget; proportional split
    starves small hosts.  Max-min fairness satisfies every demand
    below the water level L and caps the rest AT L — the classic
    link-bandwidth allocation (Bertsekas & Gallager, Data Networks
    §6.5.2) applied to crawl scheduling.

    Closed-form, not iterative: sort hosts by (demand, host); at rank
    i (1-based, n hosts, prefix = demand sum before i) the equal
    share for the rest is ``floor((B - prefix_i) / (n - i + 1))``;
    the FIRST rank whose share is below its own demand is the binding
    rank i*, L = its share, and the integer remainder ``r = (B -
    prefix_{i*}) - L * (n - i* + 1)`` goes +1 to the first r capped
    ranks.  Ranks before i* get full demand.  No binding rank =>
    budget covers total demand.  Every quantity is exact integer
    arithmetic; sum(allocation) == min(B, sum(demand)).

    Scale shape: the demand table is a per-host aggregate — an
    O(#active hosts) dim, thousands of rows per wave at 10^10-URL
    scale — so the single-partition rank window is bounded and cheap
    (the same reasoning as the engine's per-host clock dim); the
    1-row binding-rank aggregate broadcasts back.  The upstream
    demand aggregate is the only data-sized shuffle.
    """
    n_w = Window.partitionBy(F.lit(1))
    rank_w = Window.partitionBy(F.lit(1)).orderBy("demand", "host")
    cum_w = rank_w.rowsBetween(Window.unboundedPreceding, -1)
    ranked = demand.select(
        "host",
        "demand",
        F.row_number().over(rank_w).alias("i"),
        F.coalesce(F.sum("demand").over(cum_w), F.lit(0)).alias("prefix"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    ).localCheckpoint(eager=False)
    left = F.lit(budget) - F.col("prefix")
    share = F.floor(
        F.greatest(left, F.lit(0)) / (F.col("n") - F.col("i") + 1)
    ).cast("long")
    shared = ranked.withColumn("share", share)
    binding = shared.filter(F.col("share") < F.col("demand")).agg(
        F.min("i").alias("i_star"),
        F.min_by("share", "i").alias("level"),
        (
            F.min_by(left, "i")
            - F.min_by("share", "i") * F.min_by(F.col("n") - F.col("i") + 1, "i")
        ).alias("rem"),
    )
    out = shared.crossJoin(F.broadcast(binding)).select(
        "host",
        "demand",
        F.when(
            F.col("i_star").isNull() | (F.col("i") < F.col("i_star")),
            F.col("demand"),
        )
        .otherwise(
            F.col("level")
            + F.when(F.col("i") - F.col("i_star") < F.col("rem"), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocation"),
    )
    return out.withColumn(
        "capped", F.col("allocation") < F.col("demand")
    )


def crawl_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: demand = docs per synthetic host (redirects.py's
    host scheme, so host12 carries the heavy tail), budget = 60% of
    total demand — the binding regime."""
    d = F.col("doc_id")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(
            F.lit("host"),
            F.least(d % _HOST_MOD, F.lit(_HOST_CAP)).cast("string"),
            F.lit(".example"),
        ).alias("host")
    )
    demand = docs.groupBy("host").agg(F.count(F.lit(1)).alias("demand"))
    total = demand.agg(F.sum("demand").cast("long").alias("t")).collect()[0]["t"]
    budget = total * 6 // 10
    return waterfill(demand, budget).orderBy("host")


_WATERFILL_ORACLE = f"""
    WITH demand AS (
        SELECT 'host' || LEAST(doc_id % {_HOST_MOD}, {_HOST_CAP})
                      || '.example'          AS host,
               CAST(count(*) AS BIGINT)      AS demand
        FROM documents GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(demand) AS BIGINT) * 6 // 10 AS b FROM demand
    ), ranked AS (
        SELECT host, demand,
               row_number() OVER w                            AS i,
               CAST(coalesce(sum(demand) OVER (
                   ORDER BY demand, host
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT)                               AS prefix,
               CAST(count(*) OVER () AS BIGINT)               AS n
        FROM demand
        WINDOW w AS (ORDER BY demand, host)
    ), shared AS (
        SELECT r.*, t.b,
               GREATEST(b - prefix, 0) // (n - i + 1) AS share
        FROM ranked r, tot t
    ), binding AS (
        SELECT min(i)                                  AS i_star,
               arg_min(share, i)                       AS level,
               arg_min(b - prefix, i)
                 - arg_min(share, i) * arg_min(n - i + 1, i) AS rem
        FROM shared WHERE share < demand
    )
    SELECT host, demand,
           CAST(CASE WHEN i_star IS NULL OR i < i_star THEN demand
                     ELSE level + CASE WHEN i - i_star < rem
                                       THEN 1 ELSE 0 END
                END AS BIGINT)                         AS allocation,
           CAST(CASE WHEN i_star IS NULL OR i < i_star THEN demand
                     ELSE level + CASE WHEN i - i_star < rem
                                       THEN 1 ELSE 0 END
                END AS BIGINT) < demand                AS capped
    FROM shared LEFT JOIN binding ON TRUE
    ORDER BY host
"""


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

def allocation_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row fairness AUDIT of the waterfill wave budget: Jain's
    fairness index J = (sum x)^2 / (n * sum x^2) (Jain, Chiu & Hawe,
    DEC-TR-301, 1984) over the per-host allocations, next to the same
    index for the RAW DEMAND — the number that quantifies what
    max-min fairness bought (J = 1 is perfectly equal; 1/n is one
    host taking everything).  A crawl SLO dashboard alerts on this.

    Determinism: sums and squared sums are exact BIGINTs (allocations
    are integers; max value ~1e5 so x^2 sums stay far inside BIGINT);
    each index is two IEEE ops on identical operands — (s*s) exact
    within double range, one multiply, one division — bit-identical
    cross-engine.
    """
    w = crawl_budget_waterfill(spark, sf_dir)
    agg = w.agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.sum("allocation").cast("long").alias("sa"),
        F.sum(F.col("allocation") * F.col("allocation"))
        .cast("long")
        .alias("sa2"),
        F.sum("demand").cast("long").alias("sd"),
        F.sum(F.col("demand") * F.col("demand")).cast("long").alias("sd2"),
        F.sum(F.col("capped").cast("long")).alias("n_capped"),
    )
    jain = lambda s, s2: F.round(  # noqa: E731
        (F.col(s) * 1.0 * F.col(s)) / (F.col("n_hosts") * 1.0 * F.col(s2)), 6
    )
    return agg.select(
        "n_hosts",
        "n_capped",
        F.col("sa").alias("total_allocated"),
        jain("sa", "sa2").alias("jain_allocation"),
        jain("sd", "sd2").alias("jain_demand"),
    )


_FAIRNESS_ORACLE = f"""
    WITH w AS ({_WATERFILL_ORACLE}),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_hosts,
               CAST(sum(CAST(capped AS BIGINT)) AS BIGINT) AS n_capped,
               CAST(sum(allocation) AS BIGINT) AS sa,
               CAST(sum(allocation * allocation) AS BIGINT) AS sa2,
               CAST(sum(demand) AS BIGINT) AS sd,
               CAST(sum(demand * demand) AS BIGINT) AS sd2
        FROM w
    )
    SELECT n_hosts, n_capped, sa AS total_allocated,
           round((sa * 1.0 * sa) / (n_hosts * 1.0 * sa2), 6)
               AS jain_allocation,
           round((sd * 1.0 * sd) / (n_hosts * 1.0 * sd2), 6)
               AS jain_demand
    FROM agg
"""

QUERIES = {
    "recrawl_priority": recrawl_priority,
    "crawl_budget_waterfill": crawl_budget_waterfill,
    "allocation_fairness": allocation_fairness,
}

ORACLE_SQL = {
    "recrawl_priority": _ORACLE,
    "crawl_budget_waterfill": _WATERFILL_ORACLE,
    "allocation_fairness": _FAIRNESS_ORACLE,
}
