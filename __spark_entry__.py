"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (plus the training-data-pipeline, crawl, streaming
and SQL layers); the driver compares each Spark result against its
DuckDB oracle at sf0.01.

Imports are deliberately NOT wrapped in try/except: every module here
exists in-repo, so an import failure is a real defect that must fail
loudly rather than silently shrink the graded query surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by region —
    the multi-join + aggregate shape at the heart of the analytics
    layer (SURVEY.md §2.3/§2.4)."""
    from indigent_defense_stats_spark.operators import relational

    return relational.region_revenue(spark, "/root/testdata/sf0.001")


def _modules():
    from indigent_defense_stats_spark.operators import (
        corpusprep,
        crawl_queries,
        decontam,
        dedup,
        interleaved,
        pipeline_queries,
        relational,
        similarity,
        textstats,
    )
    from indigent_defense_stats_spark.sources import views
    from indigent_defense_stats_spark.streaming import ingest, sessions

    return [
        relational,
        textstats,
        decontam,
        dedup,
        interleaved,
        similarity,
        corpusprep,
        pipeline_queries,
        crawl_queries,
        ingest,
        sessions,
        views,
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        osql = m.ORACLE_SQL
        # modules whose oracles bake data-derived constants (e.g. the
        # IVF centroids) expose ORACLE_SQL as a zero-arg callable so
        # the constants are computed lazily, not at import
        out.update(osql() if callable(osql) else osql)
    return out
