"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (plus the training-data-pipeline layer); the driver
compares each Spark result against its DuckDB oracle at sf0.01.
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from indigent_defense_stats_spark.operators import relational

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    try:
        from indigent_defense_stats_spark.operators import textstats

        out.update(textstats.QUERIES)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.operators import dedup

        out.update(dedup.QUERIES)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.operators import similarity

        out.update(similarity.QUERIES)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.operators import crawl_queries

        out.update(crawl_queries.QUERIES)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.streaming import ingest

        out.update(ingest.QUERIES)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.sources import views

        out.update(views.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from indigent_defense_stats_spark.operators import relational

    out: dict[str, str] = {}
    out.update(relational.ORACLE_SQL)
    try:
        from indigent_defense_stats_spark.operators import textstats

        out.update(textstats.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.operators import dedup

        out.update(dedup.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.operators import similarity

        out.update(similarity.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.operators import crawl_queries

        out.update(crawl_queries.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.streaming import ingest

        out.update(ingest.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from indigent_defense_stats_spark.sources import views

        out.update(views.ORACLE_SQL)
    except ImportError:
        pass
    return out
