"""Crawl-engine queries for the driver contract (rows-only checks).

These surface the URL-frontier engine (plans/frontier.py) through
``queries()``: each runs a small deterministic synthetic crawl (same
seed world the pytest oracle-equality suite uses) and returns a stable
DataFrame.  There is no SQL oracle — the ground truth is the
sequential reference simulator (oracle.py), and the pytest suite
asserts full equality (fetch order, seen set, span sequences); the
driver's rows-only check pins schema + row-count stability.

The synthetic world is fixed (REGISTRY_N counties x N_DAYS days) and
independent of ``sf_dir`` — crawl input is a seed list + politeness
budget, not a parquet table.  One crawl runs per process; results are
memoized across the three queries.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from datetime import date

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .. import synth
from ..plans.frontier import CrawlEngine

REGISTRY_N = 3
N_DAYS = 2
START = date(2024, 7, 1)

# keyed by the session OBJECT (held alive so ids can't be reused by a
# new session after the old one is collected); cleaned up at exit
_memo: dict[int, tuple[SparkSession, CrawlEngine]] = {}


def _engine(spark: SparkSession) -> CrawlEngine:
    key = id(spark)
    hit = _memo.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    d = tempfile.mkdtemp(prefix="ids-crawl-queries-")
    eng = CrawlEngine(
        spark,
        d,
        synth.make_registry(REGISTRY_N, n_scrape=REGISTRY_N),
        START,
        N_DAYS,
        n_buckets=4,
    )
    eng.run()
    _memo[key] = (spark, eng)
    return eng


def crawl_fetch_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch log in the reference's logical crawl order (O5/C5):
    county registry order, then date asc, officer insertion order,
    DOM link order — the exact order the sequential reference fetches
    (equality vs oracle asserted in tests/test_frontier.py)."""
    return (
        _engine(spark)
        .fetch_log()
        .select(
            "host",
            "canonical_url",
            "county",
            "depth",
            "status",
            "attempts",
            "wave",
            "county_ord",
            "prio",
            "date_ord",
            "jo_ord",
            "link_ord",
        )
        .orderBy("county_ord", "prio", "date_ord", "jo_ord", "link_ord")
    )


def crawl_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved span sequences of the crawled documents (the
    input_hint table shape), exploded to one row per span."""
    return (
        _engine(spark)
        .documents()
        .select("doc_id", "county", F.explode("spans").alias("s"))
        .select("doc_id", "county", "s.kind", "s.text", "s.media_ref", "s.offset")
        .orderBy("doc_id", "offset")
    )


def crawl_wave_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-wave, per-partition lineage metrics (C6 checkpoint
    contract): fetched/failed counts and attempt totals as persisted
    to the metrics snapshot table each wave."""
    return (
        _engine(spark)
        .metrics_t.read_or_empty()
        .groupBy("wave", "status")
        .agg(F.sum("n").alias("n"), F.sum("attempts").alias("attempts"))
        .orderBy("wave", "status")
    )


def cleanup() -> None:
    for _, eng in _memo.values():
        shutil.rmtree(eng.base_dir, ignore_errors=True)
    _memo.clear()


atexit.register(cleanup)


QUERIES = {
    "crawl_fetch_log": crawl_fetch_log,
    "crawl_doc_spans": crawl_doc_spans,
    "crawl_wave_metrics": crawl_wave_metrics,
}

ORACLE_SQL: dict[str, str] = {}  # ground truth = sequential oracle (pytest)
