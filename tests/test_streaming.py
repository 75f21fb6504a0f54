"""Structured Streaming surface: windowed ingest + custom stateful op.

The crawl is a deterministic wave loop (SURVEY §1.4); streaming covers
the continuous downstream loads.  Both paths drain a static parquet
source with Trigger.AvailableNow, so results are deterministic and
comparable to batch equivalents.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from indigent_defense_stats_spark.streaming import ingest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="testdata missing"
)


def test_window_counts_match_batch(spark):
    streamed = ingest.stream_event_window_counts(spark, SF_DIR)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )
    a = {tuple(map(str, r)) for r in streamed.collect()}
    b = {tuple(map(str, r)) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stateful_running_max_matches_batch(spark):
    streamed = ingest.stream_running_max_by_user(spark, SF_DIR)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.max("value").alias("running_max"))
    )
    a = {(r["user_id"], round(r["running_max"], 9)) for r in streamed.collect()}
    b = {(r["user_id"], round(r["running_max"], 9)) for r in batch.collect()}
    assert a == b and len(a) > 0
