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


def test_session_windows_stream_matches_batch_closed_sessions(spark, tmp_path):
    """The applyInPandasWithState session operator, fed time-ranged
    micro-batches, must emit exactly the batch sessionization minus
    each user's final (never-closed) session."""
    from indigent_defense_stats_spark.streaming import sessions

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    schema = events.schema
    # three time-ranged files -> three in-order micro-batches
    src = str(tmp_path / "src")
    os.makedirs(src)
    e = events.withColumn(
        "__ts_s", F.col("ts").cast("timestamp").cast("long")
    )
    cuts = e.approxQuantile("__ts_s", [0.33, 0.66], 0.0)
    lo, hi = int(cuts[0]), int(cuts[1])
    parts = [
        e.filter(F.col("__ts_s") <= lo),
        e.filter((F.col("__ts_s") > lo) & (F.col("__ts_s") <= hi)),
        e.filter(F.col("__ts_s") > hi),
    ]
    for i, p in enumerate(parts):
        p.drop("__ts_s").coalesce(1).write.parquet(f"{src}/b{i}")
    # file source lists lexicographically; move files up with ordered names
    import glob, shutil
    for i in range(3):
        (f,) = glob.glob(f"{src}/b{i}/part-*.parquet")
        shutil.move(f, f"{src}/{i:02d}.parquet")
        shutil.rmtree(f"{src}/b{i}")

    streamed = sessions.stream_session_windows(spark, src, schema)
    batch = sessions.session_windows(spark, SF_DIR)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    closed_batch = batch.withColumn(
        "max_sess", F.max("session_id").over(w)
    ).filter(F.col("session_id") < F.col("max_sess")).drop("max_sess")

    key = lambda r: (
        r["user_id"],
        r["session_id"],
        str(r["session_start"]),
        str(r["session_end"]),
        r["n_events"],
        round(r["value_sum"], 6),
    )
    a = sorted(key(r) for r in streamed.collect())
    b = sorted(key(r) for r in closed_batch.collect())
    assert len(a) > 0
    assert a == b


def test_stream_exact_dedup_matches_batch(spark):
    """The streaming per-content-hash aggregate drained with
    availableNow equals the batch group-by, and duplicate groups keep
    the minimum doc_id."""
    streamed = ingest.stream_exact_dedup(spark, SF_DIR)
    batch = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
    a = {tuple(map(str, r)) for r in streamed.collect()}
    b = {tuple(map(str, r)) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stream_exact_dedup_keeps_min_doc_id(spark, tmp_path):
    """On a corpus with planted duplicates the streaming aggregate
    keeps the minimum doc_id and counts the copies."""
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [
            (5, "same text twice", "en", "s", 15),
            (2, "same text twice", "en", "s", 15),
            (9, "unique text", "en", "s", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r["content_md5"]: r
        for r in ingest.stream_exact_dedup(spark, d).collect()
    }
    assert len(out) == 2
    by_copies = sorted(out.values(), key=lambda r: -r["n_copies"])
    assert by_copies[0]["n_copies"] == 2 and by_copies[0]["keeper_doc_id"] == 2
    assert by_copies[1]["n_copies"] == 1 and by_copies[1]["keeper_doc_id"] == 9


def test_sliding_windows_cover_each_event_twice(spark):
    """Every event lands in exactly WIN/STEP = 2 sliding windows, so
    the window-count total is exactly 2x the event count; each window
    start is STEP-aligned and windows overlap by construction."""
    from indigent_defense_stats_spark.streaming import ingest

    out = ingest.sliding_window_counts(spark, SF_DIR)
    rows = out.collect()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == 2 * n_events
    assert all(r["win_start_s"] % ingest.SLIDE_STEP_S == 0 for r in rows)


def test_stream_stream_join_matches_batch_range_join(spark):
    """Single-drain determinism: the watermarked stream-stream join
    equals the batch bounded range join, and per-signup match counts
    agree with the batch range_attribution operator."""
    from indigent_defense_stats_spark.operators import temporal

    streamed = ingest.stream_click_attribution(spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("sts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    batch = s.join(
        c,
        (s["s_user"] == c["c_user"])
        & (c["cts"] >= s["sts"])
        & (c["cts"] < s["sts"] + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "signup_id",
        "click_id",
        F.col("s_user").alias("user_id"),
        (F.col("cts").cast("long") - F.col("sts").cast("long")).alias("lag_s"),
    )
    a = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b and len(a) > 0
    # per-signup counts agree with the batch range-join operator
    got = {
        r["signup_id"]: r["n"]
        for r in streamed.groupBy("signup_id").agg(F.count("*").alias("n")).collect()
    }
    for r in temporal.range_attribution(spark, SF_DIR).collect():
        assert got.get(r["event_id"], 0) == r["n_clicks_1h"]


def test_stream_stream_join_evicts_late_state(spark, tmp_path):
    """Watermark-driven STATE EVICTION on a three-batch drain.  What
    Spark guarantees for stream-stream joins is eviction, not input
    filtering: a buffered row is removed once the watermark (taken at
    batch START, so one batch after it advances) proves no future
    match can arrive — after that, a week-late arrival finds nothing
    to join.  Two traps this test pins: (a) the global watermark is
    the MIN across both sides, so the click side needs a day-9 event
    too or nothing is ever late; (b) a late row arriving in the SAME
    batch the watermark first advances can still match (eviction runs
    with the batch-start watermark) — the drop is only guaranteed a
    batch later."""
    from datetime import datetime

    src = str(tmp_path / "ev")
    tbl = f"{src}/events.parquet"
    os.makedirs(tbl)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    day1 = datetime(2024, 1, 1, 9, 0)
    day9 = datetime(2024, 1, 9, 9, 0)
    batch1 = [
        (1, day1, 1, "signup", 0.0, "{}"),
        (2, day1, 1, "click", 0.0, "{}"),  # on-time match for signup 1
        (3, day9, 2, "signup", 0.0, "{}"),  # advances signup watermark
        (6, day9, 3, "click", 0.0, "{}"),  # advances click watermark
    ]
    batch2 = [
        (5, day9, 2, "click", 0.0, "{}"),  # on-time match for signup 3;
        # batch runs with watermark day 8 -> signup 1's state evicted
    ]
    batch3 = [
        # a click inside signup 1's hour, arriving a week late: the
        # buffered signup is gone -> no match
        (7, day1, 1, "click", 0.0, "{}"),
    ]
    for i, rows in enumerate([batch1, batch2, batch3]):
        part = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        (src_file,) = [
            f for f in os.listdir(part) if f.endswith(".parquet")
        ]
        dst = f"{tbl}/batch{i}.parquet"
        os.rename(f"{part}/{src_file}", dst)
        # the file source orders by modification time: force batch order
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    schema_df = spark.read.parquet(tbl).schema

    def _side(etype, prefix):
        s = (
            spark.readStream.schema(schema_df)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(tbl)
            .filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").cast("timestamp").alias(f"{prefix}ts"),
            )
        )
        return s.withWatermark(f"{prefix}ts", "1 day")

    joined = _side("signup", "s").join(
        _side("click", "c"),
        (F.col("s_user") == F.col("c_user"))
        & (F.col("cts") >= F.col("sts"))
        & (F.col("cts") < F.col("sts") + F.expr("INTERVAL 1 HOUR")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("late_drop_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pairs = {
        (r["s_id"], r["c_id"]) for r in spark.table("late_drop_test").collect()
    }
    assert pairs == {(1, 2), (3, 5)}, pairs  # (1, 7) evicted, never joined
