"""Structured Streaming surface.

The crawl itself is a deterministic wave loop, NOT Structured
Streaming — the north rule requires exact crawl-order reproduction and
trigger batching is nondeterministic (SURVEY.md §1.4).  Streaming
still belongs in the engine for the *downstream* continuous loads a
production deployment runs beside the crawl:

- :func:`stream_event_window_counts` — file-source micro-batch ingest
  of the events table with a watermark + tumbling-window aggregate
  (the standard late-data-tolerant rollup).  Run with
  ``Trigger.AvailableNow`` it is deterministic and is registered as an
  oracle-checked driver query.
- :func:`stream_running_max_by_user` — custom stateful operator via
  ``applyInPandasWithState`` (GroupState): per-user running maximum
  with event-time timeout plumbing, the shape a custom crawl-metrics
  accumulator would use.
- :func:`stream_click_attribution` — watermarked STREAM-STREAM inner
  join (signups x clicks within 1 h), the double-buffered state-store
  join with event-time range eviction.

Scale notes: the file source scales by listing; state store is
per-key (user) — keys hash-partition across executors, and the
watermark bounds state size.

API note: Spark 4's successor stateful API
(``transformWithStateInPandas`` / StatefulProcessor) is present in
this PySpark build but its driver-side runner requires
``google.protobuf``, which this container lacks (verified:
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, ImportError) — the
GroupState form below is the portable implementation; porting the
processor is mechanical (getValueState + handleInputRows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.epochs import epoch_floor_s

_qn_counter = [0]


def _as_source_dir(sf_dir: str, table: str) -> str:
    """The file stream source requires a *directory*; the testdata
    tables are single parquet files (read-only), so expose each via a
    symlink inside a temp directory."""
    import os
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(),
        "ids-stream-src",
        sf_dir.strip("/").replace("/", "_"),
        table,
    )
    os.makedirs(d, exist_ok=True)

    def _link(src_file: str, dst: str) -> None:
        # race-safe (two concurrent sessions may point at the same
        # dir): create the symlink under a unique name, then atomically
        # rename over the destination — os.replace handles an existing
        # dst, and a dangling prior link is replaced rather than skipped
        tmp = f"{dst}.{os.getpid()}.tmp"
        if os.path.lexists(tmp):
            os.unlink(tmp)
        os.symlink(src_file, tmp)
        os.replace(tmp, dst)

    src = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(src):
        # Spark-written table: a DIRECTORY of part files.  The file
        # stream source does not follow a symlinked directory, so link
        # each part file individually.
        for name in sorted(os.listdir(src)):
            if name.endswith(".parquet"):
                _link(os.path.join(src, name), os.path.join(d, name))
    else:
        _link(src, os.path.join(d, f"{table}.parquet"))
    return d


def _run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain a streaming DataFrame with availableNow into a memory sink
    and return the materialized batch result."""
    _qn_counter[0] += 1
    qn = f"{query_name}_{_qn_counter[0]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qn)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(qn)


def stream_event_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch ingest of events with 1-hour tumbling windows and a
    1-day watermark; returns the drained, deterministic batch result
    (window start/end as timestamps, count + rounded value sum)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_as_source_dir(sf_dir, "events"))
    )
    # Timezone independence: the tumbling bucket is computed as pure
    # WALL-CLOCK arithmetic on the parquet TIMESTAMP_NTZ (subtract the
    # sub-hour fields; field reads never consult the session zone), so
    # window_start is identical under any host session timezone.  The
    # previous `window(cast(ts as timestamp), '1 hour')` shifted
    # bucket bounds with the session zone — and would misalign them
    # outright for half-hour zones.  Spark still requires a TIMESTAMP
    # event-time column for the watermark, so the cast survives ONLY
    # as the state-eviction clock (`ts_evict`), never in output values
    # (complete-mode drain: the watermark gates state size, not
    # emission).
    sub_hour = F.make_dt_interval(
        F.lit(0),
        F.lit(0),
        F.minute("ts"),
        F.extract(F.lit("SECOND"), F.col("ts")),
    )
    src = src.withColumn("window_start", F.col("ts") - sub_hour).withColumn(
        "ts_evict", F.col("ts").cast("timestamp")
    )
    agg = (
        src.withWatermark("ts_evict", "1 day")
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select("window_start", "event_type", "n", "value_sum")
    )
    return _run_available_now(agg, "event_window_counts")


_STATE_SCHEMA = "user_id LONG, running_max DOUBLE"
_OUT_SCHEMA = "user_id LONG, batch_rows INT, running_max DOUBLE"


def _running_max_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    prev = state.get[1] if state.exists else float("-inf")
    n = 0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            prev = max(prev, float(pdf["value"].max()))
    state.update((user_id, prev))
    yield pd.DataFrame(
        {"user_id": [user_id], "batch_rows": [n], "running_max": [prev]}
    )


def stream_running_max_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running max of ``value`` across micro-batches.  Drained
    with availableNow; the final per-user maxima equal the batch
    ``groupBy(user_id).max(value)`` (asserted in tests)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(_as_source_dir(sf_dir, "events"))
    )
    stateful = src.groupBy("user_id").applyInPandasWithState(
        _running_max_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    _qn_counter[0] += 1
    qn = f"running_max_{_qn_counter[0]}"
    q = (
        stateful.writeStream.format("memory")
        .queryName(qn)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user is the final running max
    updates = spark.table(qn)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("running_max"))
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "running_max")
    )


def stream_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup — the continuous form of
    ``exact_dedup_docs``: micro-batch ingest of documents with a
    running per-content-hash aggregate (keeper = min doc_id, copy
    count).  Drained with availableNow the result is deterministic and
    equals the batch group-by.  In production this runs beside the
    crawl: each landed wave streams through, and the state store keyed
    by content hash IS the incremental URL/content-seen aggregate —
    keys hash-partition across executors, state size is bounded by the
    number of distinct documents (compact: one hash + two longs per
    key).
    """
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_as_source_dir(sf_dir, "documents"))
    )
    agg = src.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return _run_available_now(agg, "exact_dedup_stream")


SLIDE_WIN_S = 600  # sliding-window length (10 min)
SLIDE_STEP_S = 300  # slide (5 min) — every event lands in exactly 2 windows


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING windows (the overlap complement of the tumbling stream
    query above): event counts per 10-minute window sliding every 5
    minutes.  ``F.window(ts, len, slide)`` expands each event into
    ``len/slide`` window copies BEFORE the aggregate — a bounded 2x
    map-side amplification here, and the aggregate stays one
    partial+final shuffle keyed by (window, type).  Counts only:
    integer measures keep the cross-engine hash exact.  The streaming
    form is this same groupBy behind ``readStream`` + a watermark
    (see :func:`stream_event_window_counts`); batch form keeps the
    oracle deterministic."""
    # window() accepts TIMESTAMP_NTZ directly in batch and buckets on
    # the wall clock (timezone-free); the previous LTZ cast shifted
    # win_start_s by the session offset under a non-UTC driver session
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(
            F.window(
                "ts", f"{SLIDE_WIN_S} seconds", f"{SLIDE_STEP_S} seconds"
            ).alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            epoch_floor_s(F.col("w.start")).alias("win_start_s"),
            "event_type",
            "n_events",
        )
    )


def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join — the continuous form of
    ``range_attribution`` (operators/temporal.py): streaming signups
    joined to streaming clicks by the same user within the following
    hour, both sides watermarked so the state store provably expires.

    This is the one join shape unique to Structured Streaming: neither
    side is a static dim, so BOTH sides buffer in the state store and
    the event-time range condition (``cts`` in ``[sts, sts + 1h)``)
    plus the two watermarks is what lets Spark garbage-collect buffered
    rows — without it state grows without bound at 100 TB/day.  Keys
    hash-partition on ``user_id`` across executors.

    Drained with ``availableNow`` into an append-mode memory sink the
    match set is deterministic (late-data drops need a second batch to
    exist; the single-directory source drains in one), so the oracle is
    the plain bounded range join.  Output: one row per (signup, click)
    match with the integer lag."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = _as_source_dir(sf_dir, "events")

    def _side(etype: str, prefix: str) -> DataFrame:
        s = (
            spark.readStream.schema(schema)
            .format("parquet")
            .load(src_dir)
            .filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").cast("timestamp").alias(f"{prefix}ts"),
            )
        )
        return s.withWatermark(f"{prefix}ts", "1 day")

    signups = _side("signup", "s")
    clicks = _side("click", "c")
    joined = signups.join(
        clicks,
        (F.col("s_user") == F.col("c_user"))
        & (F.col("cts") >= F.col("sts"))
        & (F.col("cts") < F.col("sts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        F.col("s_id").alias("signup_id"),
        F.col("c_id").alias("click_id"),
        F.col("s_user").alias("user_id"),
        (F.col("cts").cast("long") - F.col("sts").cast("long")).alias("lag_s"),
    )
    _qn_counter[0] += 1
    qn = f"click_attr_{_qn_counter[0]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(qn)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qn)


QUERIES = {
    "stream_event_window_counts": stream_event_window_counts,
    "stream_exact_dedup": stream_exact_dedup,
    "sliding_window_counts": sliding_window_counts,
    "stream_click_attribution": stream_click_attribution,
}

ORACLE_SQL = {
    "stream_event_window_counts": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n, round(sum(value), 2) AS value_sum
        FROM events
        GROUP BY 1, 2
    """,
    "stream_exact_dedup": """
        SELECT md5(text) AS content_md5,
               min(doc_id) AS keeper_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "stream_click_attribution": """
        SELECT s.event_id AS signup_id, c.event_id AS click_id,
               s.user_id,
               CAST(epoch_us(c.ts) // 1000000
                    - epoch_us(s.ts) // 1000000 AS BIGINT) AS lag_s
        FROM events s JOIN events c
          ON c.user_id = s.user_id
         AND c.event_type = 'click'
         AND c.ts >= s.ts
         AND c.ts < s.ts + INTERVAL 1 HOUR
        WHERE s.event_type = 'signup'
    """,
    # every event belongs to exactly WIN/STEP = 2 sliding windows:
    # starts k*STEP and k*STEP - STEP where k = epoch // STEP
    "sliding_window_counts": f"""
        WITH e AS (
            SELECT event_type, epoch_us(ts) // 1000000 AS s FROM events
        ),
        w AS (
            SELECT event_type,
                   (s // {SLIDE_STEP_S}) * {SLIDE_STEP_S} AS win_start_s
            FROM e
            UNION ALL
            SELECT event_type,
                   (s // {SLIDE_STEP_S}) * {SLIDE_STEP_S} - {SLIDE_STEP_S}
            FROM e
        )
        SELECT CAST(win_start_s AS BIGINT) AS win_start_s, event_type,
               count(*) AS n_events
        FROM w GROUP BY 1, 2
    """,
}
