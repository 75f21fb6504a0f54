"""Session windows (SURVEY §2 C7/C8 surface): gap-based sessionization
over the events table, batch and streaming.

The reference pipeline has no streaming stage (the crawl is a
deterministic wave loop), but the brief's training-data layer calls
for watermark/window handling and ``applyInPandasWithState`` custom
stateful operators — this module provides the canonical one:

- :func:`session_windows` — BATCH sessionization: a new session starts
  when a user's inter-event gap exceeds ``GAP_SECONDS``.  Pure window
  functions (lag -> boundary flag -> running sum -> groupBy), fully
  whole-stage-codegen, one shuffle on ``user_id``; oracle-checked as a
  driver query.
- :func:`stream_session_windows` — the SAME semantics as a custom
  stateful streaming operator via ``applyInPandasWithState``: state
  carries the open session per user across micro-batches; sessions
  are emitted when a later event closes them.  The final open session
  per user never closes on a finite stream — pytest asserts the
  emitted set equals the batch result minus each user's last session.

Scale notes: batch sessionization shuffles each user's events once
(hash on user_id) and sorts within partitions — linear + per-key sort
at 100 TB, no driver state.  The streaming state store is O(open
sessions) = O(active users); keys hash-partition across executors and
a watermark (or state TTL) bounds retention in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.epochs import epoch_floor_s
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .ingest import _qn_counter

# 12-hour inactivity gap: at the testdata's event density this yields
# ~3 events/session (multi-event sessions actually exercise the fold;
# a web-typical 30-min gap degenerates to singletons here)
GAP_SECONDS = 12 * 3600


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keep the parquet TIMESTAMP_NTZ: every downstream computation is
    # wall-clock arithmetic, and NTZ is immune to the session timezone
    # (a cast to TIMESTAMP here shifted outputs — and, near DST
    # transitions, gaps — whenever a host session was not UTC)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _epoch_floor_s(ts) -> "F.Column":
    """Shared timezone-free whole-second epoch (functions/epochs.py);
    kept as a local alias for the docstring cross-references."""
    return epoch_floor_s(ts)


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-sessionization: (user_id, session_id ordinal) ->
    start/end/n_events/value_sum.  Ties broken by event_id so the
    boundary flags are deterministic."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = _epoch_floor_s("ts")
    gap_s = sec - F.lag(sec).over(order)
    flagged = _events(spark, sf_dir).withColumn(
        "new_sess",
        F.when(gap_s.isNull() | (gap_s > GAP_SECONDS), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    with_id = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_id.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


# streaming state: the open session for one user (timestamps in
# MICROseconds — events carry sub-second precision; only the gap test
# truncates to whole seconds, mirroring the batch cast-to-long)
_STATE_SCHEMA = (
    "start_us LONG, last_us LONG, n LONG, value_sum DOUBLE, sess_ord LONG"
)
_OUT_SCHEMA = (
    "user_id LONG, session_id LONG, session_start TIMESTAMP,"
    " session_end TIMESTAMP, n_events LONG, value_sum DOUBLE"
)


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch into the open-session state,
    emitting every session CLOSED by a subsequent gap.  Within a batch
    events are sorted by (ts, event_id); batches are assumed
    time-ordered (file source fed time-ranged files — the
    production analog is a watermark dropping late rows)."""
    (user_id,) = key
    if state.exists:
        start_us, last_us, n, vsum, ord_ = state.get
    else:
        start_us = last_us = None
        n, vsum, ord_ = 0, 0.0, 0
    closed: list[tuple] = []
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        micros = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000
        )
        for ts_us, val in zip(micros, pdf["value"]):
            ts_us = int(ts_us)
            if last_us is not None and (
                ts_us // 1_000_000 - last_us // 1_000_000 > GAP_SECONDS
            ):
                closed.append((ord_, start_us, last_us, n, vsum))
                start_us, n, vsum = ts_us, 0, 0.0
                ord_ += 1
            elif last_us is None:
                start_us, ord_ = ts_us, ord_ + 1
            last_us = ts_us
            n += 1
            vsum += float(val)
    state.update((start_us, last_us, n, vsum, ord_))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_id": [c[0] for c in closed],
                "session_start": pd.to_datetime(
                    [c[1] for c in closed], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [c[2] for c in closed], unit="us"
                ),
                "n_events": [c[3] for c in closed],
                "value_sum": [round(c[4], 2) for c in closed],
            }
        )


def stream_session_windows(
    spark: SparkSession, source_dir: str, schema
) -> DataFrame:
    """Custom stateful session operator over a file-source stream
    (one micro-batch per file via maxFilesPerTrigger=1); returns the
    drained append-mode output: all sessions closed by later data."""
    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
    )
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    stateful = src.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    _qn_counter[0] += 1
    qn = f"session_windows_{_qn_counter[0]}"
    q = (
        stateful.writeStream.format("memory")
        .queryName(qn)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qn)


QUERIES = {
    "session_windows": session_windows,
}

ORACLE_SQL = {
    "session_windows": f"""
        WITH x AS (
            -- integer-second gap arithmetic mirroring Spark's
            -- cast(ts AS long) truncation: epoch_us // 1000000 is an
            -- integer FLOOR division.  (epoch(ts)::BIGINT would ROUND
            -- the fractional second — a latent boundary flip for
            -- sub-second timestamps near the gap threshold.)
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) // 1000000
                                - epoch_us(lag(ts) OVER w) // 1000000
                                > {GAP_SECONDS}
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            -- BIGINT cast: DuckDB window sum yields HUGEINT, which the
            -- comparator's pandas canonicalization formats differently
            SELECT *,
                   CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM x
        )
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS value_sum
        FROM s GROUP BY 1, 2
    """,
}
