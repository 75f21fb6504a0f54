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


# --- crawl -> media-attachment decode (the north-star composition) --

# attachment grammar: 32x32 gray, 4x4 grid of flat 8x8 tiles, tile k
# value = 8 + (ref_id*31 + k*17) % 240.  Flat tiles make the lossy
# JPEG path BIT-EXACT (functions/jpeg.py module docstring), so every
# decoded statistic is ref_id arithmetic — replayable without the
# codecs (tests/test_crawl_media.py does exactly that in numpy).
MEDIA_GRID = 4
MEDIA_TILE_A = 31
MEDIA_TILE_B = 17


def crawl_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END media axis of the input_hint table: the crawl
    engine's interleaved span sequences carry media_refs to case
    attachments (reference test page resources/test_files/
    test_123456.html:24-26 — mugshot + document images per case), and
    a training pipeline must FETCH and DECODE those attachments.  This
    query runs the whole composition: crawled spans (plans/frontier.py
    S6 sink) -> media spans (native explode/filter/regexp) -> fetch
    the attachment bytes (deterministic tile grammar standing in for
    the portal's media endpoint — mugshots as baseline JPEG, document
    images as PNG, REAL encoders) -> decode with the REAL pure-stdlib
    codecs (functions/jpeg.py, functions/png.py) -> exact per-
    attachment pixel statistics.

    Rows-only driver check (the crawl side has no SQL oracle by
    design); ground truth is tests/test_crawl_media.py, which replays
    every statistic as ref_id arithmetic in numpy and asserts full
    row equality — the lossy JPEG leg only matches because the
    flat-tile bit-exactness contract holds end to end.

    Scale shape: span explode + ref parse are native; the fetch+decode
    boundary is ONE mapInPandas over O(media-span) rows, round-robin
    rebalanced first (codec work must not inherit the doc table's
    scan granularity — same contract as pipeline_queries
    ._media_decoded); no hash exchange before the final sort."""
    import pandas as pd

    spans = (
        _engine(spark)
        .documents()
        .select("doc_id", "county", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", "county", F.col("s.media_ref").alias("media_ref"))
    )
    parsed = spans.select(
        "doc_id",
        "county",
        "media_ref",
        F.when(F.col("media_ref").startswith("ViewMugshots"), "mugshot")
        .otherwise("doc_image")
        .alias("media_type"),
        F.regexp_extract("media_ref", r"=(\d+)$", 1).cast("long").alias("ref_id"),
    ).repartition(spark.sparkContext.defaultParallelism)

    def fetch_decode(batches):
        import numpy as np

        from ..functions import jpeg as jpegmod
        from ..functions import png as pngmod

        nt = MEDIA_GRID * MEDIA_GRID
        side = MEDIA_GRID * 8
        cols = [
            "doc_id", "county", "media_ref", "media_type", "ref_id",
            "format", "width", "height", "px_sum", "px_min", "px_max",
        ]
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, county, ref, mtype, rid in zip(
                pdf["doc_id"], pdf["county"], pdf["media_ref"],
                pdf["media_type"], pdf["ref_id"],
            ):
                rid = int(rid)
                tiles = np.array(
                    [
                        8 + (rid * MEDIA_TILE_A + k * MEDIA_TILE_B) % 240
                        for k in range(nt)
                    ],
                    dtype=np.int64,
                )
                img = np.kron(
                    tiles.reshape(MEDIA_GRID, MEDIA_GRID).astype(np.uint8),
                    np.ones((8, 8), dtype=np.uint8),
                ).tobytes()
                if mtype == "mugshot":
                    blob = jpegmod.encode_jpeg(side, side, img)
                    w, h, _nc, px = jpegmod.decode_jpeg(blob)
                    fmt = "jpeg"
                else:
                    blob = pngmod.encode_png(side, side, img)
                    w, h, _ct, px = pngmod.decode_png(blob)
                    fmt = "png"
                a = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                rows.append(
                    (doc_id, county, ref, mtype, rid, fmt, w, h,
                     int(a.sum()), int(a.min()), int(a.max()))
                )
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        "doc_id string, county string, media_ref string,"
        " media_type string, ref_id long, format string, width int,"
        " height int, px_sum long, px_min int, px_max int"
    )
    return parsed.mapInPandas(fetch_decode, schema=schema).orderBy(
        "doc_id", "media_ref"
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
    "crawl_media_decode_stats": crawl_media_decode_stats,
}

ORACLE_SQL: dict[str, str] = {}  # ground truth = sequential oracle (pytest)
