"""End-to-end media axis of the interleaved crawl table.

`crawl_media_decode_stats` composes the whole north-star pipeline —
crawled interleaved spans -> media_ref attachments -> REAL JPEG/PNG
encode+decode -> exact pixel statistics.  Ground truth here replays
every statistic as ref_id ARITHMETIC in numpy (no codecs): the lossy
JPEG leg only agrees because the flat-tile bit-exactness contract
(functions/jpeg.py module docstring) holds through the real byte
path, so any codec regression breaks full-row equality.
"""

from __future__ import annotations

import numpy as np

from indigent_defense_stats_spark.operators import crawl_queries as cq


def _expected_stats(rid: int) -> tuple[int, int, int]:
    nt = cq.MEDIA_GRID * cq.MEDIA_GRID
    tiles = np.array(
        [8 + (rid * cq.MEDIA_TILE_A + k * cq.MEDIA_TILE_B) % 240 for k in range(nt)],
        dtype=np.int64,
    )
    return int(tiles.sum() * 64), int(tiles.min()), int(tiles.max())


def test_crawl_media_decode_stats_full_row_equality(spark):
    import pyspark.sql.functions as F

    out = cq.crawl_media_decode_stats(spark, "unused").collect()
    assert out, "crawl produced no media spans"

    # expected ref set straight from the engine's span table (itself
    # pinned byte-equal to the sequential oracle by test_frontier)
    spans = (
        cq._engine(spark)
        .documents()
        .select("doc_id", "county", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", "county", F.col("s.media_ref").alias("media_ref"))
        .collect()
    )
    expected = {}
    for r in spans:
        ref = r["media_ref"]
        rid = int(ref.rsplit("=", 1)[1])
        mtype = "mugshot" if ref.startswith("ViewMugshots") else "doc_image"
        fmt = "jpeg" if mtype == "mugshot" else "png"
        s, lo, hi = _expected_stats(rid)
        expected[(r["doc_id"], ref)] = (
            r["county"], mtype, rid, fmt, 32, 32, s, lo, hi,
        )

    got = {
        (r["doc_id"], r["media_ref"]): (
            r["county"], r["media_type"], r["ref_id"], r["format"],
            r["width"], r["height"], r["px_sum"], r["px_min"], r["px_max"],
        )
        for r in out
    }
    assert got == expected

    # both attachment families present, exercising BOTH real codecs
    fmts = {r["format"] for r in out}
    assert fmts == {"jpeg", "png"}

    # output is sorted (doc_id, media_ref) — the registry contract
    keys = [(r["doc_id"], r["media_ref"]) for r in out]
    assert keys == sorted(keys)
