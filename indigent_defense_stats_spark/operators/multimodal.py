"""Multimodal columns over the span documents (training-data layer).

The span grammar interleaves ``kind='media'`` spans (mugshot and
document-image refs — reference artifact:
/root/reference/resources/test_files/test_123456.html:24-26,
``ViewMugshots.aspx``) with text.  This module provides the pipeline
plumbing a 100 TB multimodal corpus needs:

- :func:`media_table` — explode media spans into a typed media table
  (native ops; media treated as opaque refs + typed metadata)
- :func:`decode_media` — metadata extraction behind ``mapInPandas``.
  The real decoder (PIL/ffmpeg) is NOT in this container, so the
  default is a deterministic stub that fabricates plausible metadata
  from the ref hash; ``decoder='real'`` raises NotImplementedError at
  the exact integration point.  The Spark-side contract — schema,
  Arrow batch shape, partition spread — is real and tested.
- :func:`frame_sample` — every-nth-frame sampling rows via native
  ``sequence``/``explode`` (no UDF): the video-path shape.

Scale notes: decode is per-item local (zero shuffle); media tables
should be bucketed by doc_id so media joins back to text co-partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import xxh64_int

DECODE_SCHEMA = (
    "doc_id string, media_ref string, media_kind string,"
    " width int, height int, n_bytes long, format string"
)


def media_table(documents: DataFrame) -> DataFrame:
    """documents(spans) -> (doc_id, county, media_ref, media_kind, offset)."""
    s = documents.select(
        "doc_id", "county", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media")
    kind = (
        F.when(F.col("s.media_ref").contains("ViewMugshots"), "mugshot")
        .when(F.col("s.media_ref").contains("ViewDocument"), "document_image")
        .otherwise("unknown")
    )
    return s.select(
        "doc_id",
        "county",
        F.col("s.media_ref").alias("media_ref"),
        kind.alias("media_kind"),
        F.col("s.offset").alias("offset"),
    )


def decode_media(media: DataFrame, decoder: str = "stub") -> DataFrame:
    """Attach decoded metadata.  'stub' fabricates deterministic values
    from the ref hash; 'real' marks the PIL/ffmpeg integration point."""
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg, not present in this"
            " container; production ships them in the executor image and"
            " replaces _decode_batch below"
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["media_ref"].map(lambda r: xxh64_int(r.encode("utf-8")))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "width": (64 + (h % 512)).astype("int32"),
                    "height": (64 + ((h // 512) % 512)).astype("int32"),
                    "n_bytes": (1024 + (h % 100_000)).astype("int64"),
                    "format": pdf["media_kind"].map(
                        lambda k: "jpeg" if k == "mugshot" else "tiff"
                    ),
                }
            )

    return media.select("doc_id", "media_ref", "media_kind").mapInPandas(
        _decode_batch, schema=DECODE_SCHEMA
    )


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Every-nth-frame sample rows (video-shaped path): frame count is
    fabricated from n_bytes by the stub; the sequence/explode plumbing
    is the real thing."""
    n_frames = (F.col("n_bytes") / 1000).cast("int") + 1
    return decoded.select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
