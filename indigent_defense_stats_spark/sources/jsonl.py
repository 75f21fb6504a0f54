"""JSONL source/sink for the documents corpus — the interchange
format crawl dumps actually arrive in (one JSON object per line,
frequently with a tail of malformed records from truncated uploads or
encoding bugs).

Scale contract:
- **Explicit schema, never inference.**  ``spark.read.json`` without a
  schema runs a full extra pass over the data to infer one — at 100 TB
  that doubles the ingest cost and can still guess wrong on sparse
  fields.  The reader here always passes the target schema.
- **Quarantine, don't drop.**  PERMISSIVE mode routes every malformed
  line into ``_corrupt_record`` with the raw bytes preserved — the
  same keep-every-error contract as the parse-stage error sink
  (SURVEY.md §2 S9; reference keeps a scrape error log rather than
  dying: src/scrapers error handling).  A corrupt line is data about
  the upstream producer; silently dropping it hides pipeline rot.
- **Line-splittable.**  JSONL (unlike a JSON array) splits on newlines,
  so a 100 TB dump parallelizes by file-split exactly like text.

Implementation note: the reader is text-scan + ``from_json``, NOT
``spark.read.json`` with ``columnNameOfCorruptRecord`` — Spark's
internal corrupt-record column carries a query restriction
(SPARK-38114: any downstream query that column-prunes to just the
corrupt column is rejected unless the scan is cached, and caching a
100 TB ingest is not a plan).  Text + ``from_json`` has no internal
column: the raw line is an ordinary column, malformed lines parse to
NULL, and the scan stays a single pass with full pushdown.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# documents.parquet flat shape (doc_id, text, lang, source, n_chars)
_DOC_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_FIELD_NAMES = ["doc_id", "text", "lang", "source", "n_chars"]


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Export a documents DataFrame as JSONL (one object per line)."""
    df.write.mode("overwrite").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents JSONL dump with explicit schema + quarantine.

    Returns the full frame with ``is_corrupt`` (boolean) and
    ``raw_record`` (the offending line for quarantined rows, else
    NULL): good rows carry the typed document columns; corrupt rows
    carry NULL document columns and the raw line.  Callers split with
    ``.filter("is_corrupt")`` / ``.filter("NOT is_corrupt")``.
    """
    raw = spark.read.text(path)  # one column `value`, line-splittable
    # from_json's corrupt-record column is an ORDINARY struct field
    # (unlike the file reader's internal one), so no query restriction
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            _DOC_DDL + ", _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("d"),
        "value",
    )
    bad = F.col("d").isNull() | F.col("d._corrupt").isNotNull()
    return parsed.select(
        *[F.col(f"d.{n}").alias(n) for n in _FIELD_NAMES],
        bad.alias("is_corrupt"),
        F.when(bad, F.col("value")).alias("raw_record"),
    )
