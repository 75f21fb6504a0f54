"""Dirty-CSV ingest with quarantine accounting — the robustness layer
of the reference's CSV ingest (S1 county CSV / S14 event-charge CSV
sinks), which assumes clean files; web-scale feeds never are.

Spark's PERMISSIVE mode is the production contract: malformed rows
are NOT dropped — unparseable fields go NULL and the raw line is
captured in ``columnNameOfCorruptRecord`` so a quarantine sink keeps
every error (the engine's S9 error-log discipline, operators/parse.py
:420).  The semantics this operator pins (probed, not assumed):

- unparseable typed field  -> field NULL + row captured as corrupt
- EXTRA column             -> typed fields kept + row captured
- MISSING trailing column  -> missing field NULL + row captured
- EMPTY field              -> NULL, NOT corrupt (vacancy is legal)

The CSV itself is GENERATED deterministically from ``documents.doc_id``
with arithmetic corruption channels (one per rule above), written to
a temp dir and read back through the real Spark CSV reader — so the
parse path is genuinely exercised while the DuckDB oracle recomputes
the expected per-county accounting from the same arithmetic, never
touching the file.

Scale shape: CSV scan (splittable, linear) + one grouped aggregate.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .textstats import _docs

COUNTIES = ["hays", "travis", "bexar", "denton", "collin"]
# corruption channels, priority order (first match wins)
BAD_MOD, BAD_REM = 11, 3       # unparseable amount
EXTRA_MOD, EXTRA_REM = 13, 5   # extra trailing column
SHORT_MOD, SHORT_REM = 17, 7   # missing county column
EMPTY_MOD, EMPTY_REM = 19, 9   # legally empty amount


def _amount(d: int) -> int:
    return (d * 7) % 1000


def _classify(d: int) -> str:
    if d % BAD_MOD == BAD_REM:
        return "bad"
    if d % EXTRA_MOD == EXTRA_REM:
        return "extra"
    if d % SHORT_MOD == SHORT_REM:
        return "short"
    if d % EMPTY_MOD == EMPTY_REM:
        return "empty"
    return "clean"


def _line(d: int) -> str:
    county = COUNTIES[d % len(COUNTIES)]
    kind = _classify(d)
    if kind == "bad":
        return f"{d},notanint,{county}"
    if kind == "extra":
        return f"{d},{_amount(d)},{county},EXTRA"
    if kind == "short":
        return f"{d},{_amount(d)}"
    if kind == "empty":
        return f"{d},,{county}"
    return f"{d},{_amount(d)},{county}"


def _line_col() -> F.Column:
    """The CSV line per document as a pure Spark expression — the
    generation is DISTRIBUTED (written via ``write.text``), so the
    query holds no driver-side row state and works wherever the temp
    path is visible (point it at shared storage on a cluster; the
    local temp dir here is the sandbox fixture location)."""
    d = F.col("doc_id")
    id_s = d.cast("string")
    county = F.element_at(
        F.array(*[F.lit(c) for c in COUNTIES]),
        (d % len(COUNTIES)).cast("int") + 1,
    )
    amt = ((d * 7) % 1000).cast("string")
    return (
        F.when(
            d % BAD_MOD == BAD_REM,
            F.concat_ws(",", id_s, F.lit("notanint"), county),
        )
        .when(
            d % EXTRA_MOD == EXTRA_REM,
            F.concat_ws(",", id_s, amt, county, F.lit("EXTRA")),
        )
        .when(d % SHORT_MOD == SHORT_REM, F.concat_ws(",", id_s, amt))
        .when(
            d % EMPTY_MOD == EMPTY_REM,
            F.concat_ws(",", id_s, F.lit(""), county),
        )
        .otherwise(F.concat_ws(",", id_s, amt, county))
    )


def csv_quarantine_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(county, n_rows, sum_id, n_corrupt, n_amount_null, sum_amount):
    the per-feed ingest report a quarantine pipeline publishes.  Rows
    with a missing county column land under '(none)'."""
    d = tempfile.mkdtemp(prefix="ids-csvq-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    path = os.path.join(d, "feed")
    _docs(spark, sf_dir).select(
        _line_col().alias("value")
    ).write.mode("overwrite").text(path)
    df = (
        spark.read.schema(
            "id long, amount int, county string, _corrupt_record string"
        )
        .option("header", False)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # IMPORTANT: every schema column must be load-bearing in the
    # aggregate.  Spark's CSV column pruning parses ONLY the referenced
    # columns, and malformed-row detection runs on the pruned schema —
    # with `id` unreferenced, short/extra rows stopped being flagged
    # as corrupt (observed: n_corrupt dropped to 0 for short rows).
    # sum(id) forces the full-row parse, restoring the probed
    # PERMISSIVE semantics this module documents.
    return (
        df.groupBy(F.coalesce("county", F.lit("(none)")).alias("county"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("id").cast("long").alias("sum_id"),
            F.sum(
                F.col("_corrupt_record").isNotNull().cast("long")
            ).alias("n_corrupt"),
            F.sum(F.col("amount").isNull().cast("long")).alias(
                "n_amount_null"
            ),
            F.sum(F.coalesce("amount", F.lit(0)))
            .cast("long")
            .alias("sum_amount"),
        )
    )


EVOLVE_SPLIT_MOD = 3  # batch assignment: doc_id % 3 == 0 -> batch 1


def schema_evolution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet SCHEMA EVOLUTION accounting: batch 1 is written with
    the original schema (id, amount), batch 2 with an added column
    (id, amount, priority) — the lakehouse reality where a feed gains
    a field mid-history.  Reading the directory with
    ``mergeSchema=true`` must surface the union schema with NULLs for
    the pre-evolution rows; this query reports exactly that per batch
    (row counts, nulls in the late column, sums) so a drift monitor
    can alert when the null fraction stops falling.

    The two batches are generated arithmetically from doc_id and
    written through the REAL parquet writer + merged reader; the
    oracle recomputes the expected accounting from the same
    arithmetic.  Scale: schema merge is a footer-only planning step;
    the scan stays splittable and linear.
    """
    docs = _docs(spark, sf_dir).select("doc_id")
    d = tempfile.mkdtemp(prefix="ids-evolve-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    b1 = docs.filter(F.col("doc_id") % EVOLVE_SPLIT_MOD == 0).select(
        F.col("doc_id").alias("id"),
        ((F.col("doc_id") * 7) % 1000).cast("int").alias("amount"),
    )
    b2 = docs.filter(F.col("doc_id") % EVOLVE_SPLIT_MOD != 0).select(
        F.col("doc_id").alias("id"),
        ((F.col("doc_id") * 7) % 1000).cast("int").alias("amount"),
        (F.col("doc_id") % 5).cast("int").alias("priority"),
    )
    b1.write.mode("overwrite").parquet(os.path.join(d, "batch=1"))
    b2.write.mode("overwrite").parquet(os.path.join(d, "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(d, "batch=1"), os.path.join(d, "batch=2")
    )
    batch = F.when(F.col("id") % EVOLVE_SPLIT_MOD == 0, 1).otherwise(2)
    return (
        merged.groupBy(batch.cast("int").alias("batch"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("amount").cast("long").alias("sum_amount"),
            F.sum(F.col("priority").isNull().cast("long")).alias(
                "n_priority_null"
            ),
            F.sum(F.coalesce("priority", F.lit(0)))
            .cast("long")
            .alias("sum_priority"),
        )
    )


QUERIES = {
    "csv_quarantine_stats": csv_quarantine_stats,
    "schema_evolution_stats": schema_evolution_stats,
}

_KIND = f"""
    CASE WHEN doc_id % {BAD_MOD} = {BAD_REM} THEN 'bad'
         WHEN doc_id % {EXTRA_MOD} = {EXTRA_REM} THEN 'extra'
         WHEN doc_id % {SHORT_MOD} = {SHORT_REM} THEN 'short'
         WHEN doc_id % {EMPTY_MOD} = {EMPTY_REM} THEN 'empty'
         ELSE 'clean' END
"""

_CTY = (
    f"list_extract({'[' + ','.join(repr(c) for c in COUNTIES) + ']'},"
    f" CAST(doc_id % {len(COUNTIES)} AS INT) + 1)"
)

ORACLE_SQL = {
    # arithmetic replay of the two-batch generation: batch-1 rows
    # predate the column, so every one is NULL in the merged view
    "schema_evolution_stats": f"""
        WITH r AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {EVOLVE_SPLIT_MOD} = 0
                        THEN 1 ELSE 2 END AS batch,
                   CAST((doc_id * 7) % 1000 AS INT) AS amount,
                   CASE WHEN doc_id % {EVOLVE_SPLIT_MOD} = 0 THEN NULL
                        ELSE CAST(doc_id % 5 AS INT) END AS priority
            FROM documents
        )
        SELECT batch,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(amount) AS BIGINT) AS sum_amount,
               CAST(sum(CASE WHEN priority IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_priority_null,
               CAST(sum(coalesce(priority, 0)) AS BIGINT) AS sum_priority
        FROM r GROUP BY 1
    """,
    # arithmetic replay of the generation + the probed PERMISSIVE
    # classification: bad/extra/short rows are corrupt, empty is not;
    # amount is NULL for bad/empty, county NULL for short
    "csv_quarantine_stats": f"""
        WITH r AS (
            SELECT doc_id, {_KIND} AS kind,
                   CAST((doc_id * 7) % 1000 AS INT) AS amt,
                   {_CTY} AS cty
            FROM documents
        ),
        rows_t AS (
            SELECT doc_id,
                   CASE WHEN kind = 'short' THEN '(none)' ELSE cty END
                       AS county,
                   CASE WHEN kind IN ('bad', 'extra', 'short')
                        THEN 1 ELSE 0 END AS corrupt,
                   CASE WHEN kind IN ('bad', 'empty')
                        THEN NULL ELSE amt END AS amount
            FROM r
        )
        SELECT county,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(doc_id) AS BIGINT) AS sum_id,
               CAST(sum(corrupt) AS BIGINT) AS n_corrupt,
               CAST(sum(CASE WHEN amount IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_amount_null,
               CAST(sum(coalesce(amount, 0)) AS BIGINT) AS sum_amount
        FROM rows_t GROUP BY 1
    """,
}
