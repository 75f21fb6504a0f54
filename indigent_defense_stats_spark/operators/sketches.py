"""Count-min-sketch heavy hitters over the ``documents`` token stream.

:func:`cms_heavy_hitters` — the frequent-items primitive a corpus
pipeline runs before building stopword lists, boilerplate filters, or
tokenizer vocabularies (the reference's charge-name frequency scan,
SURVEY.md §2 A2/P13 family, generalized to corpus scale): find every
token whose count is at least ``N / HH_DEN`` of the corpus total, and
probe each one against a count-min sketch (Cormode & Muthukrishnan,
J. Algorithms 2005) built over the same stream.

Why a sketch at 100 TB: the exact per-token aggregate is linear and
map-side-combinable, but its output is vocabulary-sized — fine to
SHUFFLE, too big to BROADCAST, impossible to keep per-stream in a
streaming/merge setting.  The CMS is the fixed-memory mergeable
summary (``CMS_D x CMS_W`` cells = 1,024 longs here): cell arrays
from independent waves/partitions ADD, so at production scale each
crawl wave maintains its own sketch and the coordinator folds them —
the same mergeability contract as the HLL cardinality sketch
(operators/relational.py ``approx_count_distinct`` pin).

Engine shape: exact token counts (one linear shuffle, map-side
combine) feed BOTH the heavy-hitter filter and the sketch build —
building cells from (token, cnt) instead of re-exploding the corpus
makes the sketch a vocabulary-sized aggregate, and the probe join
broadcasts the 1,024-cell table.  Total-count ``N`` is a single row
broadcast back via crossJoin (bounded, same idiom as
relational.stats_orders).

Correctness contract (oracle-checked, not just "looks plausible"):
``cnt <= cms_est`` always (every occurrence lands in every row's
cell), and the DuckDB oracle replays the ENTIRE sketch — hash family,
cell sums, min-over-rows probe — so the estimates match bit for bit.
A pytest additionally bounds the overestimate by the CMS epsilon
(e*N/CMS_W per row, so the min is within that w.h.p.).

Hash family: the portable 60-bit md5 integer (textstats.md5_int) of
``"<row>:<token>"`` mod ``CMS_W`` — cross-engine by construction; no
engine-private hash (Spark xxhash64 / DuckDB hash) can appear in an
oracle-checked query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .textstats import _docs, _tokens, md5_int

CMS_D = 4  # hash rows
CMS_W = 256  # cells per row
HH_DEN = 500  # heavy hitter: cnt * HH_DEN >= total tokens


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _bucket(row: F.Column, token: F.Column) -> F.Column:
    return md5_int(F.concat(row.cast("string"), F.lit(":"), token)) % CMS_W


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, cnt, cms_est) for every token with
    ``cnt * HH_DEN >= N``; ``cms_est`` = min over the CMS_D sketch
    rows of the cell the token hashes to."""
    tc = _token_counts(spark, sf_dir)
    rows = F.explode(F.array(*[F.lit(d) for d in range(CMS_D)])).alias("d")
    # sketch build: vocabulary-sized input -> CMS_D*CMS_W cells
    cells = (
        tc.select(rows, "token", "cnt")
        .select("d", _bucket(F.col("d"), F.col("token")).alias("bucket"), "cnt")
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cell"))
    )
    total = tc.agg(F.sum("cnt").alias("n"))
    hh = tc.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") * HH_DEN >= F.col("n")
    )
    probe = hh.select(
        "token", "cnt", rows
    ).withColumn("bucket", _bucket(F.col("d"), F.col("token")))
    return (
        probe.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("token", "cnt")
        .agg(F.min("cell").cast("long").alias("cms_est"))
    )


QUERIES = {"cms_heavy_hitters": cms_heavy_hitters}

_SQL_TOKENS = "string_split(lower(text), ' ')"
_MD5 = "('0x' || left(md5({0}), 15))::BIGINT"

ORACLE_SQL = {
    "cms_heavy_hitters": f"""
        WITH tc AS (
            SELECT t.tok AS token, count(*)::BIGINT AS cnt
            FROM documents, unnest({_SQL_TOKENS}) AS t(tok)
            GROUP BY 1
        ),
        tot AS (SELECT sum(cnt)::BIGINT AS n FROM tc),
        rows_d AS (SELECT unnest(range({CMS_D})) AS d),
        cells AS (
            SELECT d,
                   {_MD5.format("d::VARCHAR || ':' || token")} % {CMS_W}
                       AS bucket,
                   sum(cnt)::BIGINT AS cell
            FROM tc CROSS JOIN rows_d
            GROUP BY 1, 2
        ),
        hh AS (
            SELECT token, cnt FROM tc CROSS JOIN tot
            WHERE cnt * {HH_DEN} >= tot.n
        ),
        probe AS (
            SELECT token, cnt, d,
                   {_MD5.format("d::VARCHAR || ':' || token")} % {CMS_W}
                       AS bucket
            FROM hh CROSS JOIN rows_d
        )
        SELECT p.token, p.cnt, CAST(min(c.cell) AS BIGINT) AS cms_est
        FROM probe p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
        GROUP BY 1, 2
    """,
}
