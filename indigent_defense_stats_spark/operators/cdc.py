"""Content-defined chunking (CDC) — shift-robust duplicate-text
detection over the documents corpus.

Fixed-stride chunk dedup (decontam.py cross_doc_chunk_dup, the
line-keyed line_dedup) breaks when a duplicate region is SHIFTED: one
inserted byte moves every downstream chunk boundary, so a scraped
page that prepends a banner to an otherwise-identical article shares
zero fixed-stride chunks with the original.  CDC places boundaries
where a rolling hash of the LAST ``W`` characters hits a residue
class, so boundaries are a function of local content, not position —
after an insertion the boundary stream resynchronizes within ~one
chunk and the remaining chunks hash identically (LBFS, Muthitacharoen
et al. SOSP'01; FastCDC, Xia et al. ATC'16).  For a training-data
pipeline this is the primitive that catches boilerplate-wrapped
article mirrors that both exact dedup and stride chunking miss; for
the crawler it complements the DUST/mirror channels (dust.py,
dedup.py mirror_hosts) at sub-document granularity.

Kernel (pure JVM expressions — deterministic, no Python in the path):

- per char ``c``: gear value ``g = (ascii(c) * 2654435761) mod 2^20``
  (Knuth multiplicative hash; the classic gear table, arithmetic
  instead of a lookup so both engines replay it bit-for-bit)
- position ``i`` (1-based, ``i >= W``) is a boundary iff
  ``(sum_{j<W} g[i-j] * B^j mod M) mod D == 0`` with ``W=8, B=31,
  M=2^20, D=64`` -> expected chunk length D chars
- the final position is always a boundary; chunks are the spans
  between consecutive boundaries; a doc shorter than ``W`` is one
  chunk

The windowed hash is evaluated per position as an 8-term dot product
against the materialized gear array (a projection boundary binds the
array first — an INLINE split re-evaluates per lambda element and
turns O(W·n) into O(n^2), the measured 9x regression documented in
BENCH/NOTES.md for the bigram scorer).  Production kernels add
min/max chunk clamps, which reintroduce a sequential dependency and
belong in a mapInPandas kernel; the unclamped form stays
whole-stage-codegen friendly and is what the oracle certifies.

Scale shape (100 TB): boundary detection + chunking is a pure map
(zero shuffle); duplicate accounting is one chunk-hash-keyed linear
shuffle plus a broadcast-sized df join — identical to the
cross_doc_chunk_dup plan, with AQE splitting boilerplate-hash skew.
Nothing is quadratic in corpus size.

Synthetic shift channel (deterministic): every ``doc_id % 20 == 3``
document also appears as ``doc_id + 100000`` with a 3-char banner
(``'zq '``) prepended.  Fixed-stride chunking scores ~0 overlap for
these pairs; CDC recovers most duplicated characters — the pytest
pins both halves of that claim (vs a brute-force Python mirror and a
stride baseline).

The DuckDB oracle replays gear values, the 8-term window hash, span
assembly (lag window), and df accounting row-by-row, so equality
certifies the whole kernel including boundary arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

W = 8  # rolling window (chars)
B = 31  # polynomial base
M = 1 << 20  # hash modulus (gear values < M; 8-term dot < 2^45)
D = 64  # boundary divisor -> expected chunk length
_MUL = 2654435761  # Knuth multiplicative constant
_BJ = [pow(B, j, M) for j in range(W)]  # B^j mod M, j = 0..W-1
_SHIFT_BANNER = "zq "


def _with_shift_channel(docs: DataFrame) -> DataFrame:
    """documents ∪ banner-prepended copies of every 20th doc."""
    shifted = docs.filter(F.col("doc_id") % 20 == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit(_SHIFT_BANNER), F.col("text")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(shifted)


def _gear(c: Column) -> Column:
    return (c.cast("long") * _MUL) % M


def chunk_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> exploded (doc_id, chunk) rows; map-only."""
    g = F.transform(F.split(F.col("text"), ""), lambda c: _gear(F.ascii(c)))
    bound = docs.withColumn("g", g)  # projection boundary: bind the array
    n = F.size(F.col("g"))
    # positions are computed against the bound g column via a lambda
    # variable i; sequence(W, n) guarded (Spark sequences descend when
    # start > stop)
    bounds = F.when(
        n >= W,
        F.filter(
            F.sequence(F.lit(W), n),
            lambda i: (
                sum(
                    (F.element_at(F.col("g"), i - j) * bj)
                    for j, bj in enumerate(_BJ)
                )
                % M
            )
            % D
            == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    allb = F.array_distinct(F.concat(bounds, F.array(n)))
    spans = bound.withColumn("b", allb).select(
        "doc_id",
        "text",
        F.explode(
            F.zip_with(
                F.concat(F.array(F.lit(0)), F.slice(F.col("b"), 1, F.size(F.col("b")) - 1)),
                F.col("b"),
                lambda s, e: F.struct(s.alias("s"), e.alias("e")),
            )
        ).alias("span"),
    )
    return spans.select(
        "doc_id",
        F.substr(
            F.col("text"), F.col("span.s") + 1, F.col("span.e") - F.col("span.s")
        ).alias("chunk"),
    )


def cdc_dup_stats(docs: DataFrame) -> DataFrame:
    """Per-doc duplicate accounting over CDC chunks: a chunk is dup
    when its hash occurs in >= 2 distinct docs."""
    hashes = chunk_spans(docs).select(
        "doc_id", F.md5(F.col("chunk")).alias("h"), F.length("chunk").alias("len")
    ).localCheckpoint(eager=False)
    df_tab = hashes.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df")
    )
    dup = F.col("df") > 1
    return (
        hashes.join(df_tab, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(dup, 1).otherwise(0)).cast("long").alias("dup_chunks"),
            F.sum(F.when(dup, F.col("len")).otherwise(0))
            .cast("long")
            .alias("dup_chars"),
            F.sum("len").cast("long").alias("total_chars"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "dup_chunks",
            "dup_chars",
            "total_chars",
            (
                F.col("dup_chars").cast("double")
                / F.col("total_chars").cast("double")
            ).alias("dup_char_frac"),
        )
    )


def cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cdc_dup_stats(_with_shift_channel(docs)).orderBy("doc_id")


def _win_terms() -> str:
    return " + ".join(f"g[i - {j}] * {bj}" for j, bj in enumerate(_BJ))


_ORACLE = f"""
    WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, '{_SHIFT_BANNER}' || text
        FROM documents WHERE doc_id % 20 = 3
    ), garr AS (
        SELECT doc_id, text, length(text) AS n,
               list_transform(string_split(text, ''),
                              c -> (ord(c) * {_MUL}) % {M}) AS g
        FROM src
    ), bounds AS (
        SELECT doc_id, CAST(t.i AS BIGINT) AS i
        FROM garr, unnest(range(8, n + 1)) t(i)
        WHERE (({_win_terms()}) % {M}) % {D} = 0
    ), allb AS (
        SELECT DISTINCT doc_id, i FROM (
            SELECT doc_id, i FROM bounds
            UNION ALL
            SELECT doc_id, CAST(n AS BIGINT) FROM garr
        )
    ), spans AS (
        SELECT doc_id, i AS e,
               lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS s
        FROM allb
    ), chunk_rows AS (
        SELECT c.doc_id, md5(substr(g.text, CAST(c.s + 1 AS INT),
                                    CAST(c.e - c.s AS INT))) AS h,
               c.e - c.s AS len
        FROM spans c JOIN garr g ON g.doc_id = c.doc_id
    ), df_tab AS (
        SELECT h, count(DISTINCT doc_id) AS df FROM chunk_rows GROUP BY h
    )
    SELECT r.doc_id,
           CAST(count(*) AS BIGINT)                                 AS n_chunks,
           CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)  AS dup_chunks,
           CAST(sum(CASE WHEN df > 1 THEN len ELSE 0 END) AS BIGINT) AS dup_chars,
           CAST(sum(len) AS BIGINT)                                 AS total_chars,
           CAST(sum(CASE WHEN df > 1 THEN len ELSE 0 END) AS DOUBLE)
               / CAST(sum(len) AS DOUBLE)                           AS dup_char_frac
    FROM chunk_rows r JOIN df_tab USING (h)
    GROUP BY r.doc_id
    ORDER BY r.doc_id
"""

QUERIES = {
    "cdc_chunk_stats": cdc_chunk_stats,
}

ORACLE_SQL = {
    "cdc_chunk_stats": _ORACLE,
}
