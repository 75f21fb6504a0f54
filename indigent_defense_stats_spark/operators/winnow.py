"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm) over the ``documents`` table.

Reference analog: the scraper's per-page content hash
(src/parser/__init__.py's xxh64 over the whole HTML body) detects only
EXACT re-fetches.  Winnowing is the standard next step a web corpus
takes: select a guaranteed-density subset of k-gram hashes so that any
two documents sharing a token run of at least W + K − 1 tokens share at
least one selected fingerprint — partial-overlap detection (quotes,
mirrored fragments, boilerplate reuse) with an index a fraction of the
n-gram table's size.

Algorithm, exactly the paper's:
- k-gram hashes ``g_i = h(tokens[i .. i+K-1])`` (portable md5-derived
  60-bit integer, mod p — the repo-wide cross-engine hash discipline);
- every window of W consecutive k-gram hashes contributes its MINIMUM
  value.  The paper breaks positional ties rightmost, but ties only
  affect which POSITION is recorded, never which VALUE — and matching
  uses the distinct value set, so the value-set formulation needs no
  tiebreak at all and is engine-order-free by construction.
- guarantee: any shared token run of length ≥ W + K − 1 spans a full
  window in both documents, and both select the same minimum hash →
  at least one shared fingerprint (pinned by pytest).

Scale shape (100 TB corpus):
- fingerprint construction is map-only (tokens → grams → window minima
  as nested higher-order functions, zero Python, zero shuffle);
- selection density is 2/(W+1) per the paper, so the posting table is
  ~(2/(W+1))·(tokens) rows — one linear shuffle to group by
  fingerprint;
- the pair join is the inverted-index shape: postings self-joined per
  fingerprint, Σ df² bounded by the MAXDF boilerplate cap (the same
  discipline as the PPJoin/LSH siblings in operators/dedup.py) — drop
  fingerprints appearing in more than MAXDF documents (a fingerprint
  that common is boilerplate, not plagiarism signal) so the join is
  linear in the posting table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .textstats import MOD, md5_int

K = 4  # k-gram length (tokens)
W = 5  # winnowing window (k-grams); guarantee threshold = W + K - 1
MAXDF = 50  # boilerplate cap: drop fingerprints in more docs than this
MIN_SHARED = 2  # report pairs sharing at least this many fingerprints


def _fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — the distinct winnowing fingerprint values per
    document.  Map-only: grams and window minima are higher-order
    array functions over the token array."""
    toks = F.split(F.lower(F.col("text")), " ")
    m = F.size(toks)
    grams = F.when(
        m >= K,
        F.transform(
            F.sequence(F.lit(1), m - K + 1),
            lambda i: md5_int(F.concat_ws(" ", F.slice(toks, i, K))) % MOD,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g = docs.select("doc_id", grams.alias("g"))
    fps = F.when(
        F.size("g") >= W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("g") - W + 1),
                lambda j: F.array_min(F.slice(F.col("g"), j, W)),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return g.select("doc_id", F.explode(fps).alias("fp"))


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fingerprint accounting: how many k-gram windows a
    doc has, how many distinct fingerprints winnowing selected, and the
    min/max selected value — the density audit (expected selected ≈
    2/(W+1) of the gram count on random text)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = _fingerprints(docs)
    return (
        fp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


def winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing ≥ MIN_SHARED winnowing fingerprints
    (each rarer than the MAXDF boilerplate cap) — the MOSS overlap
    report.  One linear shuffle to build postings, one Σdf²-capped
    inverted-index self-join."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = _fingerprints(docs).localCheckpoint(eager=False)
    keep = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= MAXDF))
        .select("fp")
    )
    p = fp.join(keep, "fp")
    a = p.select(F.col("fp").alias("f"), F.col("doc_id").alias("doc_a"))
    b = p.select(F.col("fp").alias("f"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, (a["f"] == b["f"]) & (a["doc_a"] < b["doc_b"]))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )


QUERIES = {
    "winnow_fingerprints": winnow_fingerprints,
    "winnow_matches": winnow_matches,
}

_SQL_FP = f"""
    t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks,
               len(string_split(lower(text), ' ')) AS m
        FROM documents
    ),
    garr AS (
        SELECT doc_id,
               CASE WHEN m >= {K} THEN
                   list_transform(range(1, m - {K} + 2),
                       i -> ('0x' || left(md5(array_to_string(
                                toks[i:i+{K}-1], ' ')), 15))::BIGINT % {MOD})
               ELSE CAST([] AS BIGINT[]) END AS g
        FROM t
    ),
    fp AS (
        SELECT DISTINCT doc_id, CAST(f AS BIGINT) AS fp FROM (
            SELECT doc_id, unnest(
                CASE WHEN len(g) >= {W} THEN
                    list_transform(range(1, len(g) - {W} + 2),
                                   j -> list_min(g[j:j+{W}-1]))
                ELSE CAST([] AS BIGINT[]) END) AS f
            FROM garr)
    )
"""

ORACLE_SQL = {
    "winnow_fingerprints": f"""
        WITH {_SQL_FP}
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
               CAST(min(fp) AS BIGINT) AS min_fp,
               CAST(max(fp) AS BIGINT) AS max_fp
        FROM fp GROUP BY doc_id ORDER BY doc_id
    """,
    "winnow_matches": f"""
        WITH {_SQL_FP},
        keep AS (
            SELECT fp FROM fp GROUP BY fp
            HAVING count(*) >= 2 AND count(*) <= {MAXDF}
        ),
        p AS (SELECT doc_id, fp FROM fp JOIN keep USING (fp))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared_fp
        FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_SHARED}
        ORDER BY doc_a, doc_b
    """,
}
