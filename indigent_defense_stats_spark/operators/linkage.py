"""Fuzzy record linkage: blocked edit-distance matching of person
names — the dedup family the exact-hash and shingle operators cannot
cover (typos, OCR noise, transcription variants).

The reference's cleaner canonicalizes charge names by exact mapping
(J1 family, operators/clean.py); real court data also needs the
APPROXIMATE side: 'Maria Garcia' vs 'Maria Garcai' is one defendant.
The standard shape (Fellegi-Sunter record linkage, blocking from
Hernandez & Stolfo SIGMOD'95 merge/purge):

1. BLOCK: never compare all pairs — group candidates by a cheap key
   (here: first letter of the lowercase name; production stacks
   several passes — phonetic keys, sorted-neighborhood windows — to
   recover matches whose typo corrupts one key).
2. MATCH within blocks with an edit-distance threshold.

``levenshtein`` is a built-in in BOTH engines with identical unit-
cost semantics (verified: same values including empty-string edges),
so the whole operator is exact integer arithmetic — no float, no UDF.

Name universe: arithmetic in doc_id over first/last-name arrays, with
a deterministic single-character DELETION injected into every 5th
name (position also arithmetic) — so true fuzzy pairs exist by
construction and the DuckDB oracle replays every typo.

Scale shape: one map-side projection -> self-join keyed on the block
(shuffle linear in corpus size; block sizes bounded by name-frequency
skew, the hot-block analog of hot shingles — AQE skew-split applies)
-> integer filter.  No all-pairs anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..functions.fixtures import pick_lit as _pick
from ..functions.fixtures import sql_list_lit as _sql_lit
from .textstats import _docs

FIRSTS = ["maria", "jose", "james", "linda", "robert", "ana", "david", "sofia"]
LASTS = ["garcia", "smith", "johnson", "martinez", "brown", "lopez", "davis", "wilson"]
TYPO_MOD = 5  # every 5th row gets a one-char deletion
LEV_MAX = 2  # match threshold


def synth_name() -> Column:
    """first + ' ' + last, with a deterministic one-char deletion on
    rows where doc_id % TYPO_MOD == TYPO_MOD-1 (position
    doc_id % (len-2) + 2: never the first char, so blocking holds)."""
    d = F.col("doc_id")
    base = F.concat_ws(
        " ",
        _pick(FIRSTS, d % len(FIRSTS)),
        _pick(LASTS, F.expr(f"doc_id div {len(FIRSTS)}") % len(LASTS)),
    )
    p = (d % (F.length(base) - 2)) + 2
    typo = F.concat(
        F.substring(base, 1, p - 1),
        F.substring(base, (p + 1).cast("int"), F.lit(2**30)),
    )
    return F.when(d % TYPO_MOD == TYPO_MOD - 1, typo).otherwise(base)


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(block, name1, name2, lev, n1, n2): DISTINCT name variants that
    block together and sit within LEV_MAX edits, with each variant's
    occurrence count — the merge/purge candidate table a cleaner
    reviews.  Identical names are exact duplicates (the hash dedup's
    job), so only lev >= 1 pairs appear."""
    names = (
        _docs(spark, sf_dir)
        .select(synth_name().alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("block", F.substring("name", 1, 1))
        .localCheckpoint(eager=False)
    )
    a = names.select(
        "block", F.col("name").alias("name1"), F.col("n").alias("n1")
    )
    b = names.select(
        "block", F.col("name").alias("name2"), F.col("n").alias("n2")
    )
    lev = F.levenshtein("name1", "name2")
    return (
        a.join(b, "block")
        .filter(F.col("name1") < F.col("name2"))
        .filter(lev <= LEV_MAX)
        .select("block", "name1", "name2", lev.alias("lev"), "n1", "n2")
    )


QUERIES = {
    "fuzzy_name_pairs": fuzzy_name_pairs,
}


_NAME_SQL = f"""
    CASE WHEN doc_id % {TYPO_MOD} = {TYPO_MOD - 1} THEN
        substr(base, 1, CAST(doc_id % (len(base) - 2) + 1 AS INT))
        || substr(base, CAST(doc_id % (len(base) - 2) + 3 AS INT))
    ELSE base END
"""

ORACLE_SQL = {
    "fuzzy_name_pairs": f"""
        WITH b0 AS (
            SELECT doc_id,
                   list_extract({_sql_lit(FIRSTS)},
                                CAST(doc_id % {len(FIRSTS)} AS INT) + 1)
                   || ' ' ||
                   list_extract({_sql_lit(LASTS)},
                                CAST((doc_id // {len(FIRSTS)})
                                     % {len(LASTS)} AS INT) + 1) AS base
            FROM documents
        ),
        names AS (
            SELECT {_NAME_SQL} AS name, CAST(count(*) AS BIGINT) AS n
            FROM b0 GROUP BY 1
        ),
        blocked AS (
            SELECT substr(name, 1, 1) AS block, name, n FROM names
        )
        SELECT a.block, a.name AS name1, b.name AS name2,
               CAST(levenshtein(a.name, b.name) AS INT) AS lev,
               a.n AS n1, b.n AS n2
        FROM blocked a JOIN blocked b
          ON a.block = b.block AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= {LEV_MAX}
    """,
}
