"""Unicode canonical normalization (NFC) over the corpus — the text
hygiene pass every multilingual pretraining pipeline runs BEFORE
dedup and hashing: 'cafe'+COMBINING ACUTE and the precomposed 'café'
are THE SAME text, but md5/minhash/shingles treat them as different
documents, silently deflating duplicate detection and splitting
counts (CCNet normalizes before hashing for exactly this reason).

Spark SQL has NO Unicode-normalization builtin, so this is one of the
declared Python boundaries (like the fetch loop and the HTML parse
assemblers): an Arrow-batched ``mapInPandas`` over ``unicodedata``
(the stdlib's UAX #15 implementation).  Production swaps the batch
body for ICU Normalizer2 behind the same schema; the oracle
cross-checks against an INDEPENDENT implementation — DuckDB's
utf8proc ``nfc_normalize`` — so agreement is two codebases
implementing the same Unicode standard, not a replay.

The text universe is arithmetic in doc_id over a variant table that
exercises the interesting NFC behaviors: decomposed vs precomposed
accents, the U+212B ANGSTROM SIGN singleton (NFC maps it to U+00C5),
multi-combining-mark composition/ordering, and ligatures (which NFC
must NOT touch — that is NFKC's job).

Scale shape: map-only (one Arrow batch pass), zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.fixtures import sql_list_lit as _sql_lit
from .textstats import _docs

# explicit escape sequences: an editor or transport layer that
# silently NFC-normalizes source text must not be able to collapse
# the decomposed fixtures
NFC_VARIANTS = [
    "cafe\u0301",              # decomposed -> composes to caf\u00e9
    "caf\u00e9",               # already NFC
    "A\u030aberg",             # A + COMBINING RING -> \u00c5berg
    "\u212bngstr\u00f6m",     # ANGSTROM SIGN singleton -> U+00C5
    "plain ascii",              # unchanged
    "x\u0327\u0301y",         # two combining marks on one base
    "e\u0327\u0301z",         # partial composition (cedilla+acute)
    "of\ufb01ce",              # fi ligature: NFC must NOT decompose
]

NFC_SCHEMA = (
    "doc_id long, n_cp_before int, n_cp_after int,"
    " changed boolean, text_nfc string"
)


def synth_uni_text() -> F.Column:
    arr = F.array(*[F.lit(v) for v in NFC_VARIANTS])
    return F.concat(
        F.lit("doc "),
        F.col("doc_id").cast("string"),
        F.lit(" "),
        F.element_at(arr, (F.col("doc_id") % len(NFC_VARIANTS)).cast("int") + 1),
    )


def nfc_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_cp_before, n_cp_after, changed, text_nfc)."""

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata

        for pdf in batches:
            if not len(pdf):
                continue
            out = [unicodedata.normalize("NFC", t) for t in pdf["t"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_cp_before": [len(t) for t in pdf["t"]],
                    "n_cp_after": [len(t) for t in out],
                    "changed": [a != b for a, b in zip(pdf["t"], out)],
                    "text_nfc": out,
                }
            )

    d = _docs(spark, sf_dir).select("doc_id", synth_uni_text().alias("t"))
    return d.mapInPandas(norm, schema=NFC_SCHEMA)


QUERIES = {
    "nfc_normalize_docs": nfc_normalize_docs,
}


ORACLE_SQL = {
    # independent implementation: DuckDB's utf8proc vs the engine's
    # stdlib unicodedata — both UAX #15 NFC
    "nfc_normalize_docs": f"""
        WITH d AS (
            SELECT doc_id,
                   'doc ' || doc_id::VARCHAR || ' '
                   || list_extract({_sql_lit(NFC_VARIANTS)},
                                   CAST(doc_id % {len(NFC_VARIANTS)} AS INT)
                                   + 1) AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(length(t) AS INT) AS n_cp_before,
               CAST(length(nfc_normalize(t)) AS INT) AS n_cp_after,
               nfc_normalize(t) <> t AS changed,
               nfc_normalize(t) AS text_nfc
        FROM d
    """,
}
