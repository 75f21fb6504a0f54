"""Model-based quality filtering: a hashed-n-gram linear classifier
over ``documents`` (training-data layer).

The modern pretraining pipeline filters documents with a cheap linear
text classifier — fastText-style (Joulin et al., EACL 2017) as used by
CCNet/LLaMA's Wikipedia-reference filter, DCLM's fastText quality
model, and FineWeb-Edu's educational-quality scorer.  The engine shape
is what matters at 100 TB: features are unigram+bigram counts mapped
into a fixed bucket space by the HASHING TRICK (Weinberger et al.,
ICML 2009), so the model is a dense weight vector of B floats that
ships to every executor as a handful of literals — no vocabulary join,
no shuffle, the whole filter is a map-only projection over the corpus
scan (the same zero-shuffle contract as textstats/decontam).

This module is the rule-based charge classifier of the reference
(the J1 charge->level containment map, see relational.py:320 family)
upgraded to the learned-model form: score = w . phi(text) + b with
phi a hashed bag of n-grams.

Weights here are a deterministic FIXTURE derived from the bucket
index by a closed-form integer mix (Knuth's multiplicative constant
2654435761, public domain), in integer MICRO-UNITS — the module is
the model-serving integration point, not a training claim: production
swaps ``_w_micro`` for a broadcast array loaded from a trained
fastText/logistic model.  Keeping weights integral makes every score
an exact BIGINT sum (associative, order-independent, bit-identical in
Spark and DuckDB); the only float op is ONE division for the per-
feature average — the same cross-engine float discipline as
sketches.hll_distinct.

Scale notes: zero shuffle (per-document HOF expressions only), filter
and projection push to the parquet scan; at 10^9 documents the plan
is embarrassingly parallel and the weight vector is O(B) bytes
regardless of corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from .textstats import _docs, md5_int

CLF_B = 4096  # hashed feature buckets
_MIX = 2654435761  # Knuth multiplicative hash constant
_WMOD = 2001  # weights span [-1000, +1000] micro-units
_BIAS_MICRO = -25  # model intercept, micro-units


def _w_micro(bucket: Column) -> Column:
    """Closed-form fixture weight for a bucket, in micro-units.
    Integer-only: (bucket * MIX mod 2^31) mod 2001 - 1000."""
    return (
        (bucket * F.lit(_MIX).cast("long")) % F.lit(2**31).cast("long")
    ) % F.lit(_WMOD).cast("long") - F.lit((_WMOD - 1) // 2).cast("long")


def _bucket_u(tok: Column) -> Column:
    return md5_int(F.concat(F.lit("u:"), tok)) % CLF_B


def _bucket_b(pair: Column) -> Column:
    return md5_int(F.concat(F.lit("b:"), pair)) % CLF_B


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_feats, score_micro, avg_micro, keep): hashed
    unigram+bigram linear score per document; ``keep`` is the filter
    decision (score + bias > 0) a clean-corpus composition would
    apply, exactly like decontam.clean_corpus applies the Gopher
    thresholds.

    The bigram list is built JVM-side with zip_with over two slices
    (no posexplode, no Python); both n-gram channels are hashed with
    a namespace prefix ('u:'/'b:') so unigram and bigram features
    occupy the same B-bucket space without colliding by construction.
    """
    t = F.split(F.lower(F.col("text")), " ")
    n = F.size(t)
    # slice lengths are >= 0 for every input: split('') -> [''] so n>=1
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    uni_w = F.transform(t, lambda x: _w_micro(_bucket_u(x)))
    big_w = F.transform(bigrams, lambda p: _w_micro(_bucket_b(p)))
    zero = F.lit(0).cast("long")
    score = (
        F.aggregate(uni_w, zero, lambda a, x: a + x)
        + F.aggregate(big_w, zero, lambda a, x: a + x)
        + F.lit(_BIAS_MICRO).cast("long")
    )
    n_feats = (n + F.size(bigrams)).cast("int")
    scored = _docs(spark, sf_dir).select(
        "doc_id",
        n_feats.alias("n_feats"),
        score.alias("score_micro"),
    )
    return scored.select(
        "doc_id",
        "n_feats",
        "score_micro",
        F.round(F.col("score_micro") * 1.0 / F.col("n_feats"), 6).alias(
            "avg_micro"
        ),
        (F.col("score_micro") > 0).alias("keep"),
    )


QUERIES = {
    "quality_classifier_score": quality_classifier_score,
}

_MD5 = "('0x' || left(md5({0}), 15))::BIGINT"
_W_SQL = (
    "(((({b}) * 2654435761) % 2147483648) % "
    f"{_WMOD} - {(_WMOD - 1) // 2})"
)

ORACLE_SQL = {
    # independent replay: features via unnest (row form) instead of the
    # engine's array HOFs; integer sums are order-independent so the
    # per-doc aggregate matches bit for bit, and the single IEEE
    # division runs on identical exact operands in both engines
    "quality_classifier_score": f"""
        WITH t AS (
            SELECT doc_id, string_split(lower(text), ' ') AS ts
            FROM documents
        ),
        uni AS (
            SELECT doc_id,
                   {_W_SQL.format(b=_MD5.format("'u:' || u.tok") + f" % {CLF_B}")}
                       AS w
            FROM t, unnest(ts) AS u(tok)
        ),
        big AS (
            SELECT doc_id,
                   {_W_SQL.format(
                       b=_MD5.format("'b:' || ts[g.i] || '_' || ts[g.i + 1]")
                       + f" % {CLF_B}"
                   )} AS w
            FROM t, unnest(generate_series(1, len(ts) - 1)) AS g(i)
        ),
        allw AS (
            SELECT doc_id, w FROM uni UNION ALL SELECT doc_id, w FROM big
        )
        SELECT doc_id,
               CAST(count(*) AS INT) AS n_feats,
               CAST(sum(w) + {_BIAS_MICRO} AS BIGINT) AS score_micro,
               round((CAST(sum(w) + {_BIAS_MICRO} AS BIGINT)) * 1.0
                     / count(*), 6) AS avg_micro,
               CAST(sum(w) + {_BIAS_MICRO} AS BIGINT) > 0 AS keep
        FROM allw GROUP BY doc_id
    """,
}
