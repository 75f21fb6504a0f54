"""Relevance scoring over the ``documents`` table (training-data
layer): TF-IDF term ranking and BM25 retrieval — the standard
corpus-statistics ops a data-curation pipeline needs for keyword-based
quality filtering, boilerplate detection and search-style sampling.

- :func:`tfidf_topk` — top-``TFIDF_TOP_K`` terms per document by
  smoothed TF-IDF (sklearn's ``idf = ln((1+N)/(1+df)) + 1``).
  Shape: one explode -> per-(doc, term) count (partial+final hash
  aggregate, shuffles one long per distinct doc-term) -> document
  frequency (same, one long per distinct term) -> join tf⋈df on term.
  The df side is VOCABULARY-sized — orders of magnitude smaller than
  the corpus; at 100 TB you bucket both sides by term (or broadcast
  the head of the vocabulary and shuffle only the long tail) and let
  AQE split the stopword-term skew.  The final per-doc top-k is a
  window over doc_id — keys are dense and unskewed by construction
  (≤ |vocab(doc)| rows per key).

- :func:`bm25_search` — Okapi BM25 (k1=1.2, b=0.75, Robertson
  ``idf = ln(1 + (N-df+0.5)/(df+0.5))``) of every document against a
  FIXED query-term list.  Shape: per-term tf via ``size(filter(...))``
  on the bound token array (pure map, zero shuffle), ONE single-row
  corpus-stats aggregate (N, Σdl, per-term df — partial+final), then
  a broadcast (1-row) join back and a map-side score.  This is
  exactly the 100 TB shape: the corpus is scanned twice, all heavy
  work is map-side, and the only wide exchange is the final top-k
  (``orderBy().limit()`` = partial per-partition top-k + single
  reduce).

Determinism contract (driver hash gate): every float fed to a
comparison or an output column derives from exact integers via a
fixed arithmetic sequence — integer sums (never float ``avg``),
fixed-order additions (``c0+c1+c2+c3``, never a float ``sum()``
aggregate whose combine order floats), and ordering on the ROUNDED
score with an integer-key tiebreak, so both engines rank identically.

Reference analog: the reference's charge-term normalization +
severity containment scans (SURVEY.md §2 P13/F12) are the same
term-statistics family; this generalizes them to corpus-level
relevance the way updater-side exports generalize to analytics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

TFIDF_TOP_K = 5
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20
# fixed retrieval query: mixed-df terms from the synthetic vocabulary
BM25_QUERY = ["spark", "join", "vector", "stream"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens() -> Column:
    return F.split(F.lower(F.col("text")), " ")


def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP_K`` terms per document by smoothed TF-IDF,
    deterministic rank (rounded score desc, term asc)."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(_tokens()).alias("term"))
        .filter(F.col("term") != "")
    )
    # tf feeds the df aggregate AND the scoring join — pin the
    # tokenize+explode+aggregate once (measured 1.0 s -> 0.5 s, sf0.1)
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N as a broadcast single-row aggregate, not a driver collect: the
    # plan stays one job at any scale
    n_docs = _docs(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("n_docs"))
                        / (F.lit(1.0) + F.col("df"))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``BM25_TOP_K`` documents for the fixed ``BM25_QUERY`` by
    Okapi BM25; returns per-term tfs for interpretability."""
    t = F.col("_toks")
    base = (
        _docs(spark, sf_dir)
        .withColumn("_toks", _tokens())
        .select(
            "doc_id",
            F.size(t).alias("dl"),
            # one-arg lambda via closure factory: a `q=q` default would
            # make it two-arg, which F.filter binds as (element, INDEX)
            *[
                F.size(F.filter(t, (lambda term: lambda x: x == F.lit(term))(q))).alias(
                    f"tf_{q}"
                )
                for q in BM25_QUERY
            ],
        )
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),  # integer sum: exact, order-free
        *[
            F.sum((F.col(f"tf_{q}") > 0).cast("long")).alias(f"df_{q}")
            for q in BM25_QUERY
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") * F.lit(1.0) / F.col("n_docs")
    norm = F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl
    )

    def contrib(q: str) -> Column:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{q}") + F.lit(0.5))
            / (F.col(f"df_{q}") + F.lit(0.5))
        )
        tfq = F.col(f"tf_{q}").cast("double")
        return idf * tfq * F.lit(BM25_K1 + 1.0) / (tfq + norm)

    # FIXED-order addition — a float sum() aggregate would make the
    # total order-dependent and break cross-engine hash equality
    score = contrib(BM25_QUERY[0])
    for q in BM25_QUERY[1:]:
        score = score + contrib(q)
    return (
        j.select(
            "doc_id",
            "dl",
            *[f"tf_{q}" for q in BM25_QUERY],
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
    )


# stop-list rule: a term is stop-listed when it appears in more than
# 1/INDEX_STOP_DEN of all documents — compared in exact integer form
# (df * INDEX_STOP_DEN > n_docs) so both engines decide identically
INDEX_STOP_DEN = 10


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the search-engine index-build op:
    one output row per vocabulary term (unigrams AND word bigrams, the
    shingle index a phrase-capable engine builds) with document
    frequency, total term frequency, and a postings list
    ``"doc:tf doc:tf ..."`` sorted by doc_id (serialized as a string
    so the value is byte-identical across engines; a production sink
    would write the struct array).

    Terms in more than ``1/INDEX_STOP_DEN`` of all documents are
    STOP-LISTED: their postings are NULL (df/total_tf still reported).
    That is both the standard index policy (a stopword's postings list
    is as long as the corpus and useless for retrieval) and the skew
    guard: by Zipf the stop set is tiny, so it broadcasts, and the
    heavy postings aggregation never materializes a hot term's list.
    The rule is a document-count FRACTION, not an absolute cap, so it
    classifies identically at every scale factor.

    Scale shape: tf aggregate (partial+final, one long per distinct
    (term,doc)) -> vocabulary-sized df aggregate -> broadcast ANTI
    join of tf against the stop set (the seen-filter shape from the
    frontier) -> per-term sorted postings fold.  All shuffles are
    keyed by term and linear in postings; per-key materialization is
    bounded by the stop rule.  At 100 TB you additionally range-bucket
    the output by term for merge-friendly segment files.

    Reference analog: the charge-term statistics family (SURVEY.md §2
    P13/F12) materialized as the retrieval artifact instead of a scan.
    """
    t = F.col("_toks")
    # bigrams: zip tokens with themselves shifted by one; zip_with
    # pads the shorter side with null, so the final pair concats to
    # null and the explode-side filter drops it
    bigrams = F.zip_with(
        t,
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    toks = (
        _docs(spark, sf_dir)
        .withColumn("_toks", _tokens())
        .select("doc_id", F.explode(F.concat(t, bigrams)).alias("term"))
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
    )
    # tf feeds THREE consumers (df aggregate, stop anti-join, postings
    # fold) and Spark will not share the tokenize+explode+aggregate
    # subplan across them — pin it once (the shingle-index discipline
    # from minhash_lsh_neardup; measured 2.6 s -> 0.8 s at sf0.1)
    tf = (
        toks.groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    n_docs = _docs(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_docs"))
    stop = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * INDEX_STOP_DEN > F.col("n_docs"))
        .select("term")
    )
    postings = (
        tf.join(F.broadcast(stop), "term", "left_anti")
        .groupBy("term")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                    lambda s: F.concat(
                        s["doc_id"].cast("string"),
                        F.lit(":"),
                        s["tf"].cast("string"),
                    ),
                ),
            ).alias("postings")
        )
    )
    return dfreq.join(postings, "term", "left").select(
        "term", "df", "total_tf", "postings"
    )


QUERIES = {
    "tfidf_topk": tfidf_topk,
    "bm25_search": bm25_search,
    "inverted_index": inverted_index,
}

_SQL_TOKENS = "string_split(lower(text), ' ')"

ORACLE_SQL = {
    "tfidf_topk": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks
            WHERE term <> '' GROUP BY 1, 2
        ),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                   round(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + dfreq.df))
                                  + 1.0), 6) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, rank, term, tf, df, score FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term ASC
            ) AS rank
            FROM scored
        ) WHERE rank <= {TFIDF_TOP_K}
    """,
    "bm25_search": f"""
        WITH base AS (
            SELECT doc_id, len({_SQL_TOKENS}) AS dl,
                   {", ".join(
                       f"len(list_filter({_SQL_TOKENS}, x -> x = '{q}'))"
                       f" AS tf_{q}"
                       for q in BM25_QUERY
                   )}
            FROM documents
        ),
        stats AS (
            SELECT count(*) AS n_docs,
                   sum(dl)::BIGINT AS sum_dl,
                   {", ".join(
                       f"sum(CASE WHEN tf_{q} > 0 THEN 1 ELSE 0 END)::BIGINT"
                       f" AS df_{q}"
                       for q in BM25_QUERY
                   )}
            FROM base
        )
        SELECT doc_id, dl, {", ".join(f"tf_{q}" for q in BM25_QUERY)},
               round({" + ".join(
                   f"(ln(1.0 + (n_docs - df_{q} + 0.5) / (df_{q} + 0.5))"
                   f" * (tf_{q} * 1.0) * {BM25_K1 + 1.0}"
                   f" / (tf_{q} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}"
                   f" * dl / (sum_dl * 1.0 / n_docs))))"
                   for q in BM25_QUERY
               )}, 6) AS score
        FROM base CROSS JOIN stats
        ORDER BY score DESC, doc_id ASC LIMIT {BM25_TOP_K}
    """,
    # total_tf: DuckDB sum(BIGINT) is HUGEINT — cast (dtype contract)
    "inverted_index": f"""
        WITH tt AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
        toks AS (
            SELECT doc_id, unnest(list_concat(
                t,
                list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])
            )) AS term
            FROM tt
        ),
        tf AS (
            SELECT term, doc_id, count(*) AS tf FROM toks
            WHERE term <> '' GROUP BY 1, 2
        ),
        agg AS (
            SELECT term, count(*) AS df,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM tf GROUP BY 1
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        p AS (
            SELECT term,
                   string_agg(CAST(doc_id AS VARCHAR) || ':' ||
                              CAST(tf AS VARCHAR), ' ' ORDER BY doc_id)
                       AS postings
            FROM tf GROUP BY 1
        )
        SELECT agg.term, df, total_tf,
               CASE WHEN df * {INDEX_STOP_DEN} <= n.n_docs
                    THEN p.postings END AS postings
        FROM agg JOIN p USING (term) CROSS JOIN n
    """,
}
