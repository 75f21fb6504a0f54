"""Benchmark decontamination + repetition filters (training-data layer).

Two operators a pretraining pipeline runs right after dedup:

- ``benchmark_contamination`` — the standard 13-gram decontamination
  check (tag every training document whose token stream shares any
  13-gram with the held-out eval set).  Here the eval set is the
  deterministic ``doc_id % 10 == 7`` slice of ``documents`` — at
  production scale it is the actual benchmark suite, which is tiny by
  construction, so the eval n-gram set ALWAYS broadcasts: the training
  side streams through a broadcast-hash semi-join with no shuffle of
  the 100 TB corpus (only the per-doc aggregate shuffles, keyed by
  doc_id — no skew).
- ``repetition_stats`` — Gopher-style within-document repetition
  metrics (duplicate-token fraction, top-bigram fraction).  Computed
  entirely with higher-order array functions: the top-bigram count is
  an ``array_sort`` + run-length fold (max run of equal adjacent
  grams), O(d log d) per document instead of the naive O(d^2)
  distinct-gram scan (measured 22x at sf0.1, BENCH/NOTES.md), with
  ZERO shuffle and zero Python — at 100 TB this is a pure map over
  the parquet scan.

Both have exact DuckDB oracles (same formulas over the same list
functions); floats are single divisions of exact integers, rounded to
6 places on both sides.

Reference parity note: the reference has no training-data layer; these
extend the engine the way SURVEY.md §6 prescribes (first-class
pretraining corpus operators alongside dedup/similarity/textstats).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

NGRAM = 13  # the conventional decontamination n-gram length
EVAL_MOD, EVAL_REM = 10, 7  # eval split: doc_id % 10 == 7


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens() -> Column:
    return F.split(F.lower(F.col("text")), " ")


def _ngrams(tokens: Column, n: int) -> Column:
    """All word n-grams of ``tokens`` as space-joined strings; empty
    array when the document is shorter than ``n`` tokens.  The
    explicit guard matters: ``sequence(1, k)`` with ``k < 1`` would
    DESCEND (default step -1), silently fabricating grams."""
    k = F.size(tokens) - F.lit(n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training document: distinct 13-gram count, how many of those
    also occur in the eval split, the contamination ratio, and a 0/1
    flag.  Documents with < 13 tokens report 0 grams / 0 hits."""
    docs = _docs(spark, sf_dir)
    grams = docs.select(
        "doc_id",
        F.explode_outer(F.array_distinct(_ngrams(_tokens(), NGRAM))).alias("g"),
    )
    is_eval = (F.col("doc_id") % EVAL_MOD) == EVAL_REM
    eval_grams = grams.where(is_eval & F.col("g").isNotNull()).select("g").distinct()
    train = grams.where(~is_eval)
    hit = (
        train.join(F.broadcast(eval_grams.withColumn("hit", F.lit(1))), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("g").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
    )
    return hit.select(
        "doc_id",
        "n_grams",
        "n_hits",
        F.round(
            F.when(F.col("n_grams") > 0, F.col("n_hits") / F.col("n_grams")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("contamination"),
        (F.col("n_hits") > 0).cast("int").alias("contaminated"),
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features, all within-row (no shuffle):

    - ``dup_token_frac``: 1 - distinct/total tokens
    - ``top_bigram_frac``: occurrences of the most frequent word
      bigram / total bigrams (0 for single-token docs)
    """
    t = _tokens()
    n = F.size(t)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / n.cast(
        "double"
    )
    bi = _ngrams(t, 2)
    # Most-frequent-bigram count == longest equal-run in the SORTED
    # bigram array: one O(d log d) sort + one O(d) fold, instead of the
    # naive O(d^2) distinct x filter scan (measured 100x slower at
    # sf0.1 — nested-lambda expression evals dominate).
    top = F.aggregate(
        F.array_sort(bi),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = F.when(
        F.size(bi) > 0, top.cast("double") / F.size(bi).cast("double")
    ).otherwise(F.lit(0.0))
    return _docs(spark, sf_dir).select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(top_frac, 6).alias("top_bigram_frac"),
    )


CHUNK = 10  # tokens per chunk for cross-document duplication


def cross_doc_chunk_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-document repetition (RefinedWeb-style): split each doc
    into non-overlapping 10-token chunks, count in how many DISTINCT
    documents each chunk occurs, and report per doc the fraction of
    its chunks that also appear elsewhere.  The shuffle is keyed by
    chunk string — linear in corpus size, map-side partial agg; hot
    boilerplate chunks are exactly what AQE skew-split handles (and a
    df-cap filter drops them from the join back if needed)."""
    docs = _docs(spark, sf_dir)
    t = _tokens()
    nchunks = F.floor((F.size(t) + F.lit(CHUNK - 1)) / F.lit(CHUNK)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.concat_ws(" ", F.slice(t, i * CHUNK + 1, CHUNK)),
    )
    chunks = docs.select(
        "doc_id", F.explode(F.array_distinct(chunk_arr)).alias("chunk")
    )
    df_counts = chunks.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("doc_freq")  # one row per (doc, chunk)
    )
    return (
        chunks.join(df_counts, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("doc_freq") > 1).cast("int")).cast("bigint").alias(
                "n_shared_chunks"
            ),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared_chunks",
            F.round(F.col("n_shared_chunks") / F.col("n_chunks"), 6).alias(
                "shared_frac"
            ),
        )
    )


DUP_TOKEN_MAX = 0.7
TOP_BIGRAM_MAX = 0.2


def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining filter — what an actual corpus build
    runs: keep a document iff it is (a) the exact-dedup keeper for its
    content hash (lowest doc_id wins), (b) not contaminated against
    the eval split, and (c) under the repetition thresholds.  One
    md5-keyed shuffle for the keeper window, the broadcast
    decontamination join, and two map-side metric joins keyed by
    doc_id — all linear at 100 TB."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    keeper = docs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.md5("text")).orderBy("doc_id")
        ),
    ).where(F.col("rn") == 1)
    cont = benchmark_contamination(spark, sf_dir).where(F.col("contaminated") == 0)
    rep = repetition_stats(spark, sf_dir).where(
        (F.col("dup_token_frac") <= DUP_TOKEN_MAX)
        & (F.col("top_bigram_frac") <= TOP_BIGRAM_MAX)
    )
    return (
        keeper.join(cont.select("doc_id"), "doc_id")
        .join(rep.select("doc_id"), "doc_id")
        .select("doc_id", "source", "lang", "n_chars")
    )


def duplicate_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-SUBSTRING statistics — the ExactSubstr
    primitive of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ACL'22): a 13-token window that occurs
    more than once ANYWHERE in the corpus marks its span; per doc we
    report how many window starts are duplicated and what fraction of
    its tokens is covered by the union of duplicated windows (the
    quantity ExactSubstr would cut).

    Shape at 100 TB: positional grams explode linearly; the occurrence
    count is a map-side-partial aggregate on the gram; the df>1 filter
    joins back on the same key (shuffle linear in corpus grams, no
    all-pairs anywhere); coverage is per-doc array math.  The suffix
    array of the paper answers ARBITRARY-length repeats; fixed-k
    windows are the bounded-memory distributed stand-in (any repeat of
    length >= k contains a duplicated k-window, so coverage is a
    superset marker at granularity k).  Coverage here is computed as
    distinct covered indices (O(dups x k) intermediate); swap for the
    sorted interval-union fold when dup density is high.

    Shuffle-key note (measured, round 3): hashing each gram to a
    60-bit int before the explode cuts shuffle bytes ~10x, but at
    sf0.1/local[32] it is a net LOSS (2.2 s -> 2.9 s warm — the
    md5+conv per gram costs more than the memory-speed local shuffle
    saves), so the string key stays; on a real network-shuffled
    cluster the hash wins and is a two-line change here plus the same
    md5 idiom in the oracle."""
    K = NGRAM
    d = _docs(spark, sf_dir).withColumn("_toks", _tokens())
    # grams (tokenize + 13-gram posexplode) feeds both the occurrence
    # count and the df>1 join-back — pin it once instead of exploding
    # twice (measured 1.9 s -> 0.8 s at sf0.1)
    grams = d.select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        F.posexplode(_ngrams(F.col("_toks"), K)).alias("pos", "gram"),
    ).localCheckpoint(eager=False)
    cnt = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    dup = grams.join(cnt.filter(F.col("c") > 1), "gram")
    per_doc = dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_grams"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.collect_list("pos"),
                        lambda p: F.sequence(p, p + F.lit(K - 1)),
                    )
                )
            )
        ).alias("covered_tokens"),
    )
    return (
        d.select("doc_id", F.size("_toks").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.round(
                F.coalesce("covered_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("dup_frac"),
        )
    )


def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global line-level deduplication WITH document rewrite:
    split each document into its dedup units (C4 uses newline-delimited
    lines; the synthetic corpus has no newlines, so the unit is the
    same non-overlapping ``CHUNK``-token chunk ``cross_doc_chunk_dup``
    counts), keep only the globally FIRST occurrence of every chunk —
    first by (doc_id, position), the same keep-first rule the exact
    dedup keeper uses — and reassemble each document from its surviving
    chunks.  This is the op that actually *edits* the corpus, where
    ``cross_doc_chunk_dup`` only measures it.

    Scale shape: one map-side chunking (no explode of token arrays —
    chunks are built with ``transform`` over ``sequence``), a
    ``row_number`` window keyed by chunk string (linear shuffle, same
    key profile as the chunk-df aggregate; hot boilerplate chunks are
    AQE skew-split), and one groupBy doc_id for reassembly (dense
    unskewed keys).  No all-pairs anywhere; both shuffles are linear in
    corpus size, so the plan survives 100 TB unchanged.

    Reference analog: generalizes the reference's keep-first dedup
    semantics (updater drop-duplicates, SURVEY.md §2 D3) from whole
    records to intra-document spans.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    t = _tokens()
    nchunks = F.floor((F.size(t) + F.lit(CHUNK - 1)) / F.lit(CHUNK)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.concat_ws(" ", F.slice(t, i * CHUNK + 1, CHUNK)),
    )
    ch = docs.select("doc_id", F.posexplode(chunk_arr).alias("pos", "chunk"))
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    kept = ch.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    reasm = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("new_text"),
    )
    totals = docs.select("doc_id", nchunks.cast("bigint").alias("n_chunks"))
    return totals.join(reasm, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )


def exact_substr_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr REMOVAL (Lee et al., ACL'22 "Deduplicating Training
    Data Makes Language Models Better", §4.1): rewrite every document
    with the tokens covered by any corpus-duplicated ``NGRAM``-token
    window CUT OUT.  ``duplicate_span_stats`` measures this quantity;
    this operator performs the edit — and because duplicated windows
    OVERLAP arbitrarily (unlike ``line_dedup``'s aligned chunks), the
    cut runs through the sorted INTERVAL-UNION fold: per doc, order
    duplicated window starts, carry a running max of interval ends
    (window frame ``rows unbounded preceding .. 1 preceding``), open a
    new island when a start clears it, and collapse each island to
    [min start, max end) — the standard islands-and-gaps reduction,
    one linear window pass instead of the O(dups x k) distinct-index
    materialization.

    This variant cuts EVERY occurrence (the decontamination-style
    policy); keep-first is the one-line row_number change line_dedup
    already demonstrates.

    Scale shape: positional-gram explode (linear) -> gram-count
    aggregate (map-side partial) -> df>1 join-back on the same key ->
    per-doc window over DUPLICATED starts only (skew bounded by doc
    length) -> island aggregate -> one broadcast-sized struct-array
    join back to the corpus for the HOF rebuild.  No all-pairs; every
    shuffle is linear in corpus grams.
    """
    K = NGRAM
    d = (
        _docs(spark, sf_dir)
        .withColumn("_toks", _tokens())
        .localCheckpoint(eager=False)
    )
    grams = d.select(
        "doc_id",
        F.posexplode(_ngrams(F.col("_toks"), K)).alias("pos", "gram"),
    ).localCheckpoint(eager=False)
    cnt = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    dup = grams.join(cnt.filter(F.col("c") > 1), "gram").select(
        "doc_id", "pos"
    )
    return _island_cut(d, dup, K)


def _island_cut(d: DataFrame, dup: DataFrame, k: int) -> DataFrame:
    """The interval-union cut shared by :func:`exact_substr_cut` and
    :func:`decontaminate_cut`: ``dup`` = (doc_id, pos) marked window
    starts -> islands via the running-max fold -> HOF rebuild of each
    document in ``d`` (doc_id, _toks) with covered tokens removed."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dup.select(
        "doc_id",
        "pos",
        F.when(prev_max.isNull() | (F.col("pos") >= prev_max), 1)
        .otherwise(0)
        .alias("brk"),
    ).withColumn("island", F.sum("brk").over(w))
    iv = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("int").alias("s"),
            (F.max("pos") + k).cast("int").alias("e"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("ivs"))
    )
    per = d.join(iv, "doc_id", "left").select(
        "doc_id",
        "_toks",
        F.coalesce(
            "ivs", F.array().cast("array<struct<s:int,e:int>>")
        ).alias("ivs"),
    )
    idx = F.sequence(F.lit(0), F.size("_toks") - 1)
    kept = F.filter(
        idx,
        lambda i: ~F.exists(
            F.col("ivs"), lambda v: (i >= v["s"]) & (i < v["e"])
        ),
    )
    clean = F.array_join(
        F.transform(kept, lambda i: F.element_at(F.col("_toks"), i + 1)),
        " ",
    )
    return per.select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).alias("n_cut"),
        clean.alias("clean_text"),
    )


def decontaminate_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURGICAL benchmark decontamination: instead of dropping every
    training document that shares a 13-gram with the eval split
    (``benchmark_contamination``'s document-level flag, the
    GPT-3/PaLM appendix policy), cut ONLY the overlapping spans and
    keep the rest of the document — the span-level variant used when
    whole-document removal wastes too much data (e.g. Llama-2's
    sampled-window decontamination).  Same islands machinery as
    :func:`exact_substr_cut`; the marked positions come from a
    BROADCAST membership join against the distinct eval-split grams
    instead of a corpus-wide df aggregate, so the training corpus
    never shuffles — the decontamination scale contract
    (benchmark_contamination pins the BroadcastHashJoin-only plan).

    Output covers TRAIN documents only (eval docs are not rewritten).
    """
    K = NGRAM
    is_eval = (F.col("doc_id") % EVAL_MOD) == EVAL_REM
    d = (
        _docs(spark, sf_dir)
        .withColumn("_toks", _tokens())
        .localCheckpoint(eager=False)
    )
    grams = d.select(
        "doc_id",
        F.posexplode(_ngrams(F.col("_toks"), K)).alias("pos", "gram"),
    )
    eval_grams = (
        grams.where((F.col("doc_id") % EVAL_MOD) == EVAL_REM)
        .select("gram")
        .distinct()
    )
    dup = (
        grams.where((F.col("doc_id") % EVAL_MOD) != EVAL_REM)
        .join(F.broadcast(eval_grams), "gram")
        .select("doc_id", "pos")
    )
    return _island_cut(d.where(~is_eval), dup, K)


QUERIES = {
    "benchmark_contamination": benchmark_contamination,
    "repetition_stats": repetition_stats,
    "line_dedup": line_dedup,
    "cross_doc_chunk_dup": cross_doc_chunk_dup,
    "duplicate_span_stats": duplicate_span_stats,
    "exact_substr_cut": exact_substr_cut,
    "decontaminate_cut": decontaminate_cut,
    "clean_corpus": clean_corpus,
}

_TS = "string_split(lower(text), ' ')"


def _sql_ngrams(n: int) -> str:
    """DuckDB: distinct word n-grams per document (empty when short)."""
    return f"""
        SELECT doc_id,
               list_distinct(CASE WHEN len(ts) >= {n}
                   THEN list_transform(generate_series(1, len(ts) - {n - 1}),
                        i -> array_to_string(ts[i:i+{n - 1}], ' '))
                   ELSE []::VARCHAR[] END) AS gs
        FROM (SELECT doc_id, {_TS} AS ts FROM documents)
    """


ORACLE_SQL = {
    "benchmark_contamination": f"""
        WITH pergram AS ({_sql_ngrams(NGRAM)}),
        grams AS (
            SELECT doc_id, u.g
            FROM pergram, unnest(gs) AS u(g)
        ),
        ev AS (SELECT DISTINCT g FROM grams
               WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
        train AS (SELECT * FROM pergram
                  WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}),
        hits AS (
            SELECT t.doc_id,
                   len(t.gs) AS n_grams,
                   (SELECT count(*) FROM unnest(t.gs) AS u(g)
                    WHERE g IN (SELECT g FROM ev)) AS n_hits
            FROM train t
        )
        SELECT doc_id, n_grams, n_hits,
               round(CASE WHEN n_grams > 0
                     THEN n_hits * 1.0 / n_grams ELSE 0.0 END, 6)
                   AS contamination,
               CASE WHEN n_hits > 0 THEN 1 ELSE 0 END AS contaminated
        FROM hits
    """,
    "cross_doc_chunk_dup": f"""
        WITH t AS (SELECT doc_id, {_TS} AS ts FROM documents),
        chunks AS (
            SELECT DISTINCT doc_id,
                   array_to_string(ts[i*{CHUNK}+1 : i*{CHUNK}+{CHUNK}], ' ')
                       AS chunk
            FROM t, unnest(generate_series(0,
                     CAST((len(ts) + {CHUNK - 1}) // {CHUNK} AS INT) - 1))
                 AS g(i)
        ),
        dfreq AS (SELECT chunk, count(*) AS doc_freq FROM chunks GROUP BY chunk)
        SELECT c.doc_id,
               count(*) AS n_chunks,
               CAST(sum(CASE WHEN d.doc_freq > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shared_chunks,
               round(sum(CASE WHEN d.doc_freq > 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS shared_frac
        FROM chunks c JOIN dfreq d USING (chunk)
        GROUP BY c.doc_id
    """,
    "repetition_stats": f"""
        WITH t AS (SELECT doc_id, {_TS} AS ts FROM documents),
        bi AS (
            SELECT doc_id, ts,
                   CASE WHEN len(ts) >= 2
                        THEN list_transform(generate_series(1, len(ts) - 1),
                             i -> array_to_string(ts[i:i+1], ' '))
                        ELSE []::VARCHAR[] END AS gs
            FROM t
        )
        SELECT doc_id,
               len(ts) AS n_tokens,
               round(1.0 - len(list_distinct(ts)) * 1.0 / len(ts), 6)
                   AS dup_token_frac,
               round(CASE WHEN len(gs) > 0
                     THEN list_max(list_transform(list_distinct(gs),
                              x -> len(list_filter(gs, y -> y = x))))
                          * 1.0 / len(gs)
                     ELSE 0.0 END, 6) AS top_bigram_frac
        FROM bi
    """,
}

ORACLE_SQL["line_dedup"] = f"""
    WITH t AS (SELECT doc_id, {_TS} AS ts FROM documents),
    chunks AS (
        SELECT doc_id, i AS pos,
               array_to_string(ts[i*{CHUNK}+1 : i*{CHUNK}+{CHUNK}], ' ')
                   AS chunk
        FROM t, unnest(generate_series(0,
                 CAST((len(ts) + {CHUNK - 1}) // {CHUNK} AS INT) - 1))
             AS g(i)
    ),
    kept AS (
        SELECT doc_id, pos, chunk,
               row_number() OVER (PARTITION BY chunk
                                  ORDER BY doc_id, pos) AS rn
        FROM chunks
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(chunk, ' ' ORDER BY pos) AS new_text
        FROM kept WHERE rn = 1 GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST((len(ts) + {CHUNK - 1}) // {CHUNK} AS BIGINT) AS n_chunks,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST((len(ts) + {CHUNK - 1}) // {CHUNK}
                - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped,
           coalesce(a.new_text, '') AS new_text
    FROM t LEFT JOIN agg a USING (doc_id)
"""

# clean_corpus composes the two filters above verbatim (as derived
# tables) plus an exact-dedup keeper window — same composition the
# Spark side performs.
ORACLE_SQL["duplicate_span_stats"] = f"""
    WITH t AS (SELECT doc_id, {_TS} AS ts FROM documents),
    g AS (
        SELECT doc_id, len(ts) AS n_tokens,
               unnest(generate_series(1, len(ts) - {NGRAM - 1})) AS i, ts
        FROM t WHERE len(ts) >= {NGRAM}
    ),
    g2 AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(ts[i:i+{NGRAM - 1}], ' ') AS gram
        FROM g
    ),
    cnt AS (SELECT gram, count(*) AS c FROM g2 GROUP BY 1),
    dup AS (
        SELECT g2.doc_id, g2.pos FROM g2 JOIN cnt USING (gram)
        WHERE cnt.c > 1
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_dup_grams,
               CAST(len(list_distinct(flatten(list_transform(
                   list(pos), p -> generate_series(p, p + {NGRAM - 1})
               )))) AS INT) AS covered_tokens
        FROM dup GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.ts) AS INT) AS n_tokens,
           coalesce(a.n_dup_grams, 0) AS n_dup_grams,
           coalesce(a.covered_tokens, 0) AS covered_tokens,
           round(coalesce(a.covered_tokens, 0) * 1.0 / len(t.ts), 6)
               AS dup_frac
    FROM t LEFT JOIN agg a USING (doc_id)
"""

def _islands_sql_suffix() -> str:
    """The interval-union islands chain + per-doc rebuild, shared
    VERBATIM by the exact_substr_cut and decontaminate_cut oracles —
    the SQL twin of the Spark-side _island_cut helper.  Callers
    provide CTEs ``t`` (doc_id, ts) and ``dup`` (doc_id, pos)."""
    return f""",
    isl0 AS (
        SELECT doc_id, pos,
               max(pos + {NGRAM}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max
        FROM dup
    ),
    isl1 AS (
        SELECT doc_id, pos,
               CASE WHEN prev_max IS NULL OR pos >= prev_max
                    THEN 1 ELSE 0 END AS brk
        FROM isl0
    ),
    isl2 AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl1
    ),
    iv AS (
        SELECT doc_id, island, min(pos) AS s, max(pos) + {NGRAM} AS e
        FROM isl2 GROUP BY 1, 2
    ),
    tok AS (
        SELECT doc_id, unnest(generate_series(0, len(ts) - 1)) AS i, ts
        FROM t
    ),
    tok2 AS (SELECT doc_id, i, ts[i + 1] AS w FROM tok),
    kept AS (
        SELECT tp.doc_id, tp.i, tp.w FROM tok2 tp
        WHERE NOT EXISTS (
            SELECT 1 FROM iv
            WHERE iv.doc_id = tp.doc_id
              AND tp.i >= iv.s AND tp.i < iv.e
        )
    ),
    ka AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(w, ' ' ORDER BY i) AS clean_text
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.ts) AS INT) AS n_tokens,
           CAST(len(t.ts) - coalesce(k.n_kept, 0) AS INT) AS n_cut,
           coalesce(k.clean_text, '') AS clean_text
    FROM t LEFT JOIN ka k USING (doc_id)
"""


# exact_substr_cut: the same positional-gram + df>1 chain as
# duplicate_span_stats, then the islands-and-gaps reduction (running
# max over the preceding frame -> break flags -> running sum) and a
# NOT EXISTS anti-join of token positions against the islands.
ORACLE_SQL["exact_substr_cut"] = f"""
    WITH t AS (SELECT doc_id, {_TS} AS ts FROM documents),
    g AS (
        SELECT doc_id,
               unnest(generate_series(1, len(ts) - {NGRAM - 1})) AS i, ts
        FROM t WHERE len(ts) >= {NGRAM}
    ),
    g2 AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(ts[i:i+{NGRAM - 1}], ' ') AS gram
        FROM g
    ),
    cnt AS (SELECT gram, count(*) AS c FROM g2 GROUP BY 1),
    dup AS (
        SELECT g2.doc_id, g2.pos FROM g2 JOIN cnt USING (gram)
        WHERE cnt.c > 1
    )
    """ + _islands_sql_suffix()

# decontaminate_cut: identical islands chain, but the marked starts
# come from eval-gram membership and only train docs are rewritten
ORACLE_SQL["decontaminate_cut"] = f"""
    WITH t AS (
        SELECT doc_id, {_TS} AS ts FROM documents
        WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}
    ),
    ev AS (
        SELECT doc_id, {_TS} AS ts FROM documents
        WHERE doc_id % {EVAL_MOD} = {EVAL_REM}
    ),
    eg AS (
        SELECT DISTINCT array_to_string(ts[i:i+{NGRAM - 1}], ' ') AS gram
        FROM (
            SELECT ts, unnest(generate_series(1, len(ts) - {NGRAM - 1}))
                       AS i
            FROM ev WHERE len(ts) >= {NGRAM}
        )
    ),
    g AS (
        SELECT doc_id,
               unnest(generate_series(1, len(ts) - {NGRAM - 1})) AS i, ts
        FROM t WHERE len(ts) >= {NGRAM}
    ),
    g2 AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(ts[i:i+{NGRAM - 1}], ' ') AS gram
        FROM g
    ),
    dup AS (
        SELECT g2.doc_id, g2.pos FROM g2 JOIN eg USING (gram)
    )
    """ + _islands_sql_suffix()

ORACLE_SQL["clean_corpus"] = f"""
    SELECT d.doc_id, d.source, d.lang, d.n_chars
    FROM documents d
    JOIN (SELECT doc_id,
                 row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) AS rn
          FROM documents) k
      ON d.doc_id = k.doc_id AND k.rn = 1
    JOIN ({ORACLE_SQL["benchmark_contamination"]}) c
      ON d.doc_id = c.doc_id AND c.contaminated = 0
    JOIN ({ORACLE_SQL["repetition_stats"]}) r
      ON d.doc_id = r.doc_id
         AND r.dup_token_frac <= {DUP_TOKEN_MAX}
         AND r.top_bigram_frac <= {TOP_BIGRAM_MAX}
"""
