"""Corpus-preparation operators over the ``documents`` table — the
ordering/sampling/packing layer of a training-data pipeline (what runs
AFTER dedup/quality filtering and BEFORE the tokenizer):

- :func:`stratified_sample` — deterministic per-language quota
  sampling (training-mixture control).
- :func:`pack_sequences` — token-budget sequence packing: documents
  concatenated in deterministic order within hash shards and split
  into fixed-budget sequences (the standard LM concat-and-chunk).
- :func:`corpus_interleave` — deterministic round-robin interleave of
  sources into a single total training order, without a global sort.

All three are driven by one portable deterministic shuffle key
``h = md5_int('shuf:' || doc_id)`` — a seeded hash, not a wall-clock
RNG — so runs are reproducible and the DuckDB oracles replay every
value exactly.

Scale notes (the point of each design):
- sampling: the exact per-group rank needs a per-language sort; the
  window is PARTITIONed by lang so languages proceed in parallel.  At
  100 TB replace exact rank with a per-language hash THRESHOLD
  (approx quantile of h at quota/count) and a plain filter — same
  key, no sort; exact rank kept here because the oracle demands
  exactness at test scale.
- packing: cumulative sums are per-SHARD windows (shard = h % N), so
  parallelism scales with shard count and no stage ever sees a global
  order.  Shard count is the knob: pick ~#executor-cores x 4.
- interleave: a global ``orderBy`` would funnel into a single range
  sort; instead positions are computed per-source (row_number within
  source, parallel across sources) and combined arithmetically into a
  total order — zero global shuffles beyond the per-source windows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from .textstats import md5_int

SAMPLE_QUOTA = 20  # docs kept per language
SEQ_BUDGET = 512  # tokens per packed sequence
N_SHARDS = 8


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shuffle_key() -> Column:
    """Deterministic pseudo-random order key (seeded, portable)."""
    return md5_int(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sample: the SAMPLE_QUOTA docs with the
    smallest shuffle keys in each language (ties broken by doc_id).
    This is mixture control for a training corpus — every language
    contributes exactly min(quota, population) docs, chosen
    uniformly-at-hash, reproducibly."""
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", _shuffle_key().alias("h"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= SAMPLE_QUOTA)
        .select("doc_id", "lang", "sample_rank")
    )


H_SPACE = 1 << 60  # md5_int range: bigint of md5's first 15 hex chars


def stratified_sample_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB sampling path the module header names: per-language
    hash THRESHOLD instead of an exact per-language rank.

    ``h`` is md5-uniform on [0, 2^60), so keeping ``h < quota/n *
    2^60`` yields ~quota docs per language — Binomial(n, quota/n),
    i.e. quota ± sqrt(quota) — with NO window sort anywhere: one
    map-side count aggregate per language, a broadcast threshold
    join, and a plain filter (the plan contains no Window/Sort —
    asserted in pytest).  The exact-rank :func:`stratified_sample`
    stays as the oracle-checked exact variant; this is what replaces
    it when a language has 10^9 rows and a per-language sort is the
    bottleneck.  Deterministic: same corpus -> same kept set, and the
    kept set is EXACTLY {h < threshold} (pinned by pytest)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", _shuffle_key().alias("h"))
    thr = d.groupBy("lang").agg(
        F.least(
            F.lit(H_SPACE),
            F.ceil(F.lit(float(SAMPLE_QUOTA * H_SPACE)) / F.count(F.lit(1))),
        ).alias("thr")
    )
    return (
        d.join(F.broadcast(thr), "lang")
        .filter(F.col("h") < F.col("thr"))
        .select("doc_id", "lang", "h")
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each hash shard,
    documents are laid out in deterministic (h, doc_id) order and the
    token stream is cut into SEQ_BUDGET-token sequences.  Each doc
    reports the sequence it STARTS in and its offset there; a doc may
    spill across the boundary (standard LM packing keeps the spill —
    no padding waste, attention masks handle the seam)."""
    n_tok = F.size(F.split(F.lower(F.col("text")), " "))
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            _shuffle_key().alias("h"),
            n_tok.alias("n_tokens"),
        )
        .withColumn("shard", (F.col("h") % N_SHARDS).cast("int"))
        .withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.floor(F.col("cum_before") / SEQ_BUDGET).alias("seq_id"),
            (F.col("cum_before") % SEQ_BUDGET).alias("offset_in_seq"),
        )
    )


def corpus_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin interleave of the sources into one total training
    order: position = (rank_within_source - 1) * n_sources + src_ord.
    The source list is tiny (one row per corpus) — collected once on
    the driver (bounded) and broadcast back; positions never collide
    and consuming them in ascending order cycles evenly through the
    sources while each is non-empty."""
    d = _docs(spark, sf_dir).select("doc_id", "source", _shuffle_key().alias("h"))
    srcs = sorted(r[0] for r in d.select("source").distinct().collect())
    ords = spark.createDataFrame(
        [(s, i) for i, s in enumerate(srcs)], "source string, src_ord int"
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        d.join(F.broadcast(ords), "source")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "source",
            ((F.col("rk") - 1) * len(srcs) + F.col("src_ord")).alias("global_pos"),
        )
    )


MIX_FRACTION = 0.5  # mixture token budget as a fraction of corpus tokens


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing (the DoReMi-style data-mixture
    primitive): give every source a target token WEIGHT, then keep
    documents per source — in the deterministic shuffle-key order —
    while the tokens accumulated BEFORE each document are under the
    source's quota, so the quota-crossing document is included and
    every positive quota yields at least one document.

    Weights are proportional to (source index + 1) parsed from the
    source name, normalized over the sources actually present, so the
    query is scale-free (no baked source list); the token budget is
    ``MIX_FRACTION`` of the corpus total.  In production the weight
    table is the tuned mixture (e.g. DoReMi output) broadcast as a
    small dim — here the arithmetic stands in for it.

    Scale shape: one map over the corpus, ONE single-row total-tokens
    aggregate and ONE source-count-sized aggregate (both broadcast
    back), and per-source cumulative-sum windows — source keys
    parallelize and no global sort exists.  Dtype discipline: the
    windowed sum is cast to BIGINT on both engines (DuckDB windowed
    sums are HUGEINT — the round-2 hash-mismatch class)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens"),
        _shuffle_key().alias("h"),
    )
    keyed = d.withColumn(
        "sidx", F.regexp_extract("source", r"(\d+)$", 1).cast("int") + F.lit(1)
    )
    tot = keyed.agg(F.sum("n_tokens").alias("total_toks"))
    sw = (
        keyed.select("source", "sidx")
        .distinct()
        .agg(F.sum("sidx").alias("sum_idx"))
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    cum_before = F.coalesce(
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("bigint")
    quota = F.floor(
        F.col("sidx").cast("double")
        / F.col("sum_idx")
        * F.lit(MIX_FRACTION)
        * F.col("total_toks")
    ).cast("bigint")
    return (
        keyed.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(sw))
        .withColumn("cum_before", cum_before)
        .withColumn("mix_rank", F.row_number().over(w))
        .withColumn("quota", quota)
        .filter(F.col("cum_before") < F.col("quota"))
        .select("doc_id", "source", "n_tokens", "mix_rank", "cum_before", "quota")
    )


QUERIES = {
    "stratified_sample": stratified_sample,
    "stratified_sample_threshold": stratified_sample_threshold,
    "pack_sequences": pack_sequences,
    "corpus_interleave": corpus_interleave,
    "mixture_sample": mixture_sample,
}

_SQL_H = "('0x' || left(md5('shuf:' || doc_id), 15))::BIGINT"

ORACLE_SQL = {
    "stratified_sample": f"""
        WITH k AS (
            SELECT doc_id, lang, {_SQL_H} AS h FROM documents
        ),
        r AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY h, doc_id) AS sample_rank
            FROM k
        )
        SELECT doc_id, lang, sample_rank
        FROM r WHERE sample_rank <= {SAMPLE_QUOTA}
    """,
    "stratified_sample_threshold": f"""
        WITH k AS (
            SELECT doc_id, lang, {_SQL_H} AS h FROM documents
        ),
        t AS (
            -- same double arithmetic as the Spark side: exact double
            -- literal {float(SAMPLE_QUOTA * (1 << 60))!r}, double
            -- division, ceil, BIGINT least
            SELECT lang,
                   least({1 << 60},
                         CAST(ceil({float(SAMPLE_QUOTA * (1 << 60))!r}
                                   / count(*)) AS BIGINT)) AS thr
            FROM k GROUP BY lang
        )
        SELECT k.doc_id, k.lang, k.h
        FROM k JOIN t USING (lang) WHERE k.h < t.thr
    """,
    "pack_sequences": f"""
        WITH k AS (
            SELECT doc_id, {_SQL_H} AS h,
                   len(string_split(lower(text), ' ')) AS n_tokens
            FROM documents
        ),
        s AS (
            SELECT doc_id, h, n_tokens,
                   CAST(h % {N_SHARDS} AS INT) AS shard
            FROM k
        ),
        c AS (
            -- DuckDB windowed sum() over integers returns HUGEINT (int128);
            -- Spark's sum() returns BIGINT.  Cast at the source so every
            -- column derived from cum_before hashes with the same dtype
            -- (round-2 driver red row was exactly this).
            SELECT doc_id, shard, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM s
        )
        SELECT doc_id, shard, n_tokens,
               CAST(floor(cum_before / {SEQ_BUDGET}) AS BIGINT) AS seq_id,
               cum_before % {SEQ_BUDGET} AS offset_in_seq
        FROM c
    """,
    "corpus_interleave": f"""
        WITH k AS (
            SELECT doc_id, source, {_SQL_H} AS h FROM documents
        ),
        o AS (
            SELECT source,
                   row_number() OVER (ORDER BY source) - 1 AS src_ord
            FROM (SELECT DISTINCT source FROM documents)
        ),
        n AS (SELECT count(*) AS n_src FROM o),
        r AS (
            SELECT k.doc_id, k.source,
                   row_number() OVER (PARTITION BY k.source
                                      ORDER BY k.h, k.doc_id) AS rk,
                   o.src_ord
            FROM k JOIN o USING (source)
        )
        SELECT doc_id, source,
               (rk - 1) * (SELECT n_src FROM n) + src_ord AS global_pos
        FROM r
    """,
    # same double-arithmetic order as the Spark side:
    # ((sidx/sum_idx) * fraction) * total — and windowed sum cast to
    # BIGINT at the source (DuckDB HUGEINT hazard)
    "mixture_sample": f"""
        WITH d AS (
            SELECT doc_id, source,
                   len(string_split(lower(text), ' ')) AS n_tokens,
                   {_SQL_H} AS h,
                   CAST(regexp_extract(source, '(\\d+)$', 1) AS INT) + 1
                       AS sidx
            FROM documents
        ),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_toks FROM d),
        sw AS (SELECT CAST(sum(sidx) AS BIGINT) AS sum_idx
               FROM (SELECT DISTINCT source, sidx FROM d)),
        c AS (
            SELECT doc_id, source, n_tokens, sidx,
                   CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY h, doc_id) AS mix_rank
            FROM d
        ),
        q AS (
            SELECT c.*,
                   CAST(floor(c.sidx * 1.0 / sw.sum_idx
                              * {MIX_FRACTION} * tot.total_toks)
                        AS BIGINT) AS quota
            FROM c, sw, tot
        )
        SELECT doc_id, source, n_tokens, mix_rank, cum_before, quota
        FROM q WHERE cum_before < quota
    """,
}
