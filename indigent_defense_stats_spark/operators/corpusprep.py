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


DSIR_BUCKETS = 256  # hashed-bigram feature dimension
DSIR_KEEP_Q = 0.75  # selected = importance weight above this quantile
DSIR_TARGET_LANG = "en"  # stands in for the paper's target corpus


def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023, arXiv:2302.03169): score every raw document by how
    much its HASHED-BIGRAM profile resembles a target distribution,
    then keep the top fraction.  Target here = the corpus's English
    documents (standing in for the paper's Wikipedia/books sample);
    feature = bigram hashed into ``DSIR_BUCKETS`` buckets; per-doc
    log importance weight = sum over its bigrams of
    ``ln p_target(bucket) - ln p_raw(bucket)`` with add-1 smoothing.
    ``selected`` marks docs at or above the ``DSIR_KEEP_Q`` quantile
    of the weight (the deterministic top-fraction form; the paper's
    Gumbel-noise resampler is this plus seeded per-doc noise).

    Determinism contract: each bucket's log-ratio is rounded to
    integer MICRO-units once (``r_micro``), so per-doc scores are
    exact BIGINT sums — order-independent, no float-accumulation
    drift between engines (stronger than the pre-rounded left-fold
    unigram_lm_score needs).  The quantile cut compares integers
    against ``percentile``/``quantile_cont`` — at any corpus size n,
    the rank position 0.75*(n-1) interpolates on binary fractions
    {0,.25,.5,.75}, so the lerp of two integer scores is EXACT in
    both engines and the boundary cannot flake.

    Scale shape (the paper's own point — hashed features make
    importance weights computable at web scale): one explode keyed by
    bucket feeds two LINEAR aggregates (target + raw counts, map-side
    partial, output bounded by DSIR_BUCKETS) and one broadcast-join
    scoring pass (ratio table = 256 rows); the per-doc sum is one
    linear groupBy(doc_id); the threshold is a single-row aggregate
    (``approx_percentile`` at 100 TB — the quality_thresholds
    discipline).  Nothing shuffles more than once, nothing collects.
    The exploded bucket table feeds three consumers, so it is pinned
    (the shared-subplan discipline, tests/test_shuffle_budgets.py)."""
    docs = _docs(spark, sf_dir)
    t = F.split(F.lower(F.col("text")), " ")
    bg = F.zip_with(
        t,
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ex = (
        docs.select("doc_id", "lang", F.explode(bg).alias("bg"))
        .filter(F.col("bg").isNotNull())
        .select(
            "doc_id",
            "lang",
            (
                md5_int(F.concat(F.lit("dsir:"), F.col("bg")))
                % F.lit(DSIR_BUCKETS)
            ).alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    raw = ex.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tgt = (
        ex.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    tot_r = raw.agg(F.sum("rc").alias("R"))
    tot_t = tgt.agg(F.sum("tc").alias("T"))
    nb = float(DSIR_BUCKETS)
    lr = F.log(
        (F.col("tc") + F.lit(1.0)) / (F.col("T") + F.lit(nb))
    ) - F.log((F.col("rc") + F.lit(1.0)) / (F.col("R") + F.lit(nb)))
    ratios = (
        raw.join(tgt, "b", "left")
        .withColumn("tc", F.coalesce("tc", F.lit(0)))
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "b",
            F.round(lr * F.lit(1_000_000.0), 0).cast("bigint").alias("r_micro"),
        )
    )
    scores = (
        ex.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("r_micro").alias("s_micro"),
        )
    )
    per_doc = (
        docs.select("doc_id", "lang")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("s_micro", F.lit(0)).cast("bigint").alias("logw_micro"),
        )
        .localCheckpoint(eager=False)
    )
    thr = per_doc.agg(
        F.percentile(F.col("logw_micro"), F.lit(DSIR_KEEP_Q)).alias("thr")
    )
    return per_doc.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "lang",
        "n_bigrams",
        F.round(F.col("logw_micro") / F.lit(1_000_000.0), 6).alias("logw"),
        (F.col("logw_micro") >= F.col("thr")).alias("selected"),
    )


WSAMPLE_K = 15  # docs kept per source
WSAMPLE_M = 1 << 30  # uniform-draw resolution


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    2006 (A-Res), the standard distributed weighted sampler: each item
    draws a uniform ``u`` and takes key ``u^(1/w)``; the top-k keys
    per group are a weighted sample without replacement.  Here the
    weight is ``n_chars`` (sample probability ∝ document length — the
    token-proportional draw a mixture builder wants) and the group is
    ``source``, so every source yields ``WSAMPLE_K`` docs drawn
    length-weighted.

    Determinism contract: ``u`` comes from the portable seeded hash
    (no wall-clock RNG), and the rank key is computed as
    ``round(ln(u), 6)`` baked to integer micro-units, then divided by
    the integer weight — monotone in ``u^(1/w)`` (log transform;
    both negative, w>0).  Integer-divided-by-integer is a SINGLE
    IEEE-754 division, correctly rounded by spec in both engines, so
    the per-row keys are bit-identical and the only float exposure is
    the measure-zero round(ln) boundary every rounded-log column in
    this repo already carries.  No float reaches the output: kept
    rows report only integers.

    Scale shape: a pure map computes keys, one per-source window
    ranks them (sources proceed in parallel — the stratified_sample
    shuffle profile); at 100 TB with a huge group count this is the
    textbook one-pass weighted reservoir: keys are monotone, so
    per-partition top-k then merge (Spark: ``rank <= k`` after the
    window; the window itself is the merge)."""
    docs = _docs(spark, sf_dir)
    u = (
        (md5_int(F.concat(F.lit("wres:"), F.col("doc_id").cast("string")))
         % F.lit(WSAMPLE_M)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(WSAMPLE_M))
    w = F.greatest(F.col("n_chars"), F.lit(1))  # zero-length docs: w=1
    key = (
        F.round(F.log(u) * F.lit(1_000_000.0), 0).cast("bigint")
        / F.col("weight")
    )
    win = Window.partitionBy("source").orderBy(
        F.desc("key"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", w.cast("bigint").alias("weight"))
        .withColumn("key", key)
        .withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= WSAMPLE_K)
        .select("doc_id", "source", "weight", "sample_rank")
    )


MIX_BUDGET = 100_000  # token budget to apportion across sources


def temperature_mixture_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source quotas by largest-remainder
    apportionment — the multilingual/multi-source rebalancing rule
    (mT5/XLM-R: sample source s with p_s ∝ w_s^alpha, alpha<1 boosts
    small sources).  Here alpha = 0.5 EXACTLY so the power is
    ``sqrt`` — IEEE-754 sqrt is correctly rounded by spec in both
    engines, unlike ``pow``, whose libm rounding varies; this is the
    whole reason the exposed temperature is fixed at 0.5 (the
    float-contract discipline of weighted_sample/recrawl_priority).

    Integer quotas via Hamilton's method (largest remainder): ideal
    share q_s = B * sqrt(w_s) / S with S = ordered fold of sqrt over
    sources sorted by name (bit-identical sum both engines); floor
    everywhere; the B - sum(floor) leftover goes +1 to the largest
    fractional parts (tie -> source name asc).  sum(quota) == B
    exactly.

    Scale shape: one data-sized aggregate (weights per source); the
    apportionment itself runs on the O(#sources) dim — the
    single-partition-window-on-a-bounded-dim pattern shared with
    freshness.waterfill."""
    per = _docs(spark, sf_dir).groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("weight")
    )
    ssum = per.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "weight"))),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x["weight"].cast("double")),
        ).alias("s_sum")
    )
    q = F.lit(float(MIX_BUDGET)) * F.sqrt(F.col("weight").cast("double")) / F.col(
        "s_sum"
    )
    full = Window.partitionBy(F.lit(1))
    rank_w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("frac"), F.asc("source")
    )
    based = (
        per.crossJoin(F.broadcast(ssum))
        .withColumn("base", F.floor(q).cast("long"))
        .withColumn("frac", q - F.floor(q))
        .localCheckpoint(eager=False)
    )
    return (
        based.withColumn(
            "leftover", F.lit(MIX_BUDGET) - F.sum("base").over(full)
        )
        .withColumn("r", F.row_number().over(rank_w))
        .select(
            "source",
            "weight",
            (
                F.col("base")
                + F.when(F.col("r") <= F.col("leftover"), 1).otherwise(0)
            ).alias("quota"),
        )
        .orderBy("source")
    )


QUERIES = {
    "stratified_sample": stratified_sample,
    "stratified_sample_threshold": stratified_sample_threshold,
    "pack_sequences": pack_sequences,
    "corpus_interleave": corpus_interleave,
    "mixture_sample": mixture_sample,
    "dsir_select": dsir_select,
    "weighted_sample": weighted_sample,
    "temperature_mixture_quota": temperature_mixture_quota,
}

_SQL_H = "('0x' || left(md5('shuf:' || doc_id), 15))::BIGINT"

_SQL_TEMP_MIX = f"""
    WITH per AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS weight
        FROM documents GROUP BY source
    ), s AS (
        SELECT list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(sqrt(CAST(weight AS DOUBLE)) ORDER BY source)),
                   (a, b) -> a + b) AS s_sum
        FROM per
    ), based AS (
        SELECT source, weight,
               FLOOR({MIX_BUDGET}.0 * sqrt(CAST(weight AS DOUBLE)) / s_sum)
                   AS fl,
               {MIX_BUDGET}.0 * sqrt(CAST(weight AS DOUBLE)) / s_sum
                 - FLOOR({MIX_BUDGET}.0 * sqrt(CAST(weight AS DOUBLE)) / s_sum)
                   AS frac
        FROM per, s
    )
    SELECT source, weight,
           CAST(fl + CASE WHEN row_number() OVER
                              (ORDER BY frac DESC, source)
                          <= {MIX_BUDGET} - (SELECT sum(fl) FROM based)
                          THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM based
    ORDER BY source
"""

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
    "dsir_select": f"""
        WITH ts AS (
            SELECT doc_id, lang, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        ex AS (
            SELECT doc_id, lang,
                   ('0x' || left(md5('dsir:' || bg), 15))::BIGINT
                       % {DSIR_BUCKETS} AS b
            FROM (
                SELECT doc_id, lang,
                       unnest(list_transform(
                           range(1, len(t)),
                           i -> t[i] || ' ' || t[i + 1]
                       )) AS bg
                FROM ts
            )
        ),
        raw AS (SELECT b, count(*) AS rc FROM ex GROUP BY b),
        tgt AS (SELECT b, count(*) AS tc FROM ex
                WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
        tot AS (SELECT (SELECT CAST(sum(rc) AS BIGINT) FROM raw) AS R,
                       (SELECT CAST(sum(tc) AS BIGINT) FROM tgt) AS T),
        ratios AS (
            -- same double arithmetic textually as the Spark side:
            -- ln((count+1.0)/(total+{float(DSIR_BUCKETS)!r})), the
            -- difference scaled to integer micro-units ONCE, so the
            -- per-doc sums below are exact BIGINT arithmetic
            SELECT raw.b,
                   CAST(round((ln((coalesce(tc, 0) + 1.0)
                                  / (T + {float(DSIR_BUCKETS)!r}))
                             - ln((rc + 1.0)
                                  / (R + {float(DSIR_BUCKETS)!r})))
                              * 1000000.0, 0) AS BIGINT) AS r_micro
            FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
        ),
        scores AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   CAST(sum(r_micro) AS BIGINT) AS s_micro
            FROM ex JOIN ratios USING (b) GROUP BY doc_id
        ),
        per_doc AS (
            SELECT d.doc_id, d.lang,
                   CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(coalesce(s_micro, 0) AS BIGINT) AS logw_micro
            FROM documents d LEFT JOIN scores USING (doc_id)
        ),
        thr AS (SELECT quantile_cont(logw_micro, {DSIR_KEEP_Q}) AS thr
                FROM per_doc)
        SELECT doc_id, lang, n_bigrams,
               round(logw_micro / 1000000.0, 6) AS logw,
               logw_micro >= thr AS selected
        FROM per_doc CROSS JOIN thr
    """,
    "weighted_sample": f"""
        WITH k AS (
            SELECT doc_id, source,
                   greatest(n_chars, 1) AS weight,
                   ('0x' || left(md5('wres:' || doc_id), 15))::BIGINT
                       % {WSAMPLE_M} AS hm
            FROM documents
        ),
        s AS (
            -- key = round(ln(u),6)-in-micro-units / integer weight:
            -- one IEEE division of exact integers, bit-identical in
            -- both engines; monotone in the A-Res key u^(1/w)
            SELECT doc_id, source, weight,
                   CAST(round(ln((CAST(hm AS DOUBLE) + 0.5)
                                 / {float(WSAMPLE_M)!r})
                              * 1000000.0, 0) AS BIGINT)
                       / weight AS key
            FROM k
        ),
        r AS (
            SELECT doc_id, source, weight,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY key DESC, doc_id)
                       AS sample_rank
            FROM s
        )
        SELECT doc_id, source, weight, sample_rank
        FROM r WHERE sample_rank <= {WSAMPLE_K}
    """,
    "temperature_mixture_quota": _SQL_TEMP_MIX,
}
