"""Text analysis over the ``documents`` table (training-data layer).

Token counting, quality scoring, language-ID heuristic, and document
fingerprinting — all as native column expressions (JVM, whole-stage
codegen; zero Python).  Every query has a DuckDB oracle computing the
same formula, so the driver's value-hash check is exact:

- float discipline: scores are single divisions/products of exact
  integers -> bit-identical across engines; rounded anyway
- hashing discipline: the only portable cross-engine hash is md5, so
  integer hashes are ``bigint(first 15 hex digits of md5)`` on both
  sides (Spark ``conv``, DuckDB ``('0x'||left(..))::BIGINT``)

Scale notes: all per-document — no shuffle except final aggregates;
filters/projections push into the parquet scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

EN_STOP = ["the", "a", "of", "and", "to", "is", "in"]
ES_STOP = ["el", "la", "de", "que", "y", "en"]
FR_STOP = ["le", "les", "des", "et", "un", "une"]
DE_STOP = ["der", "die", "das", "und", "ist"]

MOD = 1_000_000_007


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens() -> Column:
    return F.split(F.lower(F.col("text")), " ")


def md5_int(c: Column) -> Column:
    """Portable 60-bit integer hash: bigint of md5's first 15 hex chars."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def _hits(tokens: Column, words: list[str]) -> Column:
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lits, t)))


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-doc counts (BPE-ish regex token
    count included: alnum runs + single punctuation, the common
    pre-tokenizer shape)."""
    t = _tokens()
    # BPE-ish pre-tokenizer: alnum runs or single non-space symbols
    bpe = F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.length("text").alias("n_chars_engine"),
        bpe.alias("n_bpeish_tokens"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/type-token quality heuristics (the standard
    pretraining quality-filter features)."""
    t = _tokens()
    n = F.size(t)
    uniq = F.size(F.array_distinct(t))
    stop = _hits(t, EN_STOP)
    ttr = uniq.cast("double") / n.cast("double")
    stop_ratio = stop.cast("double") / n.cast("double")
    len_score = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(len_score * ttr, 6).alias("quality"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/charset language heuristic; deterministic priority
    tiebreak (zh charset > en > es > fr > de > unknown).

    The hit counts are projected ONCE before the when-chain: each
    ``_hits`` is an interpreted higher-order lambda (no codegen
    through lambdas — the repetition_stats cost model), and the
    chain references en 4x / es 3x / fr 2x, so inlining them
    re-evaluates the token filters per reference (CollapseProject
    declines to collapse multi-referenced non-cheap exprs only
    when they sit behind a projection boundary like this one;
    measured 0.75 -> 0.46 s at sf0.1)."""
    t = _tokens()
    hits = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        _hits(t, EN_STOP).alias("_en"),
        _hits(t, ES_STOP).alias("_es"),
        _hits(t, FR_STOP).alias("_fr"),
        _hits(t, DE_STOP).alias("_de"),
        F.length(
            F.regexp_replace(F.col("text"), "[^\\x{4e00}-\\x{9fff}]", "")
        ).alias("_zh"),
    )
    en, es, fr, de, zh = (F.col(c) for c in ("_en", "_es", "_fr", "_de", "_zh"))
    pred = (
        F.when(zh > 0, "zh")
        .when((en >= es) & (en >= fr) & (en >= de) & (en > 0), "en")
        .when((es >= fr) & (es >= de) & (es > 0), "es")
        .when((fr >= de) & (fr > 0), "fr")
        .when(de > 0, "de")
        .otherwise("unknown")
    )
    return (
        hits.select("doc_id", "lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling fingerprint: fold (h*31 + md5int(token))
    mod p over the token sequence, plus the md5 content hash."""
    t = _tokens()
    rolling = F.aggregate(
        t,
        F.lit(0).cast("bigint"),
        lambda acc, tok: (acc * 31 + md5_int(tok) % MOD) % MOD,
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        rolling.alias("rolling_fp"),
    )


def quality_thresholds(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Per-source quality-filter thresholds: p10/p50/p90 of the
    type-token ratio, the numbers a corpus pipeline turns into keep/
    drop cutoffs.  ``approx=False`` uses exact ``percentile`` (sorts
    each group's values — the oracle baseline); ``approx=True`` is the
    100 TB path: ``approx_percentile`` (t-digest-style sketch, partial
    +final merge, bounded memory per group, one shuffle of sketches
    instead of raw values).  A pytest bounds the approx error vs
    exact."""
    t = _tokens()
    ttr = (F.size(F.array_distinct(t)).cast("double") / F.size(t)).alias("ttr")
    pcts = [0.1, 0.5, 0.9]
    fn = F.percentile_approx if approx else F.percentile
    args = (F.col("ttr"), F.array(*[F.lit(p) for p in pcts]))
    if approx:
        args = args + (F.lit(10_000),)
    q = fn(*args)
    return (
        _docs(spark, sf_dir)
        .select("source", ttr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(q[0], 6).alias("p10"),
            F.round(q[1], 6).alias("p50"),
            F.round(q[2], 6).alias("p90"),
        )
    )


# PII scrubbing: the redaction pass a training corpus runs before
# release (the documents-table analog of the case-data redaction in
# clean.py P14/P15).  Pattern discipline: only constructs with
# IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB) — ASCII
# classes, bounded repetition, \b word boundaries — so the oracle can
# replay the scrub exactly.  Order matters (SSN before phone: both are
# digit-dash shapes); applied as a fixed chain.
PII_PATTERNS = [
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
]


def pii_scrub_expr(text: Column) -> tuple[Column, list[Column]]:
    """(scrubbed text, [per-kind match counts]) as pure JVM exprs —
    at 100 TB this is a map over the scan, zero shuffle."""
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(
            f"n_{kind}"
        )
        for kind, pat, _ in PII_PATTERNS
    ]
    scrubbed = text
    for _, pat, rep in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, rep)
    return scrubbed, counts


def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: deterministically INJECT pii-shaped strings into
    the synthetic docs (which contain none — verified digit-free),
    then scrub, so the oracle validates real redaction on every row:
    every even doc gets an SSN, every doc gets an email and a phone
    derived from doc_id."""
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" ssn 123-45-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    scrubbed, counts = pii_scrub_expr(injected)
    return _docs(spark, sf_dir).select(
        "doc_id", scrubbed.alias("clean_text"), *counts
    )


LM_VOCAB_K = 40  # top-K unigram model; tail tokens score as OOV


def unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram language-model quality score: fit a top-K
    unigram model on the corpus (token -> ln(count/N), deterministic
    top-K by count desc / token asc; out-of-vocabulary tokens get the
    smoothed ``ln(0.5/N)``), then score every document by the ordered
    left-fold of its per-token log-probs.  Low ``avg_logprob`` = the
    perplexity-style "looks nothing like the corpus" signal the CCNet
    / RedPajama quality buckets threshold on.

    Scale shape: the model fit is one explode + vocabulary-sized
    hash aggregate (map-side partial, one long per distinct token);
    the top-K table is BOUNDED by construction (``LM_VOCAB_K``) — at
    100 TB it is the trained LM artifact (a KenLM table) broadcast to
    executors, which is exactly what the bounded ``collect`` here
    stands in for.  Scoring is a pure map over the corpus: a map
    literal lookup + ``aggregate`` fold per row, zero shuffle, zero
    Python.

    Determinism contract: per-token log-probs are rounded to 6 places
    FIRST, so both engines fold bit-identical doubles in the same
    left-to-right order (Spark ``aggregate`` init 0.0 + x == x; DuckDB
    ``list_reduce`` over the same list) — the final sums are
    bit-identical before their own rounding.
    """
    import math

    docs = _docs(spark, sf_dir)
    t = _tokens()
    stats = (
        docs.select(F.explode(t).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_total = stats.agg(F.sum("cnt")).collect()[0][0]  # one scalar
    model = (
        stats.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(LM_VOCAB_K)
        .select(
            "tok",
            F.round(F.log(F.col("cnt") * F.lit(1.0) / F.lit(float(n_total))), 6).alias(
                "logp"
            ),
        )
        .collect()  # bounded: LM_VOCAB_K rows (the broadcast model)
    )
    pairs: list = []
    for row in model:
        pairs += [F.lit(row["tok"]), F.lit(float(row["logp"]))]
    m = F.create_map(*pairs)
    oov = round(math.log(0.5 / float(n_total)), 6)
    lp = lambda tk: F.coalesce(m[tk], F.lit(oov))  # noqa: E731
    score = F.aggregate(t, F.lit(0.0), lambda acc, tk: acc + lp(tk))
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.filter(t, lambda tk: m[tk].isNull())).alias("n_oov"),
        F.round(score, 6).alias("logprob"),
        F.round(score / F.size(t), 6).alias("avg_logprob"),
    )


# Gopher document-quality rule set (Rae et al. 2021, arXiv:2112.11446
# §A.1.1): published absolute thresholds, applied per document.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3, 10  # mean word length bounds
GOPHER_MIN_STOP = 2  # distinct stopwords required


def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-level quality rules with per-rule flags:
    word-count bounds, mean-word-length bounds, and the >=2-distinct-
    stopwords requirement (the repetition rules of the same paper are
    :func:`decontam.repetition_stats`).

    Float discipline: the mean-word-length RULE is evaluated as exact
    integer comparisons (``chars >= 3*n and chars <= 10*n``) so the
    keep decision can never flake on float rounding; the reported mean
    is a single division, rounded for display.  Zero shuffle — pure
    per-row array folds over the parquet scan; at 100 TB this is a
    map-only pass like the rest of this module."""
    t = _tokens()
    n = F.size(t)
    chars = F.aggregate(
        t, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    )
    stop_lits = F.array(*[F.lit(w) for w in EN_STOP])
    n_stop = F.size(
        F.array_distinct(F.filter(t, lambda w: F.array_contains(stop_lits, w)))
    )
    # stats projected ONCE: chars (a fold) is referenced by both mwl
    # bounds plus the display mean, n_stop (a HOF) by its flag and
    # keep — inlined they re-evaluate per reference (the lang_id /
    # repetition_stats interpreted-lambda cost model)
    stats = _docs(spark, sf_dir).select(
        "doc_id",
        n.alias("n_words"),
        chars.alias("_chars"),
        n_stop.alias("n_stop_distinct"),
    )
    nw = F.col("n_words")
    ch = F.col("_chars")
    ns = F.col("n_stop_distinct")
    pass_wc = (nw >= GOPHER_MIN_WORDS) & (nw <= GOPHER_MAX_WORDS)
    pass_mwl = (ch >= GOPHER_MIN_MWL * nw) & (ch <= GOPHER_MAX_MWL * nw)
    pass_stop = ns >= GOPHER_MIN_STOP
    return stats.select(
        "doc_id",
        "n_words",
        F.round(ch.cast("double") / nw, 6).alias("mean_word_len"),
        "n_stop_distinct",
        pass_wc.alias("pass_word_count"),
        pass_mwl.alias("pass_mean_word_len"),
        pass_stop.alias("pass_stopwords"),
        (pass_wc & pass_mwl & pass_stop).alias("keep"),
    )


def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020, the split
    RedPajama/CCNet release corpora by): per LANGUAGE, rank documents
    by the unigram-LM quality score and cut the ranking into equal
    thirds — head (most corpus-like) / middle / tail.  Downstream
    pipelines train on head+middle and drop or down-weight tail.

    Determinism: the cut uses ``ntile(3)`` over (avg_logprob DESC,
    doc_id) — pure integer rank arithmetic with a total order, so the
    bucket boundary can NEVER flake on float-threshold comparisons
    (the hazard an exact-percentile cut would carry); both engines
    compute identical tiles by construction.

    Scale shape: scoring is the zero-shuffle map of
    :func:`unigram_lm_score`; the cut is ONE shuffle on ``lang`` +
    per-partition sort.  Language skew (one dominant language) is the
    classic AQE-skew / two-stage-ntile territory; at CCNet scale the
    split runs per (lang, shard) with shard-merged boundaries — the
    per-lang window here is that operator's exact semantics."""
    scores = unigram_lm_score(spark, sf_dir).select("doc_id", "avg_logprob")
    langs = _docs(spark, sf_dir).select("doc_id", "lang")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    tile = F.ntile(3).over(w)
    return (
        langs.join(scores, "doc_id")
        .select(
            "doc_id",
            "lang",
            "avg_logprob",
            tile.alias("tile"),
        )
        .select(
            "doc_id",
            "lang",
            "avg_logprob",
            F.when(F.col("tile") == 1, F.lit("head"))
            .when(F.col("tile") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


LM2_VOCAB_K = 60  # top-K bigram model; the rest backs off
LM2_ALPHA = 0.4  # stupid-backoff discount (Brants et al., EMNLP 2007)
_SEP = "\x01"  # bigram map key separator (tokens are space-split)


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality score with STUPID BACKOFF — the web-scale LM
    scoring rule (Brants et al., "Large Language Models in Machine
    Translation", EMNLP 2007: at trillion-token scale an unnormalized
    count ratio with a constant 0.4 backoff matches Kneser-Ney):

        S(w2|w1) = c(w1,w2)/c(w1.)      if (w1,w2) in the top-K model
                 = 0.4 * c(w2)/N        else if w2 in the unigram model
                 = 0.4 * 0.5/N          else (OOV)

    where ``c(w1.)`` is the context count (bigrams starting w1).  A
    doc's score is the ordered left-fold of per-PAIR log-probs over
    its adjacent token pairs; ``avg_logprob`` divides by the pair
    count.  This is the conditional upgrade of
    :func:`unigram_lm_score` — repetitive or shuffled text that fools
    a unigram model (same token histogram) scores low here because
    the CONDITIONALS are wrong.

    Scale shape: the fit is one explode of adjacent pairs + a
    vocabulary-sized hash aggregate, with the context count as a
    bounded window over the aggregated pair table (NOT the corpus);
    both model tables are bounded by construction (top-K, the trained
    KenLM artifact a production pipeline broadcasts) — the collect
    here is that broadcast.  Scoring is a zero-shuffle map: two map
    literals + one ``aggregate`` fold per row, no Python.

    Determinism contract (same as unigram): per-pair log-probs are
    rounded to 6 places FIRST, fit divisions are single IEEE ops on
    exact integer counts, and ``0.4`` is DOUBLE-cast in the oracle
    (DuckDB parses the bare literal as DECIMAL).  One-token docs have
    no pairs: logprob 0.0, avg_logprob NULL on both sides.
    """
    import math

    docs = _docs(spark, sf_dir)
    t = _tokens()
    toks = docs.select(t.alias("ts")).filter(F.size("ts") >= 2)
    # adjacent pairs via two slices zipped — one pass, no positional join
    bg = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    from pyspark.sql import Window

    cnt2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx = Window.partitionBy("w1")
    model2 = (
        cnt2.withColumn("cw", F.sum("c").over(ctx))
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(LM2_VOCAB_K)
        .select(
            "w1",
            "w2",
            F.round(F.log(F.col("c") * F.lit(1.0) / F.col("cw")), 6).alias(
                "logp"
            ),
        )
        .collect()  # bounded: LM2_VOCAB_K rows (the broadcast model)
    )
    # unigram backoff table (same fit as unigram_lm_score, 0.4-discounted)
    stats = (
        docs.select(F.explode(t).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_total = stats.agg(F.sum("cnt")).collect()[0][0]
    model1 = (
        stats.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(LM_VOCAB_K)
        .select(
            "tok",
            F.round(
                F.log(
                    F.lit(LM2_ALPHA) * F.col("cnt") / F.lit(float(n_total))
                ),
                6,
            ).alias("blp"),
        )
        .collect()
    )
    pairs2: list = []
    for row in model2:
        pairs2 += [
            F.lit(row["w1"] + _SEP + row["w2"]),
            F.lit(float(row["logp"])),
        ]
    m2 = F.create_map(*pairs2)
    pairs1: list = []
    for row in model1:
        pairs1 += [F.lit(row["tok"]), F.lit(float(row["blp"]))]
    m1 = F.create_map(*pairs1)
    oov = round(math.log(LM2_ALPHA * 0.5 / float(n_total)), 6)
    # scoring: three projection boundaries so every HOF operates on a
    # BOUND column (the _shingles cost model — an inline expression
    # inside an interpreted lambda re-evaluates once per ELEMENT,
    # turning the fold O(len^2) in split work; measured 16 s -> ~1 s
    # at sf0.1 for this query).  The pair table (lookup key + backoff
    # token) is materialized once per row, then folded/filtered.
    ts = F.col("_ts")
    pair_t = "array<struct<k:string,w2:string>>"
    pairs_col = F.when(
        F.size(ts) >= 2,
        F.zip_with(
            F.slice(ts, 1, F.size(ts) - 1),
            F.slice(ts, 2, F.size(ts) - 1),
            lambda a, b: F.struct(F.concat_ws(_SEP, a, b).alias("k"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast(pair_t))
    base = docs.select("doc_id", t.alias("_ts"))
    paired = base.select("doc_id", F.size("_ts").alias("_n"), pairs_col.alias("_p"))
    p = F.col("_p")
    score = F.aggregate(
        p,
        F.lit(0.0),
        lambda acc, e: acc + F.coalesce(m2[e["k"]], m1[e["w2"]], F.lit(oov)),
    )
    hits = F.size(F.filter(p, lambda e: m2[e["k"]].isNotNull()))
    scored = paired.select("doc_id", "_n", score.alias("_s"), hits.alias("n_hits"))
    n_bg = F.greatest(F.col("_n") - 1, F.lit(0))
    return scored.select(
        "doc_id",
        n_bg.alias("n_bigrams"),
        "n_hits",
        F.round(F.col("_s"), 6).alias("logprob"),
        F.when(n_bg > 0, F.round(F.col("_s") / n_bg, 6)).alias("avg_logprob"),
    )


COLLOC_MIN_PAIR = 5  # ignore pairs seen fewer times (noise floor)
COLLOC_TOPK = 30


def collocation_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining: top-K adjacent word pairs by Dice
    coefficient — the classic embeddings-prep / phrase-detection pass
    (the association measure behind word2vec's phrase joining, Mikolov
    et al. 2013 use the same count-ratio family).

    Determinism: Dice = 2·c(a,b)/(c(a)+c(b)) needs no logarithm (PMI's
    ``ln`` is NOT correctly-rounded cross-engine; division is), and is
    computed here in exact integer MICRO-UNITS — ``(2·c_ab·10^6) div
    (c_a + c_b)`` — so the value and the (dice, pair) tiebreak order
    are bit-identical on both engines.

    Scale shape: two linear explode+count shuffles (pair counts,
    unigram counts); the unigram table is Zipf-bounded vocabulary
    (same argument as the BPE trainer) so its two joins into the pair
    table broadcast at cluster scale; top-K is a global rank-limit
    (TopK physical op, no full sort)."""
    docs = _docs(spark, sf_dir)
    t = _tokens()
    pair_t = "array<struct<pa:string,pb:string>>"
    pairs_col = F.when(
        F.size(F.col("_ts")) >= 2,
        F.zip_with(
            F.slice(F.col("_ts"), 1, F.size(F.col("_ts")) - 1),
            F.slice(F.col("_ts"), 2, F.size(F.col("_ts")) - 1),
            lambda a, b: F.struct(
                F.least(a, b).alias("pa"), F.greatest(a, b).alias("pb")
            ),
        ),
    ).otherwise(F.array().cast(pair_t))
    pairs = (
        docs.select(t.alias("_ts"))
        .select(F.explode(pairs_col).alias("p"))
        .filter(F.col("p.pa") != F.col("p.pb"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= COLLOC_MIN_PAIR)
    )
    uni = (
        docs.select(F.explode(t).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        # pin: the vocab-sized unigram table feeds BOTH join sides —
        # unpinned, each side re-derives the full corpus explode+agg
        # (3 parquet scans for this query; pinned: 2)
        .localCheckpoint(eager=False)
    )
    ua = uni.select(F.col("w").alias("pa"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("pb"), F.col("c").alias("c_b"))
    return (
        pairs.join(ua, "pa")
        .join(ub, "pb")
        .select(
            "pa",
            "pb",
            "c_ab",
            "c_a",
            "c_b",
            F.expr("(2 * c_ab * 1000000) div (c_a + c_b)").alias("dice_micro"),
        )
        .orderBy(F.desc("dice_micro"), "pa", "pb")
        .limit(COLLOC_TOPK)
    )


QUERIES = {
    "token_stats": token_stats,
    "gopher_quality_filters": gopher_quality_filters,
    "quality_thresholds": quality_thresholds,
    "quality_score": quality_score,
    "lang_id": lang_id,
    "doc_fingerprint": doc_fingerprint,
    "pii_scrub_docs": pii_scrub_docs,
    "unigram_lm_score": unigram_lm_score,
    "ccnet_buckets": ccnet_buckets,
    "bigram_lm_score": bigram_lm_score,
    "collocation_topk": collocation_topk,
}

_SQL_TOKENS = "string_split(lower(text), ' ')"


def _sql_hits(words: list[str]) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({_SQL_TOKENS}, t -> list_contains({arr}, t)))"


_SQL_STOP_DISTINCT = (
    "len(list_distinct(list_filter({toks}, t -> list_contains({arr}, t))))"
)

LM_SCORES_SQL = f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
        cnts AS (
            SELECT u.tok, count(*) AS cnt
            FROM t, unnest(ts) AS u(tok) GROUP BY u.tok
        ),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cnts),
        model AS (
            SELECT tok,
                   round(ln(cnt * 1.0 / (SELECT n FROM tot)), 6) AS logp
            FROM cnts ORDER BY cnt DESC, tok ASC LIMIT {LM_VOCAB_K}
        ),
        toks AS (
            SELECT t.doc_id, g.i AS ord, t.ts[g.i] AS tok
            FROM t, unnest(generate_series(1, len(ts))) AS g(i)
        ),
        scored AS (
            SELECT k.doc_id, k.ord,
                   coalesce(m.logp,
                            round(ln(0.5 / (SELECT n FROM tot)), 6)) AS lp,
                   CASE WHEN m.tok IS NULL THEN 1 ELSE 0 END AS is_oov
            FROM toks k LEFT JOIN model m ON m.tok = k.tok
        )
        SELECT doc_id, n_tokens, n_oov,
               round(s, 6) AS logprob,
               round(s / n_tokens, 6) AS avg_logprob
        FROM (
            SELECT doc_id,
                   count(*) AS n_tokens,
                   CAST(sum(is_oov) AS INT) AS n_oov,
                   list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                                    list(lp ORDER BY ord)),
                       (a, b) -> a + b) AS s
            FROM scored GROUP BY doc_id
        )
"""


ORACLE_SQL = {
    "collocation_topk": f"""
        WITH toks AS (
            SELECT {_SQL_TOKENS} AS ts FROM documents
        ),
        bi AS (
            SELECT least(ts[i], ts[i + 1]) AS pa,
                   greatest(ts[i], ts[i + 1]) AS pb
            FROM toks, unnest(range(1, len(ts))) u(i)
            WHERE ts[i] <> ts[i + 1]
        ),
        pc AS (
            SELECT pa, pb, CAST(count(*) AS BIGINT) AS c_ab
            FROM bi GROUP BY 1, 2
            HAVING count(*) >= {COLLOC_MIN_PAIR}
        ),
        uni AS (
            SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT unnest(ts) AS w FROM toks
            ) GROUP BY 1
        )
        SELECT pc.pa, pc.pb, pc.c_ab,
               ua.c AS c_a, ub.c AS c_b,
               CAST((2 * pc.c_ab * 1000000) // (ua.c + ub.c) AS BIGINT)
                   AS dice_micro
        FROM pc JOIN uni ua ON pc.pa = ua.w
                JOIN uni ub ON pc.pb = ub.w
        ORDER BY dice_micro DESC, pc.pa, pc.pb
        LIMIT {COLLOC_TOPK}
    """,
    "gopher_quality_filters": f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(len({_SQL_TOKENS}) AS INT) AS n_words,
                   CAST(list_sum(list_transform({_SQL_TOKENS},
                                                w -> len(w))) AS BIGINT)
                       AS chars,
                   CAST({_SQL_STOP_DISTINCT.format(
                       toks=_SQL_TOKENS,
                       arr="[" + ",".join(f"'{w}'" for w in EN_STOP) + "]",
                   )} AS INT) AS n_stop_distinct
            FROM documents
        )
        SELECT doc_id, n_words,
               round(chars * 1.0 / n_words, 6) AS mean_word_len,
               n_stop_distinct,
               (n_words >= {GOPHER_MIN_WORDS}
                AND n_words <= {GOPHER_MAX_WORDS}) AS pass_word_count,
               (chars >= {GOPHER_MIN_MWL} * n_words
                AND chars <= {GOPHER_MAX_MWL} * n_words)
                   AS pass_mean_word_len,
               (n_stop_distinct >= {GOPHER_MIN_STOP}) AS pass_stopwords,
               ((n_words >= {GOPHER_MIN_WORDS}
                 AND n_words <= {GOPHER_MAX_WORDS})
                AND (chars >= {GOPHER_MIN_MWL} * n_words
                     AND chars <= {GOPHER_MAX_MWL} * n_words)
                AND n_stop_distinct >= {GOPHER_MIN_STOP}) AS keep
        FROM d
    """,
    "quality_thresholds": f"""
        WITH q AS (
            SELECT source,
                   len(list_distinct({_SQL_TOKENS})) * 1.0
                       / len({_SQL_TOKENS}) AS ttr
            FROM documents
        )
        SELECT source,
               count(*) AS n,
               round(quantile_cont(ttr, 0.1), 6) AS p10,
               round(quantile_cont(ttr, 0.5), 6) AS p50,
               round(quantile_cont(ttr, 0.9), 6) AS p90
        FROM q GROUP BY source
    """,
    "token_stats": f"""
        SELECT doc_id,
               len({_SQL_TOKENS}) AS n_tokens,
               len(list_distinct({_SQL_TOKENS})) AS n_unique_tokens,
               length(text) AS n_chars_engine,
               len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))
                   AS n_bpeish_tokens
        FROM documents
    """,
    "quality_score": f"""
        SELECT doc_id,
               round(len(list_distinct({_SQL_TOKENS})) * 1.0
                     / len({_SQL_TOKENS}), 6) AS type_token_ratio,
               round({_sql_hits(EN_STOP)} * 1.0 / len({_SQL_TOKENS}), 6)
                   AS stopword_ratio,
               round(least(len({_SQL_TOKENS}) / 100.0, 1.0)
                     * (len(list_distinct({_SQL_TOKENS})) * 1.0
                        / len({_SQL_TOKENS})), 6) AS quality
        FROM documents
    """,
    "lang_id": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_sql_hits(EN_STOP)} AS en, {_sql_hits(ES_STOP)} AS es,
                   {_sql_hits(FR_STOP)} AS fr, {_sql_hits(DE_STOP)} AS de,
                   length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]',
                          '', 'g')) AS zh
            FROM documents
        )
        SELECT lang,
               CASE WHEN zh > 0 THEN 'zh'
                    WHEN en >= es AND en >= fr AND en >= de AND en > 0 THEN 'en'
                    WHEN es >= fr AND es >= de AND es > 0 THEN 'es'
                    WHEN fr >= de AND fr > 0 THEN 'fr'
                    WHEN de > 0 THEN 'de'
                    ELSE 'unknown' END AS lang_pred,
               count(*) AS n
        FROM scored GROUP BY 1, 2
    """,
    "doc_fingerprint": f"""
        SELECT doc_id,
               md5(text) AS content_md5,
               list_reduce(
                   list_prepend(0::BIGINT,
                       list_transform({_SQL_TOKENS},
                           t -> ('0x' || left(md5(t), 15))::BIGINT
                                % 1000000007)),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_fp
        FROM documents
    """,
    # exact replay of the LM fit + ordered-fold scoring: same top-K
    # selection (cnt desc, tok asc), same 6-place per-token rounding
    # BEFORE the fold, same left-fold order (list_reduce with a 0.0
    # head == Spark aggregate's 0.0 init) -> bit-identical sums
    "unigram_lm_score": LM_SCORES_SQL,
    # stupid-backoff bigram LM: exact replay of the fit (pair counts,
    # window context counts, deterministic top-K) and the scoring fold.
    # CAST(0.4 AS DOUBLE): DuckDB parses the bare literal as DECIMAL
    "bigram_lm_score": f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
        bg AS (
            SELECT t.doc_id, g.i AS ord, ts[g.i] AS w1, ts[g.i + 1] AS w2
            FROM t, unnest(generate_series(1, len(ts) - 1)) AS g(i)
            WHERE len(ts) >= 2
        ),
        cnt2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
        model2 AS (
            SELECT w1, w2,
                   round(ln(c * 1.0 / (CAST(sum(c) OVER (PARTITION BY w1)
                                       AS BIGINT))), 6) AS logp
            FROM cnt2
            ORDER BY c DESC, w1 ASC, w2 ASC LIMIT {LM2_VOCAB_K}
        ),
        cnts AS (
            SELECT u.tok, count(*) AS cnt
            FROM t, unnest(ts) AS u(tok) GROUP BY u.tok
        ),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cnts),
        model1 AS (
            SELECT tok,
                   round(ln(CAST({LM2_ALPHA} AS DOUBLE) * cnt
                            / (SELECT n FROM tot)), 6) AS blp
            FROM cnts ORDER BY cnt DESC, tok ASC LIMIT {LM_VOCAB_K}
        ),
        scored AS (
            SELECT bg.doc_id, bg.ord,
                   coalesce(m2.logp, m1.blp,
                            round(ln(CAST({LM2_ALPHA} AS DOUBLE) * 0.5
                                     / (SELECT n FROM tot)), 6)) AS lp,
                   CASE WHEN m2.logp IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM bg
            LEFT JOIN model2 m2 ON m2.w1 = bg.w1 AND m2.w2 = bg.w2
            LEFT JOIN model1 m1 ON m1.tok = bg.w2
        ),
        agg AS (
            SELECT doc_id, count(*) AS nb, CAST(sum(hit) AS INT) AS n_hits,
                   list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                                    list(lp ORDER BY ord)),
                       (a, b) -> a + b) AS s
            FROM scored GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(greatest(len(ts) - 1, 0) AS INT) AS n_bigrams,
               CAST(coalesce(agg.n_hits, 0) AS INT) AS n_hits,
               round(coalesce(agg.s, 0.0), 6) AS logprob,
               CASE WHEN agg.nb > 0 THEN round(agg.s / agg.nb, 6)
                    ELSE NULL END AS avg_logprob
        FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id
    """,
    "ccnet_buckets": f"""
        WITH lm AS ({{LM}}),
        cut AS (
            SELECT d.doc_id, d.lang, lm.avg_logprob,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY lm.avg_logprob DESC,
                                           d.doc_id) AS tile
            FROM documents d JOIN lm ON lm.doc_id = d.doc_id
        )
        SELECT doc_id, lang, avg_logprob,
               CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                         ELSE 'tail' END AS bucket
        FROM cut
    """.format(LM=LM_SCORES_SQL),
    # exact replay of the injection + scrub chain; counts measured on
    # the injected text BEFORE scrubbing, 'g' = replace ALL matches
    # (Spark's regexp_replace default)
    "pii_scrub_docs": f"""
        WITH inj AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id::VARCHAR
                        || '@mail.example.com or 555-'
                        || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
                        || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                        || CASE WHEN doc_id % 2 = 0
                                THEN ' ssn 123-45-'
                                     || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                                ELSE '' END AS t
            FROM documents
        )
        SELECT doc_id,
               {" ".join(
                   f"regexp_replace(" for _ in PII_PATTERNS
               )}t{"".join(
                   f", '{pat}', '{rep}', 'g')"
                   for _, pat, rep in PII_PATTERNS
               )} AS clean_text,
               {", ".join(
                   f"CAST(len(regexp_extract_all(t, '{pat}')) AS INT)"
                   f" AS n_{kind}"
                   for kind, pat, _ in PII_PATTERNS
               )}
        FROM inj
    """,
}
