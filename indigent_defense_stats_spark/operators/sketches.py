"""Mergeable sketches: count-min heavy hitters and an HLL register table.

:func:`cms_heavy_hitters` — the frequent-items primitive a corpus
pipeline runs before building stopword lists, boilerplate filters, or
tokenizer vocabularies (the reference's charge-name frequency scan,
SURVEY.md §2 A2/P13 family, generalized to corpus scale): find every
token whose count is at least ``N / HH_DEN`` of the corpus total, and
probe each one against a count-min sketch (Cormode & Muthukrishnan,
J. Algorithms 2005) built over the same stream.

Why a sketch at 100 TB: the exact per-token aggregate is linear and
map-side-combinable, but its output is vocabulary-sized — fine to
SHUFFLE, too big to BROADCAST, impossible to keep per-stream in a
streaming/merge setting.  The CMS is the fixed-memory mergeable
summary (``CMS_D x CMS_W`` cells = 1,024 longs here): cell arrays
from independent waves/partitions ADD, so at production scale each
crawl wave maintains its own sketch and the coordinator folds them —
the same mergeability contract as the HLL cardinality sketch
(operators/relational.py ``approx_count_distinct`` pin).

Engine shape: exact token counts (one linear shuffle, map-side
combine) feed BOTH the heavy-hitter filter and the sketch build —
building cells from (token, cnt) instead of re-exploding the corpus
makes the sketch a vocabulary-sized aggregate, and the probe join
broadcasts the 1,024-cell table.  Total-count ``N`` is a single row
broadcast back via crossJoin (bounded, same idiom as
relational.stats_orders).

Correctness contract (oracle-checked, not just "looks plausible"):
``cnt <= cms_est`` always (every occurrence lands in every row's
cell), and the DuckDB oracle replays the ENTIRE sketch — hash family,
cell sums, min-over-rows probe — so the estimates match bit for bit.
A pytest additionally bounds the overestimate by the CMS epsilon
(e*N/CMS_W per row, so the min is within that w.h.p.).

Hash family: the portable 60-bit md5 integer (textstats.md5_int) of
``"<row>:<token>"`` mod ``CMS_W`` — cross-engine by construction; no
engine-private hash (Spark xxhash64 / DuckDB hash) can appear in an
oracle-checked query.

:func:`hll_distinct` — the companion CARDINALITY sketch: a
HyperLogLog-style register table (Flajolet et al., AofA 2007) over
``events.user_id`` per event_type, reported next to the exact
distinct count.  Where the CMS answers "how often", HLL answers "how
many distinct" in O(m) mergeable state: per-wave/per-partition
register tables fold by element-wise MAX, so a 1000-executor crawl
tracks distinct users/URLs per stream with 64 longs per group instead
of shuffling every key (the exact ``countDistinct`` is a full shuffle
of the key universe — fine at sf0.1, not at 100 TB).  Spark's native
``approx_count_distinct`` is the production form (relational.py pins
it against exact); this operator makes the register mechanics
oracle-checkable bit for bit, which the native HLL++ (engine-private
hash) cannot be.

Cross-engine determinism of :func:`hll_distinct`, term by term:
register index = 60-bit md5 int mod 64; rank rho = 1 + trailing zeros
of the remaining 54-bit suffix (the Flajolet-Martin geometric
observable, computed as ``bit_count((suffix & -suffix) - 1)`` — pure
bit math with identical two's-complement semantics in both engines,
no log2, whose libm rounding differs across engines);
the harmonic sum is kept EXACT by scaling 2^-rho by 2^55 so every
term is an integer (sum(2^(55-rho)) + 2^55 per empty register, max
2^61 < BIGINT); the final estimate is alpha_64*4096*2^55 / S — ONE
IEEE division of a shared decimal literal by an exact integer, hence
bit-identical in Spark and DuckDB.  The small-range (linear-counting)
correction m*ln(m/V) would need ln(), another libm divergence — but V
(empty registers) takes only 64 possible values, so the 64 corrected
estimates are PRECOMPUTED here and embedded as one shared literal
lookup in both engines: full HLL semantics, zero runtime libm.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .textstats import _docs, _tokens, md5_int

CMS_D = 4  # hash rows
CMS_W = 256  # cells per row
HH_DEN = 500  # heavy hitter: cnt * HH_DEN >= total tokens


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _bucket(row: F.Column, token: F.Column) -> F.Column:
    return md5_int(F.concat(row.cast("string"), F.lit(":"), token)) % CMS_W


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, cnt, cms_est) for every token with
    ``cnt * HH_DEN >= N``; ``cms_est`` = min over the CMS_D sketch
    rows of the cell the token hashes to."""
    tc = _token_counts(spark, sf_dir)
    rows = F.explode(F.array(*[F.lit(d) for d in range(CMS_D)])).alias("d")
    # sketch build: vocabulary-sized input -> CMS_D*CMS_W cells
    cells = (
        tc.select(rows, "token", "cnt")
        .select("d", _bucket(F.col("d"), F.col("token")).alias("bucket"), "cnt")
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cell"))
    )
    total = tc.agg(F.sum("cnt").alias("n"))
    hh = tc.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") * HH_DEN >= F.col("n")
    )
    probe = hh.select(
        "token", "cnt", rows
    ).withColumn("bucket", _bucket(F.col("d"), F.col("token")))
    return (
        probe.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("token", "cnt")
        .agg(F.min("cell").cast("long").alias("cms_est"))
    )


HLL_M = 64  # registers (p = 6 index bits)
HLL_SUFFIX_BITS = 54  # 60-bit md5 int minus the 6 index bits
_HLL_RHO_MAX = HLL_SUFFIX_BITS + 1
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha_m * m^2 * 2^55: numerator of the scaled-integer harmonic mean.
# A decimal literal shared verbatim with the oracle SQL, so both
# engines parse the identical double and the estimate is ONE division.
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << (_HLL_RHO_MAX))
# linear-counting table: entry V (1-indexed) = m * ln(m / V), the
# small-range estimate when V registers are empty.  Computed once
# HERE and shared verbatim with the oracle SQL -> no libm at query
# time, so the corrected estimate stays bit-identical cross-engine.
_HLL_LC = [HLL_M * math.log(HLL_M / v) for v in range(1, HLL_M + 1)]
_HLL_SMALL = 2.5 * HLL_M  # apply linear counting below this raw est


def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, reg, mj): the mergeable HLL state — max rank per
    register.  Partial tables from disjoint row sets fold by
    element-wise max (pinned by pytest); this is the object a per-wave
    crawl metric would checkpoint and the coordinator would merge."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = md5_int(F.col("user_id").cast("string"))
    # rho = 1 + trailing zeros of the 54-bit suffix, via pure bit math
    # that whole-stage-codegens (an interpreted 54-element HOF filter
    # here cost 6.3 s at sf0.1; this form is ~60x cheaper):
    # suffix & -suffix isolates the lowest set bit, bit_count(t - 1)
    # counts the zeros below it; suffix = 0 gives bit_count(-1) = 64,
    # capped to the 55 both engines agree on (verified identical
    # two's-complement semantics in Spark and DuckDB).
    rho = F.expr("least(1 + bit_count((suffix & -suffix) - 1), 55)")
    return (
        ev.select(
            "event_type",
            (h % HLL_M).alias("reg"),
            F.shiftright(h, 6).alias("suffix"),
        )
        .select("event_type", "reg", rho.alias("rho"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").cast("long").alias("mj"))
    )


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, exact_distinct, registers_hit, hll_est): HLL
    estimate of distinct user_id per event_type next to the exact
    count.  The raw estimate is alpha*m^2 / sum(2^-Mj) with empty
    registers contributing 2^0; the sum is carried as the exact
    integer 2^55 * sum(2^-Mj) so only the final division rounds.
    Below 2.5m the linear-counting correction m*ln(m/V) applies, read
    from the precomputed 64-entry table (V = empty registers)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = hll_registers(spark, sf_dir).groupBy("event_type").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - mj)")
        ).alias("hit_sum"),
        F.count(F.lit(1)).cast("long").alias("registers_hit"),
    )
    scaled = per.select(
        "event_type",
        "registers_hit",
        (
            F.col("hit_sum")
            + (F.lit(HLL_M).cast("long") - F.col("registers_hit"))
            * F.lit(1 << _HLL_RHO_MAX).cast("long")
        ).alias("s_scaled"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    raw = F.lit(_HLL_NUM) / F.col("s_scaled")
    lc = F.element_at(
        F.array(*[F.lit(x) for x in _HLL_LC]),
        (F.lit(HLL_M).cast("int") - F.col("registers_hit").cast("int")),
    )
    est = F.when(
        (raw <= F.lit(_HLL_SMALL)) & (F.col("registers_hit") < HLL_M), lc
    ).otherwise(raw)
    return exact.join(scaled, "event_type").select(
        "event_type",
        "exact_distinct",
        "registers_hit",
        est.alias("hll_est"),
    )


BK_K = 128  # bottom-k sample size per group
BK_QS = (0.5, 0.9)  # quantiles reported by the sketch


def _bk_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.select(
        F.col("o_orderpriority").alias("grp"),
        md5_int(F.col("o_orderkey").cast("string")).alias("h"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v"),
    )


def bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grp, s): the per-group bottom-``BK_K``-by-hash sample — the
    KMV/bottom-k mergeable sketch state (Bar-Yossef et al. RANDOM'02;
    Cohen & Kaplan PODS'07).  Built in the MERGE shape itself: each
    input partition reduces to its own bottom-k (partial aggregate,
    map-side), and the per-group merge takes the bottom-k of the
    concatenated partials — bottom-k of a union is the bottom-k of
    merged bottom-ks, so the result is independent of partitioning
    (pinned by pytest against the single-window form and under a
    hostile repartition).  At 100 TB this is the only quantile state a
    1000-executor job ships: K structs per (group, partition), never
    the value universe."""
    base = _bk_base(spark, sf_dir)
    part = (
        base.groupBy("grp", F.spark_partition_id().alias("p"))
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("h", "k", "v"))),
                1,
                BK_K,
            ).alias("s")
        )
    )
    return (
        part.select("grp", F.explode("s").alias("s"))
        .groupBy("grp")
        .agg(
            F.slice(F.array_sort(F.collect_list("s")), 1, BK_K).alias("s")
        )
    )


def bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from the bottom-k sketch next to the exact
    quantiles: per ``o_orderpriority``, estimate p50/p90 of
    ``o_totalprice`` from the ``BK_K``-row hash-bottom sample and
    report the exact interpolated quantiles beside them.

    Completes the mergeable-sketch trio: CMS = frequency, HLL =
    cardinality, bottom-k = quantiles/order statistics (it doubles as
    a distinct-count KMV, but here it feeds the quantile estimator a
    t-digest would serve in production — ``quality_thresholds`` pins
    Spark's native ``approx_percentile`` for that form; this one is
    oracle-checkable bit for bit because the sample membership and the
    interpolation arithmetic are deterministic).

    Cross-engine float discipline: both engines interpolate with the
    IDENTICAL expression ``v_lo + (q*(n-1) - floor(q*(n-1))) *
    (v_hi - v_lo)`` on doubles — the oracle casts the quantile
    literals to DOUBLE because DuckDB would otherwise parse ``0.9`` as
    DECIMAL and compute an exact 114.3 where double math gives
    114.30000000000001, flipping the low bits of the estimate.  The
    exact side sorts each whole group (the full-shuffle baseline the
    sketch replaces); the sample side touches K structs per group.
    """
    m = bottomk_sample(spark, sf_dir)
    vals = F.array_sort(F.transform(F.col("s"), lambda x: x["v"]))
    m = m.select("grp", F.size("s").cast("int").alias("k_used"), vals.alias("vals"))

    def interp(arr: F.Column, n: F.Column, q: float) -> F.Column:
        pos = F.lit(q) * (n - 1).cast("double")
        lo = F.floor(pos)
        frac = pos - lo.cast("double")
        vlo = F.element_at(arr, (lo + 1).cast("int"))
        vhi = F.element_at(
            arr, F.least(lo + 2, n.cast("bigint")).cast("int")
        )
        return vlo + frac * (vhi - vlo)

    est = m.select(
        "grp",
        "k_used",
        interp(F.col("vals"), F.col("k_used"), 0.5).alias("est_p50"),
        interp(F.col("vals"), F.col("k_used"), 0.9).alias("est_p90"),
    )

    from pyspark.sql import Window

    base = _bk_base(spark, sf_dir)
    wv = Window.partitionBy("grp").orderBy("v", "k")
    wn = Window.partitionBy("grp")
    r = base.select(
        "grp",
        "v",
        (F.row_number().over(wv) - 1).cast("bigint").alias("i"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )

    def pick(q: float, hi: bool) -> F.Column:
        lo = F.floor(F.lit(q) * (F.col("n") - 1).cast("double"))
        tgt = F.least(lo + 1, F.col("n") - 1) if hi else lo
        return F.max(F.when(F.col("i") == tgt, F.col("v")))

    exact = r.groupBy("grp").agg(
        F.max("n").alias("n"),
        pick(0.5, False).alias("lo50"),
        pick(0.5, True).alias("hi50"),
        pick(0.9, False).alias("lo90"),
        pick(0.9, True).alias("hi90"),
    )

    def efrac(q: float) -> F.Column:
        pos = F.lit(q) * (F.col("n") - 1).cast("double")
        return pos - F.floor(pos).cast("double")

    exact = exact.select(
        "grp",
        "n",
        (F.col("lo50") + efrac(0.5) * (F.col("hi50") - F.col("lo50"))).alias(
            "exact_p50"
        ),
        (F.col("lo90") + efrac(0.9) * (F.col("hi90") - F.col("lo90"))).alias(
            "exact_p90"
        ),
    )
    return exact.join(est, "grp").select(
        F.col("grp").alias("o_orderpriority"),
        "n",
        "k_used",
        "exact_p50",
        "est_p50",
        "exact_p90",
        "est_p90",
    )


HLL_WIN = 3  # rolling window, days


def hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users via HLL register MERGE — the
    temporal form of the sketch's mergeability contract: per-day
    register tables fold into a 3-day rolling estimate with ONE
    element-wise max per register (a RANGE-frame window), no re-scan
    of the raw events per window.  This is how a crawl/production
    metric pipeline answers "distinct users/URLs in the trailing N
    days" at 100 TB: daily sketches are O(m) each, the rolling merge
    is O(days x m) — independent of event volume — where the exact
    rolling countDistinct re-shuffles the full key universe per
    window.  The exact answer is computed alongside (day-dim
    broadcast range join) as the oracle-checked accuracy reference.

    Determinism: identical register/rho/estimate machinery as
    :func:`hll_distinct` (exact integers + one shared-literal IEEE
    division + precomputed linear-counting table); gap days inside a
    window contribute nothing on both engines (max ignores NULL).
    """
    from pyspark.sql import Window

    from ..functions.epochs import epoch_floor_s

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = F.floor(epoch_floor_s(F.col("ts")) / 86400).cast("long")
    h = md5_int(F.col("user_id").cast("string"))
    rho = F.expr("least(1 + bit_count((suffix & -suffix) - 1), 55)")
    daily = (
        ev.select(
            day.alias("d"),
            (h % HLL_M).alias("reg"),
            F.shiftright(h, 6).alias("suffix"),
        )
        .select("d", "reg", rho.alias("rho"))
        .groupBy("d", "reg")
        .agg(F.max("rho").cast("long").alias("mj"))
        .localCheckpoint(eager=False)
    )
    dmin, dmax = daily.agg(F.min("d"), F.max("d")).first()
    days = spark.range(1).select(
        F.explode(F.sequence(F.lit(dmin), F.lit(dmax))).alias("d")
    )
    scaffold = days.select(
        "d", F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("reg")
    )
    joined = scaffold.join(daily, ["d", "reg"], "left")
    w = (
        Window.partitionBy("reg")
        .orderBy("d")
        .rangeBetween(-(HLL_WIN - 1), 0)
    )
    rm = joined.select("d", "reg", F.max("mj").over(w).alias("rmj"))
    per = rm.groupBy("d").agg(
        F.sum(
            F.when(
                F.col("rmj").isNotNull(),
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - rmj)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("hit_sum"),
        F.count("rmj").cast("long").alias("registers_hit"),
    )
    s_scaled = (
        F.col("hit_sum")
        + (F.lit(HLL_M).cast("long") - F.col("registers_hit"))
        * F.lit(1 << _HLL_RHO_MAX).cast("long")
    )
    raw = F.lit(_HLL_NUM) / s_scaled
    lc = F.element_at(
        F.array(*[F.lit(x) for x in _HLL_LC]),
        (F.lit(HLL_M).cast("int") - F.col("registers_hit").cast("int")),
    )
    est = F.when(
        (raw <= F.lit(_HLL_SMALL)) & (F.col("registers_hit") < HLL_M), lc
    ).otherwise(raw)
    # exact reference: range join with the DAY DIM broadcast (events
    # side streams — the only scale-correct orientation), then a left
    # join back to the scaffold so empty windows report 0
    hits3 = (
        ev.select(day.alias("ed"), "user_id")
        .join(
            F.broadcast(days),
            F.col("ed").between(F.col("d") - (HLL_WIN - 1), F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_3d"))
    )
    exact = days.join(hits3, "d", "left").select(
        "d", F.coalesce("exact_3d", F.lit(0).cast("long")).alias("exact_3d")
    )
    return (
        per.join(exact, "d")
        .select(
            F.col("d").alias("epoch_day"),
            "registers_hit",
            est.alias("hll_est"),
            "exact_3d",
        )
    )


def _hll_est_over(per: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., registers_hit, e) from a (keys..., reg, mj) register
    table — the shared estimate chain (exact-integer harmonic sum, one
    shared-literal division, precomputed linear-counting lookup)."""
    agg = per.groupBy(*keys).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - mj)")
        ).alias("hit_sum"),
        F.count(F.lit(1)).cast("long").alias("registers_hit"),
    )
    s_scaled = (
        F.col("hit_sum")
        + (F.lit(HLL_M).cast("long") - F.col("registers_hit"))
        * F.lit(1 << _HLL_RHO_MAX).cast("long")
    )
    raw = F.lit(_HLL_NUM) / s_scaled
    lc = F.element_at(
        F.array(*[F.lit(x) for x in _HLL_LC]),
        (F.lit(HLL_M).cast("int") - F.col("registers_hit").cast("int")),
    )
    est = F.when(
        (raw <= F.lit(_HLL_SMALL)) & (F.col("registers_hit") < HLL_M), lc
    ).otherwise(raw)
    return agg.select(*keys, "registers_hit", est.alias("e"))


def hll_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user OVERLAP between event-type pairs via HLL set
    algebra: |A n B| ~ est(A) + est(B) - est(A u B), with est(A u B)
    from the element-wise MAX merge of the two register tables — no
    rescan of either side.  This inclusion-exclusion identity is how
    sketch-carrying systems estimate join/intersection cardinalities
    for planning (the HLL union is exact-on-registers; only the
    intersection goes through subtraction).  The exact intersection is
    computed alongside as the accuracy reference.

    Scale: register tables are O(m) per group — the pairing is
    group-dim-sized, never data-sized; the exact side (distinct pair
    self-join) is the expensive baseline the sketch replaces.
    """
    regs = hll_registers(spark, sf_dir).localCheckpoint(eager=False)
    types = regs.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    singles = _hll_est_over(regs, ["event_type"])
    pr = pairs.join(
        regs,
        (F.col("event_type") == F.col("ta"))
        | (F.col("event_type") == F.col("tb")),
    ).groupBy("ta", "tb", "reg").agg(F.max("mj").cast("long").alias("mj"))
    unions = _hll_est_over(pr, ["ta", "tb"])
    ea = singles.select(
        F.col("event_type").alias("ta"), F.col("e").alias("e_a")
    )
    eb = singles.select(
        F.col("event_type").alias("tb"), F.col("e").alias("e_b")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    du = ev.select("event_type", "user_id").distinct().localCheckpoint(
        eager=False
    )
    exact = (
        du.select(F.col("event_type").alias("ta"), "user_id")
        .join(
            du.select(F.col("event_type").alias("tb"), "user_id"),
            "user_id",
        )
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )
    out = (
        unions.select("ta", "tb", F.col("e").alias("e_union"))
        .join(ea, "ta")
        .join(eb, "tb")
        .join(exact, ["ta", "tb"], "left")
    )
    return out.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.round("e_a", 6).alias("est_a"),
        F.round("e_b", 6).alias("est_b"),
        F.round("e_union", 6).alias("est_union"),
        F.round(
            F.col("e_a") + F.col("e_b") - F.col("e_union"), 6
        ).alias("est_overlap"),
        F.coalesce("exact_overlap", F.lit(0).cast("long")).alias(
            "exact_overlap"
        ),
    )


QUERIES = {
    "cms_heavy_hitters": cms_heavy_hitters,
    "hll_distinct": hll_distinct,
    "hll_rolling_distinct": hll_rolling_distinct,
    "hll_overlap_estimate": hll_overlap_estimate,
    "bottomk_quantiles": bottomk_quantiles,
}

_SQL_TOKENS = "string_split(lower(text), ' ')"
_MD5 = "('0x' || left(md5({0}), 15))::BIGINT"

ORACLE_SQL = {
    "cms_heavy_hitters": f"""
        WITH tc AS (
            SELECT t.tok AS token, count(*)::BIGINT AS cnt
            FROM documents, unnest({_SQL_TOKENS}) AS t(tok)
            GROUP BY 1
        ),
        tot AS (SELECT sum(cnt)::BIGINT AS n FROM tc),
        rows_d AS (SELECT unnest(range({CMS_D})) AS d),
        cells AS (
            SELECT d,
                   {_MD5.format("d::VARCHAR || ':' || token")} % {CMS_W}
                       AS bucket,
                   sum(cnt)::BIGINT AS cell
            FROM tc CROSS JOIN rows_d
            GROUP BY 1, 2
        ),
        hh AS (
            SELECT token, cnt FROM tc CROSS JOIN tot
            WHERE cnt * {HH_DEN} >= tot.n
        ),
        probe AS (
            SELECT token, cnt, d,
                   {_MD5.format("d::VARCHAR || ':' || token")} % {CMS_W}
                       AS bucket
            FROM hh CROSS JOIN rows_d
        )
        SELECT p.token, p.cnt, CAST(min(c.cell) AS BIGINT) AS cms_est
        FROM probe p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
        GROUP BY 1, 2
    """,
    # Quantile literals are cast to DOUBLE: DuckDB parses a bare 0.9
    # as DECIMAL and computes an exact 114.3 where Spark's double math
    # gives 114.30000000000001 — the frac would then differ in the low
    # bits.  With ::DOUBLE both engines run the identical IEEE ops.
    "bottomk_quantiles": f"""
        WITH base AS (
            SELECT o_orderpriority AS grp,
                   {_MD5.format("o_orderkey::VARCHAR")} AS h,
                   o_orderkey AS k, o_totalprice AS v
            FROM orders
        ),
        samp AS (
            SELECT grp, k, v,
                   row_number() OVER (PARTITION BY grp ORDER BY h, k) AS rn
            FROM base
        ),
        sv AS (
            SELECT grp, v,
                   row_number() OVER (PARTITION BY grp ORDER BY v, k) - 1
                       AS i,
                   count(*) OVER (PARTITION BY grp) AS kk
            FROM samp WHERE rn <= {BK_K}
        ),
        est AS (
            SELECT grp, CAST(max(kk) AS INT) AS k_used,
                   max(CASE WHEN i = CAST(floor(0.5::DOUBLE * (kk - 1))
                                          AS BIGINT)
                            THEN v END) AS lo50,
                   max(CASE WHEN i = least(CAST(floor(0.5::DOUBLE * (kk - 1))
                                                AS BIGINT) + 1, kk - 1)
                            THEN v END) AS hi50,
                   max(CASE WHEN i = CAST(floor(0.9::DOUBLE * (kk - 1))
                                          AS BIGINT)
                            THEN v END) AS lo90,
                   max(CASE WHEN i = least(CAST(floor(0.9::DOUBLE * (kk - 1))
                                                AS BIGINT) + 1, kk - 1)
                            THEN v END) AS hi90,
                   CAST(max(kk) AS BIGINT) AS kkb
            FROM sv GROUP BY 1
        ),
        ex0 AS (
            SELECT grp, v,
                   row_number() OVER (PARTITION BY grp ORDER BY v, k) - 1
                       AS i,
                   count(*) OVER (PARTITION BY grp) AS n
            FROM base
        ),
        ex AS (
            SELECT grp, CAST(max(n) AS BIGINT) AS n,
                   max(CASE WHEN i = CAST(floor(0.5::DOUBLE * (n - 1))
                                          AS BIGINT)
                            THEN v END) AS xlo50,
                   max(CASE WHEN i = least(CAST(floor(0.5::DOUBLE * (n - 1))
                                                AS BIGINT) + 1, n - 1)
                            THEN v END) AS xhi50,
                   max(CASE WHEN i = CAST(floor(0.9::DOUBLE * (n - 1))
                                          AS BIGINT)
                            THEN v END) AS xlo90,
                   max(CASE WHEN i = least(CAST(floor(0.9::DOUBLE * (n - 1))
                                                AS BIGINT) + 1, n - 1)
                            THEN v END) AS xhi90
            FROM ex0 GROUP BY 1
        )
        SELECT e.grp AS o_orderpriority, e.n, s.k_used,
               xlo50 + (0.5::DOUBLE * (e.n - 1)
                        - floor(0.5::DOUBLE * (e.n - 1)))
                     * (xhi50 - xlo50) AS exact_p50,
               lo50 + (0.5::DOUBLE * (s.kkb - 1)
                       - floor(0.5::DOUBLE * (s.kkb - 1)))
                    * (hi50 - lo50) AS est_p50,
               xlo90 + (0.9::DOUBLE * (e.n - 1)
                        - floor(0.9::DOUBLE * (e.n - 1)))
                     * (xhi90 - xlo90) AS exact_p90,
               lo90 + (0.9::DOUBLE * (s.kkb - 1)
                       - floor(0.9::DOUBLE * (s.kkb - 1)))
                    * (hi90 - lo90) AS est_p90
        FROM ex e JOIN est s USING (grp)
    """,
    # inclusion-exclusion overlap: per-type and max-merged per-pair
    # register tables through the identical estimate chain, plus the
    # exact distinct-pair intersection
    "hll_overlap_estimate": f"""
        WITH keyed AS (
            SELECT event_type,
                   {_MD5.format("user_id::VARCHAR")} % {HLL_M} AS reg,
                   {_MD5.format("user_id::VARCHAR")} // {HLL_M} AS suffix
            FROM events
        ),
        regs AS (
            SELECT event_type, reg,
                   CAST(max(least(1 + bit_count((suffix & (-suffix)) - 1),
                                  55)) AS BIGINT) AS mj
            FROM keyed GROUP BY 1, 2
        ),
        types AS (SELECT DISTINCT event_type FROM regs),
        pairs AS (
            SELECT a.event_type AS ta, b.event_type AS tb
            FROM types a, types b WHERE a.event_type < b.event_type
        ),
        sagg AS (
            SELECT event_type,
                   CAST(sum(1::BIGINT << ({_HLL_RHO_MAX} - mj)) AS BIGINT)
                       AS hit_sum,
                   count(*)::BIGINT AS hits
            FROM regs GROUP BY 1
        ),
        singles AS (
            SELECT event_type, hits,
                   CASE WHEN raw <= {_HLL_SMALL!r} AND hits < {HLL_M}
                        THEN list_extract({_HLL_LC}, ({HLL_M} - hits)::INT)
                        ELSE raw END AS e
            FROM (SELECT event_type, hits,
                         {_HLL_NUM!r} / (hit_sum + ({HLL_M} - hits)
                             * (1::BIGINT << {_HLL_RHO_MAX})) AS raw
                  FROM sagg)
        ),
        pu AS (
            SELECT p.ta, p.tb, r.reg, CAST(max(r.mj) AS BIGINT) AS mj
            FROM pairs p JOIN regs r ON r.event_type IN (p.ta, p.tb)
            GROUP BY 1, 2, 3
        ),
        uagg AS (
            SELECT ta, tb,
                   CAST(sum(1::BIGINT << ({_HLL_RHO_MAX} - mj)) AS BIGINT)
                       AS hit_sum,
                   count(*)::BIGINT AS hits
            FROM pu GROUP BY 1, 2
        ),
        unions AS (
            SELECT ta, tb,
                   CASE WHEN raw <= {_HLL_SMALL!r} AND hits < {HLL_M}
                        THEN list_extract({_HLL_LC}, ({HLL_M} - hits)::INT)
                        ELSE raw END AS e
            FROM (SELECT ta, tb, hits,
                         {_HLL_NUM!r} / (hit_sum + ({HLL_M} - hits)
                             * (1::BIGINT << {_HLL_RHO_MAX})) AS raw
                  FROM uagg)
        ),
        du AS (SELECT DISTINCT event_type, user_id FROM events),
        exact AS (
            SELECT a.event_type AS ta, b.event_type AS tb,
                   CAST(count(*) AS BIGINT) AS exact_overlap
            FROM du a JOIN du b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT u.ta AS type_a, u.tb AS type_b,
               round(sa.e, 6) AS est_a,
               round(sb.e, 6) AS est_b,
               round(u.e, 6) AS est_union,
               round(sa.e + sb.e - u.e, 6) AS est_overlap,
               coalesce(x.exact_overlap, CAST(0 AS BIGINT))
                   AS exact_overlap
        FROM unions u
        JOIN singles sa ON sa.event_type = u.ta
        JOIN singles sb ON sb.event_type = u.tb
        LEFT JOIN exact x ON x.ta = u.ta AND x.tb = u.tb
    """,
    # rolling 3-day register merge: day scaffold x 64 registers, RANGE
    # frame max per register, then the identical estimate chain; exact
    # reference via a day-range join, empty windows coalesced to 0
    "hll_rolling_distinct": f"""
        WITH ev AS (
            SELECT (epoch_us(ts) // 1000000) // 86400 AS d, user_id
            FROM events
        ),
        keyed AS (
            SELECT d,
                   {_MD5.format("user_id::VARCHAR")} % {HLL_M} AS reg,
                   {_MD5.format("user_id::VARCHAR")} // {HLL_M} AS suffix
            FROM ev
        ),
        regs AS (
            SELECT d, reg,
                   CAST(max(least(1 + bit_count((suffix & (-suffix)) - 1),
                                  55)) AS BIGINT) AS mj
            FROM keyed GROUP BY 1, 2
        ),
        bounds AS (SELECT min(d) AS dmin, max(d) AS dmax FROM regs),
        days AS (
            SELECT unnest(generate_series(dmin, dmax)) AS d FROM bounds
        ),
        scaffold AS (
            SELECT d, g.r AS reg
            FROM days, unnest(generate_series(0, {HLL_M - 1})) AS g(r)
        ),
        j AS (
            SELECT s.d, s.reg, r.mj
            FROM scaffold s LEFT JOIN regs r USING (d, reg)
        ),
        rm AS (
            SELECT d, reg,
                   max(mj) OVER (PARTITION BY reg ORDER BY d
                                 RANGE BETWEEN {HLL_WIN - 1} PRECEDING
                                       AND CURRENT ROW) AS rmj
            FROM j
        ),
        per AS (
            SELECT d,
                   CAST(sum(CASE WHEN rmj IS NOT NULL
                                 THEN 1::BIGINT << ({_HLL_RHO_MAX} - rmj)
                                 ELSE 0 END) AS BIGINT) AS hit_sum,
                   CAST(count(rmj) AS BIGINT) AS registers_hit
            FROM rm GROUP BY d
        ),
        est AS (
            SELECT d, registers_hit,
                   {_HLL_NUM!r} / (hit_sum
                       + ({HLL_M} - registers_hit)
                         * (1::BIGINT << {_HLL_RHO_MAX})) AS raw
            FROM per
        ),
        hits3 AS (
            SELECT dy.d,
                   CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact_3d
            FROM ev e JOIN days dy
              ON e.d BETWEEN dy.d - {HLL_WIN - 1} AND dy.d
            GROUP BY dy.d
        ),
        exact AS (
            SELECT days.d, coalesce(h.exact_3d, CAST(0 AS BIGINT))
                       AS exact_3d
            FROM days LEFT JOIN hits3 h USING (d)
        )
        SELECT p.d AS epoch_day, p.registers_hit,
               CASE WHEN p.raw <= {_HLL_SMALL!r}
                         AND p.registers_hit < {HLL_M}
                    THEN list_extract({_HLL_LC},
                                      ({HLL_M} - p.registers_hit)::INT)
                    ELSE p.raw END AS hll_est,
               x.exact_3d
        FROM est p JOIN exact x USING (d)
    """,
    "hll_distinct": f"""
        WITH keyed AS (
            SELECT event_type,
                   {_MD5.format("user_id::VARCHAR")} % {HLL_M} AS reg,
                   {_MD5.format("user_id::VARCHAR")} // {HLL_M} AS suffix
            FROM events
        ),
        ranked AS (
            SELECT event_type, reg,
                   least(1 + bit_count((suffix & (-suffix)) - 1), 55) AS rho
            FROM keyed
        ),
        regs AS (
            SELECT event_type, reg, CAST(max(rho) AS BIGINT) AS mj
            FROM ranked GROUP BY 1, 2
        ),
        per AS (
            SELECT event_type,
                   CAST(sum(1::BIGINT << ({_HLL_RHO_MAX} - mj)) AS BIGINT)
                       AS hit_sum,
                   count(*)::BIGINT AS registers_hit
            FROM regs GROUP BY 1
        ),
        exact AS (
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS exact_distinct
            FROM events GROUP BY 1
        ),
        est AS (
            SELECT event_type, registers_hit,
                   {_HLL_NUM!r} / (hit_sum
                       + ({HLL_M} - registers_hit)
                         * (1::BIGINT << {_HLL_RHO_MAX})) AS raw
            FROM per
        )
        SELECT e.event_type, e.exact_distinct, p.registers_hit,
               CASE WHEN p.raw <= {_HLL_SMALL!r}
                         AND p.registers_hit < {HLL_M}
                    THEN list_extract({_HLL_LC},
                                      ({HLL_M} - p.registers_hit)::INT)
                    ELSE p.raw END AS hll_est
        FROM exact e JOIN est p USING (event_type)
    """,
}
