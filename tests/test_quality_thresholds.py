"""quality_thresholds: the approx (100 TB) path tracks the exact
oracle baseline within sketch tolerance."""

from __future__ import annotations

from indigent_defense_stats_spark.operators import textstats

SF_DIR = "/root/testdata/sf0.01"


def test_approx_percentiles_track_exact(spark):
    exact = {r["source"]: r for r in textstats.quality_thresholds(spark, SF_DIR).collect()}
    approx = {
        r["source"]: r
        for r in textstats.quality_thresholds(spark, SF_DIR, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for src, e in exact.items():
        a = approx[src]
        assert a["n"] == e["n"]
        for p in ("p10", "p50", "p90"):
            # approx_percentile returns an actual data value; with 25
            # docs/source the neighboring order statistic is the worst
            # case — bound by the observed spread of the group
            assert abs(a[p] - e[p]) <= 0.1, (src, p, a[p], e[p])
        # medians must be close in rank: p10 <= p50 <= p90 always
        assert a["p10"] <= a["p50"] <= a["p90"]


def test_gopher_filters_rules(spark):
    """Per-rule flags recompute from the row's own reported stats, the
    mean-word-length rule agrees with its exact integer form, and the
    word-count rule actually discriminates on this corpus."""
    from indigent_defense_stats_spark.operators import textstats

    rows = textstats.gopher_quality_filters(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)  # both outcomes occur
    for r in rows:
        assert r["pass_word_count"] == (
            textstats.GOPHER_MIN_WORDS
            <= r["n_words"]
            <= textstats.GOPHER_MAX_WORDS
        )
        assert r["pass_stopwords"] == (
            r["n_stop_distinct"] >= textstats.GOPHER_MIN_STOP
        )
        # reported mean is consistent with the integer-form rule
        if r["pass_mean_word_len"]:
            assert (
                textstats.GOPHER_MIN_MWL
                <= r["mean_word_len"]
                <= textstats.GOPHER_MAX_MWL
            )
        assert r["keep"] == (
            r["pass_word_count"]
            and r["pass_mean_word_len"]
            and r["pass_stopwords"]
        )


def test_gopher_filters_plan_map_only(spark):
    from indigent_defense_stats_spark.operators import textstats

    plan = (
        textstats.gopher_quality_filters(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_hll_cardinality_tracks_exact(spark):
    """The 100 TB cardinality path is the HyperLogLog sketch
    (approx_count_distinct: mergeable, fixed memory, one pass) with
    the exact distinct aggregate as its oracle — same contract as the
    approx_percentile/t-digest pair above.  Default rsd=0.05; assert
    the estimate lands within 3 sigma on both a dense key (user_id)
    and a high-cardinality key (content md5)."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df, col in ((ev, F.col("user_id")), (docs, F.md5("text"))):
        exact = df.select(col.alias("k")).distinct().count()
        approx = df.agg(
            F.approx_count_distinct(col).alias("a")
        ).collect()[0]["a"]
        assert abs(approx - exact) <= max(3, 0.15 * exact), (exact, approx)


def test_ccnet_buckets_partition_and_order(spark):
    """Per language: the three buckets partition the docs with sizes
    differing by <= 1 (ntile law), and bucket order respects the score
    order (min(head) >= max(tail), with middle between)."""
    from collections import defaultdict

    from indigent_defense_stats_spark.operators import textstats

    rows = textstats.ccnet_buckets(spark, SF_DIR).collect()
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r["lang"]][r["bucket"]].append(r["avg_logprob"])
    assert by_lang
    for lang, buckets in by_lang.items():
        sizes = [len(buckets.get(b, [])) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if buckets.get("head") and buckets.get("tail"):
            assert min(buckets["head"]) >= max(buckets["tail"]), lang
        if buckets.get("middle"):
            if buckets.get("head"):
                assert min(buckets["head"]) >= max(buckets["middle"]), lang
            if buckets.get("tail"):
                assert min(buckets["middle"]) >= max(buckets["tail"]), lang
    # deterministic re-run
    again = {
        (r["doc_id"], r["bucket"])
        for r in textstats.ccnet_buckets(spark, SF_DIR).collect()
    }
    assert {(r["doc_id"], r["bucket"]) for r in rows} == again
