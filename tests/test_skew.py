"""Skew utilities: salted join / two-phase agg equal their vanilla
counterparts on skewed data, and actually spread the hot key."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from indigent_defense_stats_spark.plans import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 10_000 rows of hot key 'h' + 100 rows spread over 100 cold keys
    big = spark.range(10_100).select(
        F.when(F.col("id") < 10_000, F.lit("h"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [("h", "hot"), *[(f"k{i}", f"cold{i}") for i in range(100)]],
        "k string, label string",
    )
    return big, dim


def test_replicated_skew_join_equals_plain_join(skewed):
    big, dim = skewed
    plain = big.join(dim, "k", "inner").select("k", "v", "label")
    salted = skew.replicated_skew_join(big, dim, "k", n_salt=8).select(
        "k", "v", "label"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_collect_list_salted_equals_vanilla(skewed):
    big, _ = skewed
    vanilla = {
        r["k"]: sorted(r["vs"])
        for r in big.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = {
        r["k"]: list(r["vs"])
        for r in skew.collect_list_salted(big, "k", "v", n_salt=8).collect()
    }
    assert salted == vanilla


def test_salting_spreads_the_hot_key(spark, skewed):
    big, _ = skewed
    salt = F.pmod(F.xxhash64("k", "v"), F.lit(8)).cast("int")
    n = (
        big.filter(F.col("k") == "h")
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n == 8  # the hot key occupies all salt lanes


def test_salted_range_partition_spreads_hot_cluster(spark):
    """One county holding 90% of rows must span many writer
    partitions (no fat straggler file), while partitions remain
    county-clustered (most hold a single county)."""
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit("hays"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 9).cast("string")))
        .alias("county"),
        F.col("id").cast("string").alias("doc_id"),
    )
    out = skew.salted_range_partition(df, 16, "county", "doc_id")
    per_part = (
        out.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("county").alias("n_counties"),
        )
        .collect()
    )
    counts = [r["n"] for r in per_part]
    mean = sum(counts) / len(counts)
    # balance: no partition more than 2x the mean (hash repartition by
    # county alone would put 9,000 of 10,000 rows in ONE partition)
    assert max(counts) <= 2 * mean, sorted(counts)
    # the hot county spans many ranges
    hot_parts = (
        out.filter(F.col("county") == "hays")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert hot_parts >= 8, hot_parts
    # clustering: ranges are (county, hash)-ordered, so each county's
    # rows land in a CONTIGUOUS run of partitions (a county predicate
    # touches a contiguous range of output files)
    by_county = (
        out.select("county", F.spark_partition_id().alias("pid"))
        .groupBy("county")
        .agg(F.collect_set("pid").alias("pids"))
        .collect()
    )
    for r in by_county:
        pids = sorted(r["pids"])
        assert pids == list(range(pids[0], pids[-1] + 1)), (r["county"], pids)
