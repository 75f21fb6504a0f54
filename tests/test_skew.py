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
