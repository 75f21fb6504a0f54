"""Partitioned Bloom seen-filter: no false negatives, low fp, exactness
of the bloom+anti-join composition."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from indigent_defense_stats_spark.plans import bloom

N_BITS = 1 << 16
N_BUCKETS = 4


@pytest.fixture(scope="module")
def sets(spark):
    seen = spark.range(0, 2000).select(
        F.concat(F.lit("http://h/case?id="), F.col("id").cast("string")).alias("url")
    )
    cand = spark.range(1000, 4000).select(
        F.concat(F.lit("http://h/case?id="), F.col("id").cast("string")).alias("url")
    )
    return seen.cache(), cand.cache()


def test_probe_no_false_negatives(spark, sets):
    seen, cand = sets
    bl = bloom.build(seen, "url", N_BUCKETS, N_BITS)
    probed = bloom.probe(
        bloom.with_bucket_and_hashes(cand, "url", N_BUCKETS), bl, N_BITS
    )
    # every true dup (ids 1000..1999) must be flagged maybe_seen
    missed = probed.filter(
        (F.col("url").substr(F.lit(18), F.lit(10)).cast("int") < 2000)
        & ~F.col("maybe_seen")
    ).count()
    assert missed == 0


def test_probe_fp_rate_reasonable(spark, sets):
    seen, cand = sets
    bl = bloom.build(seen, "url", N_BUCKETS, N_BITS)
    probed = bloom.probe(
        bloom.with_bucket_and_hashes(cand, "url", N_BUCKETS), bl, N_BITS
    )
    fps = probed.filter(
        (F.col("url").substr(F.lit(18), F.lit(10)).cast("int") >= 2000)
        & F.col("maybe_seen")
    ).count()
    assert fps / 2000 < 0.05  # 2000 seen in 2^16/4 bits per bucket


def test_filter_new_is_exact(spark, sets):
    seen, cand = sets
    out = bloom.filter_new(cand, seen, "url", N_BUCKETS, N_BITS)
    got = {r["url"] for r in out.collect()}
    want = {f"http://h/case?id={i}" for i in range(2000, 4000)}
    assert got == want
