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


def test_update_state_equals_full_rebuild(spark, sets):
    """Incremental OR-maintenance (the engine's per-wave path) must
    produce byte-identical bits to a from-scratch build over the union
    of the waves' keys."""
    seen, cand = sets
    first = seen.filter(
        F.col("url").substr(F.lit(18), F.lit(10)).cast("int") < 1000
    )
    second = seen.subtract(first)
    s1 = bloom.update_state(None, first, "url", N_BUCKETS, N_BITS)
    s2 = bloom.update_state(s1, second, "url", N_BUCKETS, N_BITS)
    incremental = {r["bucket"]: bytes(r["bits"]) for r in s2.collect()}
    full = {
        r["bucket"]: bytes(r["bits"])
        for r in bloom.build(seen, "url", N_BUCKETS, N_BITS).collect()
    }
    assert incremental == full


def test_filter_new_with_state_is_exact(spark, sets):
    seen, cand = sets
    state = bloom.update_state(None, seen, "url", N_BUCKETS, N_BITS)
    out = bloom.filter_new_with_state(cand, seen, state, "url", N_BUCKETS, N_BITS)
    got = {r["url"] for r in out.collect()}
    want = {f"http://h/case?id={i}" for i in range(2000, 4000)}
    assert got == want
