"""Partitioned Cuckoo seen-filter: no false negatives, low fp,
exactness of filter+anti-join, overflow fallback, deletion property."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from indigent_defense_stats_spark.plans import bloom, cuckoo

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
    flt = cuckoo.build(seen, "url", N_BUCKETS, n_keys_hint=2000)
    probed = cuckoo.probe(
        bloom.with_bucket_and_hashes(cand, "url", N_BUCKETS), flt
    )
    missed = probed.filter(
        (F.col("url").substr(F.lit(18), F.lit(10)).cast("int") < 2000)
        & ~F.col("maybe_seen")
    ).count()
    assert missed == 0


def test_probe_fp_rate_reasonable(spark, sets):
    seen, cand = sets
    flt = cuckoo.build(seen, "url", N_BUCKETS, n_keys_hint=2000)
    assert not any(r["overflow"] for r in flt.collect())
    probed = cuckoo.probe(
        bloom.with_bucket_and_hashes(cand, "url", N_BUCKETS), flt
    )
    fps = probed.filter(
        (F.col("url").substr(F.lit(18), F.lit(10)).cast("int") >= 2000)
        & F.col("maybe_seen")
    ).count()
    # 16-bit fingerprints, 2 buckets x 4 slots probed -> fp ~ 8/2^16
    assert fps / 2000 < 0.01


def test_filter_new_is_exact(spark, sets):
    seen, cand = sets
    out = cuckoo.filter_new(cand, seen, "url", N_BUCKETS, n_keys_hint=2000)
    got = {r["url"] for r in out.collect()}
    want = {f"http://h/case?id={i}" for i in range(2000, 4000)}
    assert got == want


def test_overflow_degrades_to_exact_not_wrong(spark):
    """Force overflow with a hard table-size cap (5000 keys into
    256x4=1024 slots): the eviction-kick loop runs, the bucket
    overflows, and everything flows through the exact join — result
    stays exact."""
    seen = spark.range(0, 5000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url")
    )
    cand = spark.range(4000, 6000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url")
    )
    flt = cuckoo.build(seen, "url", 1, n_keys_hint=8, max_table_size=256)
    assert [r["overflow"] for r in flt.collect()] == [True]
    out = cuckoo.filter_new(
        cand, seen, "url", 1, n_keys_hint=8, max_table_size=256
    )
    got = {r["url"] for r in out.collect()}
    assert got == {f"u{i}" for i in range(5000, 6000)}


def test_eviction_kicks_preserve_membership(spark):
    """At ~84% load (no overflow) insertions must go through the
    eviction path and every inserted key still probes positive."""
    n = 850  # 256 buckets x 4 slots = 1024 slots -> 83% load
    seen = spark.range(0, n).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("url")
    )
    flt = cuckoo.build(seen, "url", 1, n_keys_hint=8, max_table_size=256)
    rows = flt.collect()
    assert [r["overflow"] for r in rows] == [False]
    probed = cuckoo.probe(
        bloom.with_bucket_and_hashes(seen, "url", 1), flt
    )
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # no false negatives


def test_fingerprint_deletion_local():
    """The cuckoo structure supports deletion (bloom cannot): removing
    a fingerprint makes the key unseen again.  Exercised on the numpy
    table directly — the distributed path only needs add/probe."""
    h1 = np.array([0x1234_5678_9ABC_DEF0], dtype=np.uint64).view(np.int64)
    h2 = np.array([0x0FED_CBA9_8765_4321], dtype=np.uint64).view(np.int64)
    fp = cuckoo._fingerprints(h1)
    i1, i2 = cuckoo._index_pair(h2, fp, 64)
    table = np.zeros((64, cuckoo.BUCKET_SLOTS), dtype=np.uint16)
    table[i1[0], 0] = fp[0]
    assert (table[i1] == fp[:, None]).any()
    table[i1[0], 0] = 0  # delete
    assert not (table[i1] == fp[:, None]).any()
    assert not (table[i2] == fp[:, None]).any()
