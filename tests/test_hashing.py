"""xxh64 parity: spec vectors + cross-check against Spark's JVM XXH64."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from indigent_defense_stats_spark.functions.hashing import (
    xxh64_hexdigest,
    xxh64_int,
)


def test_empty_vector():
    # public xxHash spec vector
    assert xxh64_int(b"") == 0xEF46DB3751D8E999
    assert xxh64_hexdigest("") == "ef46db3751d8e999"


@given(st.binary(min_size=0, max_size=200), st.integers(min_value=0, max_value=2**32))
@settings(max_examples=50, deadline=None)
def test_hash_is_64bit(data, seed):
    h = xxh64_int(data, seed)
    assert 0 <= h < 2**64


def test_matches_spark_jvm_xxhash64(spark):
    """Spark's xxhash64(string) is XXH64(utf8, seed=42) as a signed long;
    our from-spec implementation must agree bit-for-bit (all code paths:
    empty, <32B, 32B boundary, >32B, multi-byte UTF-8)."""
    samples = ["", "a", "hello world", "x" * 31, "y" * 32, "z" * 100, "café üñï"]
    df = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for row in df.collect():
        mine = xxh64_int(row["s"].encode("utf-8"), seed=42)
        signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert signed == row["h"], row["s"]


def test_hexdigest_format():
    d = xxh64_hexdigest("State of Texas VS Nemo")
    assert len(d) == 16 and all(c in "0123456789abcdef" for c in d)
