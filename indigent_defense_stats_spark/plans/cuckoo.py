"""Partitioned Cuckoo URL-seen filter — the bloom alternative the
north rule names ("partitioned bloom/cuckoo URL-seen filter").

Same partitioned architecture as :mod:`bloom` (hash-bucket the seen
set, one compact filter per bucket, cogroup probe so each filter
crosses the wire once per bucket-partition), different filter: a
cuckoo filter stores 16-bit fingerprints in a 2-choice, 4-slot-bucket
table (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014 — public algorithm).  Trade-offs vs bloom:

- supports *deletion* (a fingerprint can be removed) — relevant for
  recrawl policies where a URL's seen-status expires;
- better space at low false-positive rates (<3%);
- inserts can fail at high load factor (the filter reports overflow
  and the caller falls back to the exact anti-join for that bucket —
  no correctness loss, same no-false-negative guarantee).

The probe path (the per-wave hot path) is fully numpy-vectorized;
inserts take a python loop with bounded eviction kicks (build is
once-per-wave per bucket; production swaps in a C extension under the
same partitioned layout).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

from .bloom import with_bucket_and_hashes

BUCKET_SLOTS = 4
MAX_KICKS = 500

CUCKOO_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("table", BinaryType(), False),
        StructField("overflow", BooleanType(), False),
    ]
)


def _fingerprints(h1: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from the first hash."""
    fp = (h1.astype(np.int64).view(np.uint64) >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _index_pair(h2: np.ndarray, fp: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Primary index from h2; alternate = i1 xor hash(fp), both mod m
    (m is a power of two so xor stays in range)."""
    i1 = (h2.astype(np.int64).view(np.uint64) % np.uint64(m)).astype(np.int64)
    # multiply-shift hash of the fingerprint (public odd-constant trick)
    fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(m)
    i2 = (i1.astype(np.uint64) ^ fph) % np.uint64(m)
    return i1, i2.astype(np.int64)


def _table_size(n_keys: int) -> int:
    """Power-of-two bucket count for ~95% max load factor."""
    need = max(8, int(n_keys / (BUCKET_SLOTS * 0.84)) + 1)
    m = 8
    while m < need:
        m <<= 1
    return m


def build(
    seen: DataFrame,
    url_col: str,
    n_buckets: int,
    n_keys_hint: int,
    max_table_size: int | None = None,
) -> DataFrame:
    """seen -> (bucket, table, overflow): one cuckoo table per bucket.

    The table auto-sizes to the bucket's actual key count;
    ``max_table_size`` caps it (memory ceiling per bucket at scale) —
    an over-full capped table overflows and that bucket degrades to
    the exact join."""
    if max_table_size is not None:
        # power-of-two required: the alternate index i ^ hash(fp) is an
        # involution only when all values stay below a 2^k table size
        assert max_table_size & (max_table_size - 1) == 0 and max_table_size >= 8
    hashed = with_bucket_and_hashes(seen, url_col, n_buckets).select(
        "bucket", "h1", "h2"
    )
    m = _table_size(n_keys_hint // max(1, n_buckets))

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        size = max(m, _table_size(len(pdf)))
        if max_table_size is not None:
            size = min(size, max_table_size)
        table = np.zeros((size, BUCKET_SLOTS), dtype=np.uint16)
        fp = _fingerprints(pdf["h1"].values)
        i1, i2 = _index_pair(pdf["h2"].values, fp, size)
        overflow = False
        rng_state = 0x9E3779B9
        for f, a, b in zip(fp.tolist(), i1.tolist(), i2.tolist()):
            placed = False
            for idx in (a, b):
                row = table[idx]
                empt = np.nonzero(row == 0)[0]
                if len(empt):
                    row[empt[0]] = f
                    placed = True
                    break
            if placed:
                continue
            # bounded eviction kicks
            idx, cur = a, f
            for _ in range(MAX_KICKS):
                rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
                slot = rng_state % BUCKET_SLOTS
                cur, table[idx][slot] = int(table[idx][slot]), cur
                fph = (np.uint64(cur) * np.uint64(0x5BD1E995)) % np.uint64(size)
                idx = int((np.uint64(idx) ^ fph) % np.uint64(size))
                row = table[idx]
                empt = np.nonzero(row == 0)[0]
                if len(empt):
                    row[empt[0]] = cur
                    cur = None
                    break
            if cur is not None:
                overflow = True  # caller falls back to exact join
                break
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "table": [table.tobytes()],
                "overflow": [overflow],
            }
        )

    return hashed.groupBy("bucket").applyInPandas(make, schema=CUCKOO_SCHEMA)


def probe(candidates: DataFrame, filters: DataFrame) -> DataFrame:
    """candidates (carrying bucket/h1/h2) -> + maybe_seen boolean.
    Fully vectorized lookups; an overflowed bucket marks everything
    maybe_seen (degrades to the exact join, never drops a URL)."""
    out_schema = StructType(
        candidates.schema.fields + [StructField("maybe_seen", BooleanType(), False)]
    )
    cols = candidates.columns

    def check(cand: pd.DataFrame, flt: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        if flt.empty:
            cand["maybe_seen"] = False
            return cand
        if bool(flt["overflow"].iloc[0]):
            cand["maybe_seen"] = True
            return cand
        table = np.frombuffer(flt["table"].iloc[0], dtype=np.uint16).reshape(
            -1, BUCKET_SLOTS
        )
        size = table.shape[0]
        fp = _fingerprints(cand["h1"].values)
        i1, i2 = _index_pair(cand["h2"].values, fp, size)
        hit1 = (table[i1] == fp[:, None]).any(axis=1)
        hit2 = (table[i2] == fp[:, None]).any(axis=1)
        cand["maybe_seen"] = hit1 | hit2
        return cand

    return (
        candidates.groupBy("bucket")
        .cogroup(filters.groupBy("bucket"))
        .applyInPandas(check, schema=out_schema)
    )


def filter_new(
    candidates: DataFrame,
    seen: DataFrame | None,
    url_col: str,
    n_buckets: int,
    n_keys_hint: int = 1 << 16,
    max_table_size: int | None = None,
) -> DataFrame:
    """Candidates not in *seen*: cuckoo pre-filter + exact anti-join on
    the maybe-seen survivors (no false negatives by construction —
    overflowed buckets mark everything maybe_seen and degrade to the
    exact join).  Composition shared with the bloom path."""
    from .bloom import prefilter_anti_join

    return prefilter_anti_join(
        candidates,
        seen,
        url_col,
        n_buckets,
        lambda cand: probe(
            cand, build(seen, url_col, n_buckets, n_keys_hint, max_table_size)
        ),
    )
