"""Perceptual-hash media near-dup: exact python replay of the aHash
kernel on crafted binary payloads, group recall/precision over the
arithmetic fixture, and the banding contract."""

from __future__ import annotations

import hashlib

import numpy as np

from indigent_defense_stats_spark.operators import multimodal as M
from indigent_defense_stats_spark.operators.pipeline_queries import (
    media_phash_neardup,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_ahash(body: np.ndarray) -> tuple[int, int]:
    cells = body.astype(np.int64).reshape(M.PHASH_CELLS, -1).sum(axis=1)
    bits = (M.PHASH_CELLS * cells > cells.sum()).astype(np.int64)
    hi = int((bits[:32] << np.arange(31, -1, -1)).sum())
    lo = int((bits[32:] << np.arange(31, -1, -1)).sum())
    return hi, lo


def _payload(fmt: bytes, body: bytes) -> bytes:
    return fmt + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + body


def test_perceptual_hash_matches_python_on_crafted_bytes(spark):
    # one ramp body, one step body, one constant body (constant: no
    # cell exceeds the mean -> hash 0/0)
    ramp = (np.arange(512) % 256).astype(np.uint8)
    step = np.concatenate(
        [np.zeros(256, np.uint8), np.full(256, 255, np.uint8)]
    )
    const = np.full(512, 7, np.uint8)
    rows = [
        (1, _payload(b"\xff\xd8", bytes(ramp))),
        (2, _payload(b"II*\x00", bytes(step))),
        (3, _payload(b"\xff\xd8", bytes(const))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: (r["hi"], r["lo"]) for r in M.perceptual_hash(df).collect()}
    assert got[1] == _py_ahash(ramp)
    assert got[2] == _py_ahash(step)
    assert got[2] == (0, 2**32 - 1)  # step: exactly the top half set
    assert got[3] == (0, 0)


def test_ahash_invariant_to_constant_byte_offset(spark):
    # adding a constant to every byte (mod nothing — stay in range)
    # shifts cell sums and the mean equally: the hash is unchanged.
    # This is the property that makes aHash robust to global
    # brightness changes on real images.
    rng = np.random.RandomState(7)
    body = rng.randint(0, 128, 512).astype(np.uint8)
    rows = [
        (1, _payload(b"\xff\xd8", bytes(body))),
        (2, _payload(b"\xff\xd8", bytes((body + 100).astype(np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: (r["hi"], r["lo"]) for r in M.perceptual_hash(df).collect()}
    assert got[1] == got[2]


def test_phash_neardup_groups(spark):
    rows = media_phash_neardup(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    by_group: dict[int, list[int]] = {}
    for d in range(n_docs):
        by_group.setdefault(d % M.PHASH_GROUPS, []).append(d)
    expected_pairs = {
        (a, b)
        for ds in by_group.values()
        for i, a in enumerate(ds)
        for b in ds[i + 1:]
    }
    got_pairs = {(r["d1"], r["d2"]) for r in rows}
    # recall: every same-group pair is found (bodies differ by one byte)
    assert expected_pairs <= got_pairs
    # precision: the md5 cell bases keep cross-group Hamming >= 20,
    # far above the verify threshold
    assert got_pairs == expected_pairs
    for r in rows:
        assert 0 <= r["hamming"] <= M.PHASH_HAM_MAX


def test_phash_group_bodies_match_oracle_formula(spark):
    # the UDF's md5 cell-base formula is the one the oracle replays
    g, c = 13, 40
    base = int(hashlib.md5(f"c:{g}:{c}".encode()).hexdigest()[:15], 16) % 256
    decoded = spark.createDataFrame(
        [(str(g), "m://x", "mugshot", 8, 8, 512, "jpeg")],
        "doc_id string, media_ref string, media_kind string,"
        " width int, height int, n_bytes long, format string",
    )
    payload = M.media_payloads_arith(decoded).collect()[0]["content"]
    body = bytes(payload)[6:]  # jpeg magic(2) + dims(4)
    i = c * 8 + 3
    assert body[i] == (base + i * 17) % 256


def test_phash_handles_non_multiple_body_lengths(spark):
    # media_payloads (xxh64-seeded) bodies are rarely 64-multiples —
    # the hash must pad, not crash, when paired with that generator
    from indigent_defense_stats_spark.operators.pipeline_queries import (
        _media_decoded,
    )

    payloads = M.media_payloads(_media_decoded(spark, SF_DIR)).limit(32)
    rows = M.perceptual_hash(payloads).collect()
    assert len(rows) == 32
    for r in rows:
        assert 0 <= r["hi"] < 2**32 and 0 <= r["lo"] < 2**32
