"""CDC chunking vs a pure-Python mirror + the shift-robustness claim
(the reason CDC exists: boundaries resynchronize after an insertion,
fixed-stride boundaries don't)."""

from __future__ import annotations

import hashlib
from collections import Counter

from indigent_defense_stats_spark.operators import cdc

SF_DIR = "/root/testdata/sf0.001"


def _py_chunks(text: str) -> list[str]:
    g = [(ord(c) * cdc._MUL) % cdc.M for c in text]
    n = len(text)
    bounds = [
        i
        for i in range(cdc.W, n + 1)
        if (sum(g[i - 1 - j] * cdc._BJ[j] for j in range(cdc.W)) % cdc.M)
        % cdc.D
        == 0
    ]
    if not bounds or bounds[-1] != n:
        bounds.append(n)
    out, s = [], 0
    for e in bounds:
        out.append(text[s:e])
        s = e
    return out


def test_python_mirror_matches_engine(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog " * 8),
        (1, "short"),  # < W -> single chunk
        (2, "exactlen8"),
        (3, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp " * 5),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["chunk"]
        for r in cdc.chunk_spans(df)
        .groupBy("doc_id")
        .agg({"chunk": "collect_list"})
        .withColumnRenamed("collect_list(chunk)", "chunk")
        .collect()
    }
    for doc_id, text in texts:
        assert sorted(got[doc_id]) == sorted(_py_chunks(text)), doc_id
        assert "".join(_py_chunks(text)) == text  # chunks tile the doc


def test_chunks_reconstruct_every_doc(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    rows = docs.select("doc_id", "text").collect()
    for r in rows:
        assert "".join(_py_chunks(r["text"])) == r["text"]


def test_shift_robustness_vs_stride(spark):
    """A banner-prepended copy shares most CDC chunks with its source
    but (essentially) no fixed-stride chunks."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    [src] = base.filter("doc_id = 3").select("text").collect()
    text = src["text"]
    shifted = cdc._SHIFT_BANNER + text

    a, b = _py_chunks(text), _py_chunks(shifted)
    ca, cb = Counter(a), Counter(b)
    shared = sum((ca & cb).values())
    shared_chars = sum(len(c) * (ca & cb)[c] for c in (ca & cb))
    assert shared >= 1
    assert shared_chars / len(text) > 0.5  # most of the doc recovered

    stride = cdc.D
    sa = {text[i : i + stride] for i in range(0, len(text), stride)}
    sb = {shifted[i : i + stride] for i in range(0, len(shifted), stride)}
    # the 3-char shift misaligns every stride chunk
    assert not (sa & sb)


def test_dup_stats_flags_shifted_pairs(spark):
    out = cdc.cdc_chunk_stats(spark, SF_DIR)
    rows = {r["doc_id"]: r for r in out.collect()}
    shifted_ids = [d for d in rows if d >= 100000]
    assert shifted_ids
    for d in shifted_ids:
        # the copy shares most characters with its source
        assert rows[d]["dup_char_frac"] > 0.5, d
        assert rows[d - 100000]["dup_char_frac"] > 0.5, d
    # an unrelated doc (no shifted copy, not a corpus-level duplicate)
    # can still share the odd 64-char chunk, but totals must be sane
    for d, r in rows.items():
        assert r["dup_chars"] <= r["total_chars"]
        assert r["n_chunks"] >= 1
