"""Round-3 operators: C4-style global line dedup (with document
rewrite) and the CCNet-style unigram-LM quality score.  Exact
cross-engine values are oracle-checked by the driver and
scripts/check_oracles.py; these tests pin the SEMANTICS on
handcrafted corpora."""

from __future__ import annotations

import math

from indigent_defense_stats_spark.operators import decontam, textstats

# ten-token chunks (decontam.CHUNK) used as the dedup "line" unit
A = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
B = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
C = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
D = "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_line_dedup_keeps_global_first_and_rewrites(spark, tmp_path):
    """Chunk A appears in docs 1-3: only doc 1 (lowest doc_id, first
    position) keeps it.  Unique chunks survive; a fully-duplicated doc
    rewrites to empty text."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, f"{A} {B}", "en", "s", 10),
            (2, f"{A} {C}", "en", "s", 10),
            (3, A, "en", "s", 10),
        ],
    )
    out = {r["doc_id"]: r for r in decontam.line_dedup(spark, d).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["new_text"] == f"{A} {B}"
    assert out[2]["n_kept"] == 1 and out[2]["new_text"] == C
    assert out[2]["n_dropped"] == 1
    assert out[3]["n_kept"] == 0 and out[3]["new_text"] == ""


def test_line_dedup_intra_document_repeat(spark, tmp_path):
    """A chunk repeated WITHIN one document dedups too (C4 dedup is
    global, which subsumes intra-doc), and reassembly preserves the
    original chunk order of the survivors."""
    d = _write_docs(
        spark,
        tmp_path,
        [(1, f"{D} {B} {D}", "en", "s", 10), (2, f"{C} {A}", "en", "s", 10)],
    )
    out = {r["doc_id"]: r for r in decontam.line_dedup(spark, d).collect()}
    assert out[1]["n_chunks"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["new_text"] == f"{D} {B}"  # first D kept, order stable
    assert out[2]["new_text"] == f"{C} {A}"


def test_line_dedup_partial_tail_chunk(spark, tmp_path):
    """A trailing sub-CHUNK chunk is its own dedup unit."""
    d = _write_docs(
        spark,
        tmp_path,
        [(1, f"{A} tail1 tail2", "en", "s", 10), (2, "tail1 tail2", "en", "s", 5)],
    )
    out = {r["doc_id"]: r for r in decontam.line_dedup(spark, d).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_kept"] == 0  # "tail1 tail2" already seen in doc 1


def test_unigram_lm_score_semantics(spark, tmp_path):
    """Common-token docs score higher than rare/OOV docs; OOV kicks in
    exactly when the vocabulary exceeds LM_VOCAB_K; logprob is the sum
    of per-token model logprobs."""
    rare = [f"r{i:02d}" for i in range(45)]  # 45 singleton tokens
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "x x x x x", "en", "s", 9),  # all high-probability
            (2, " ".join(rare), "en", "s", 10),  # all singletons
        ],
    )
    out = {r["doc_id"]: r for r in textstats.unigram_lm_score(spark, d).collect()}
    # vocab = 46 distinct; top-40 = x (cnt 5) + 39 singletons -> 6 OOV
    assert out[1]["n_oov"] == 0
    assert out[2]["n_oov"] == 6
    assert out[1]["n_tokens"] == 5 and out[2]["n_tokens"] == 45
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
    # doc 1 is five copies of the same token: logprob = 5 * ln(5/50)
    expect = 5 * round(math.log(5 / 50), 6)
    assert abs(out[1]["logprob"] - expect) < 1e-5
