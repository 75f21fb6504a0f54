"""ExactSubstr removal: crafted-corpus replays of the interval-union
fold — overlapping windows merge into one island, disjoint duplicated
spans stay separate islands, short docs pass through untouched."""

from __future__ import annotations

from indigent_defense_stats_spark.operators import decontam as D

SF_DIR = "/root/testdata/sf0.001"
K = D.NGRAM  # 13


def _py_cut(corpus: dict[int, str]) -> dict[int, tuple[int, int, str]]:
    toks = {d: t.lower().split(" ") for d, t in corpus.items()}
    from collections import Counter

    grams: Counter = Counter()
    for ts in toks.values():
        for i in range(len(ts) - K + 1):
            grams[" ".join(ts[i:i + K])] += 1
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - K + 1):
            if grams[" ".join(ts[i:i + K])] > 1:
                covered.update(range(i, i + K))
        kept = [w for i, w in enumerate(ts) if i not in covered]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def _run(spark, corpus: dict[int, str]):
    df = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    orig = D._docs
    try:
        D._docs = lambda spark, sf_dir: df
        return {
            r["doc_id"]: (r["n_tokens"], r["n_cut"], r["clean_text"])
            for r in D.exact_substr_cut(spark, SF_DIR).collect()
        }
    finally:
        D._docs = orig


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_overlapping_windows_merge_into_one_island(spark):
    # A and B share a 15-token run -> three overlapping duplicated
    # 13-windows -> ONE island of exactly 15 tokens cut from each
    shared = _words("s", 15)
    corpus = {
        1: _words("a", 5) + " " + shared + " " + _words("z", 4),
        2: _words("b", 7) + " " + shared,
        3: _words("c", 30),  # unique -> untouched
    }
    got = _run(spark, corpus)
    exp = _py_cut(corpus)
    assert got == exp
    assert got[1][1] == 15 and got[2][1] == 15 and got[3][1] == 0
    assert got[1][2] == _words("a", 5) + " " + _words("z", 4)


def test_disjoint_spans_are_separate_islands(spark):
    s1, s2 = _words("p", 13), _words("q", 13)
    gap = _words("g", 6)  # gap shorter than K but > 0: islands split
    corpus = {
        1: s1 + " " + gap + " " + s2,
        2: s1 + " " + _words("x", 20) + " " + s2,
    }
    got = _run(spark, corpus)
    exp = _py_cut(corpus)
    assert got == exp
    # both docs keep their middles, lose both 13-token spans
    assert got[1][1] == 26 and got[1][2] == gap


def test_short_and_fully_duplicated_docs(spark):
    tiny = _words("t", 12)  # shorter than K: can never be cut
    dup = _words("d", 13)
    corpus = {1: tiny, 2: dup, 3: dup, 4: tiny}
    got = _run(spark, corpus)
    exp = _py_cut(corpus)
    assert got == exp
    # tiny docs untouched even though they repeat (no 13-gram exists)
    assert got[1] == (12, 0, tiny)
    # fully duplicated docs are cut to empty
    assert got[2] == (13, 13, "") and got[3] == (13, 13, "")


def test_real_corpus_consistency(spark):
    rows = D.exact_substr_cut(spark, SF_DIR).collect()
    stats = {
        r["doc_id"]: r
        for r in D.duplicate_span_stats(spark, SF_DIR).collect()
    }
    for r in rows:
        st = stats[r["doc_id"]]
        # the interval-union cut removes exactly the covered tokens
        # duplicate_span_stats counts via distinct indices
        assert r["n_cut"] == st["covered_tokens"], r["doc_id"]
        n_kept_words = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
        assert n_kept_words == r["n_tokens"] - r["n_cut"]


def test_decontaminate_cut_semantics(spark):
    # eval doc shares a 15-token run with one train doc; another train
    # doc is clean.  Only the overlapping span is cut, only from the
    # train doc.  doc_id % 10 == 7 marks the eval split.
    shared = _words("s", 15)
    corpus = {
        7: _words("e", 3) + " " + shared,          # eval
        1: _words("a", 4) + " " + shared + " " + _words("z", 3),  # train hit
        2: _words("c", 30),                        # train clean
    }
    got = _run_decon(spark, corpus)
    assert set(got) == {1, 2}  # eval doc not rewritten
    assert got[1] == (22, 15, _words("a", 4) + " " + _words("z", 3))
    assert got[2] == (30, 0, _words("c", 30))


def _run_decon(spark, corpus):
    df = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    orig = D._docs
    try:
        D._docs = lambda spark, sf_dir: df
        return {
            r["doc_id"]: (r["n_tokens"], r["n_cut"], r["clean_text"])
            for r in D.decontaminate_cut(spark, SF_DIR).collect()
        }
    finally:
        D._docs = orig


def test_decontaminate_plan_broadcasts_eval_side(spark):
    plan = (
        D.decontaminate_cut(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
