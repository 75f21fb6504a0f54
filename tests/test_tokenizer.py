"""BPE trainer semantics: the JVM merge fold vs hand-computed
corpora (greedy left-to-right, non-overlapping, fresh-token rule,
count-then-lexicographic tiebreak), plus full-corpus equality between
the distributed trainer and the independent pure-Python reference."""

from __future__ import annotations

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import tokenizer as T

SF_DIR = "/root/testdata/sf0.001"


def _apply_one(spark, word: str, a: str, b: str) -> list[str]:
    syms = F.transform(
        F.sequence(F.lit(1), F.char_length(F.lit(word))),
        lambda i: F.substring(F.lit(word), i, 1),
    )
    return spark.range(1).select(T._apply_merge(syms, a, b).alias("s")).head()["s"]


def test_merge_fold_greedy_nonoverlapping(spark):
    # 'aaa' under (a,a): first two merge, the FRESH 'aa' must not
    # swallow the third -> ['aa','a'], never ['aaa']
    assert _apply_one(spark, "aaa", "a", "a") == ["aa", "a"]
    assert _apply_one(spark, "aaaa", "a", "a") == ["aa", "aa"]
    # re-merge on a later occurrence is allowed
    assert _apply_one(spark, "abab", "a", "b") == ["ab", "ab"]
    # merged token parked as prev then flushed by a non-match
    assert _apply_one(spark, "aabb", "a", "b") == ["a", "ab", "b"]
    # no match at all
    assert _apply_one(spark, "xyz", "a", "b") == ["x", "y", "z"]
    # 1-char word
    assert _apply_one(spark, "q", "a", "b") == ["q"]


def test_fold_matches_reference_apply(spark):
    cases = [
        ("banana", "a", "n"),
        ("banana", "n", "a"),
        ("mississippi", "s", "s"),
        ("aaaaab", "a", "a"),
        ("abcabcabc", "b", "c"),
    ]
    for w, a, b in cases:
        assert _apply_one(spark, w, a, b) == T._ref_apply(list(w), a, b), (
            w,
            a,
            b,
        )


def test_tiebreak_is_count_desc_then_lexicographic(spark, tmp_path):
    # corpus 'ab' x2, 'cd' x2: pair counts tie at 2 -> (a,b) wins the
    # lexicographic tiebreak, then (c,d) is rank 2
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(0, "ab cd ab cd", "en", "s0", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(p)
    merges, _ = T._train(spark, str(tmp_path), n_merges=2)
    assert [(m[1], m[2]) for m in merges] == [("a", "b"), ("c", "d")]
    assert [m[4] for m in merges] == [2, 2]


def test_trainer_matches_independent_reference(spark, monkeypatch):
    # full-corpus equality at sf0.001 (the oracle itself runs at the
    # oracle sf; this pins the OTHER scale factor)
    monkeypatch.setattr(T, "_ORACLE_SF_DIR", SF_DIR)
    T._ref_train.cache_clear()
    try:
        ref_merges, ref_stats = T._ref_train()
        got = [
            tuple(r)
            for r in T.bpe_merge_ranks(spark, SF_DIR).collect()
        ]
        assert got == [tuple(m) for m in ref_merges]
        seg = [
            tuple(r)
            for r in T.bpe_segment_stats(spark, SF_DIR).collect()
        ]
        assert seg == list(ref_stats)
    finally:
        T._ref_train.cache_clear()


def test_segment_stats_invariants(spark):
    rows = T.bpe_segment_stats(spark, SF_DIR).collect()
    assert rows, "no sources"
    for r in rows:
        # merges only ever shrink the token count, never below the
        # word count; chars is an upper bound (1 token per char)
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]


def _mini_corpus(spark, tmp_path, rows):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t or "")) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(p)
    return str(tmp_path)


def test_trainer_stops_when_pairs_run_out(spark, tmp_path):
    # single-char words only -> zero adjacent pairs -> zero merges
    d = _mini_corpus(spark, tmp_path, ["a b c", "a b"])
    merges, _ = T._train(spark, d, n_merges=4)
    assert merges == []
    assert T.bpe_merge_ranks(spark, d).count() == 0


def test_trainer_early_stop_partial_merges(spark, tmp_path):
    # 'ab' exhausts after one merge: round 2 has no pairs left
    d = _mini_corpus(spark, tmp_path, ["ab ab ab"])
    merges, _ = T._train(spark, d, n_merges=4)
    assert [(m[1], m[2], m[4]) for m in merges] == [("a", "b", 3)]


def test_null_and_empty_text_rows_are_ignored(spark, tmp_path):
    d = _mini_corpus(spark, tmp_path, [None, "", "xy xy", "  !!  "])
    merges, _ = T._train(spark, d, n_merges=1)
    assert [(m[1], m[2], m[4]) for m in merges] == [("x", "y", 2)]
    seg = {r["source"]: tuple(r)[1:] for r in
           T.bpe_segment_stats(spark, d).collect()}
    # only the 'xy xy' doc (doc_id 2 -> source s0) contributes
    assert seg == {"s0": (2, 4, 2)}


def test_identical_docs_scale_counts_not_merges(spark, tmp_path):
    a = _mini_corpus(spark, tmp_path / "a", ["the cat sat"])
    b = _mini_corpus(spark, tmp_path / "b", ["the cat sat"] * 7)
    ma, _ = T._train(spark, a, n_merges=3)
    mb, _ = T._train(spark, b, n_merges=3)
    assert [(m[1], m[2]) for m in ma] == [(m[1], m[2]) for m in mb]
    assert [m[4] * 7 for m in ma] == [m[4] for m in mb]
