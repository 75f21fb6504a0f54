"""Decontamination + repetition filters: invariants and hand-built
ground truth.  (Exact DuckDB-oracle equality is covered by the driver
and scripts/check_oracles.py.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import decontam

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_contamination_invariants(spark):
    out = decontam.benchmark_contamination(spark, SF_DIR)
    rows = out.collect()
    # eval split excluded from the report
    assert all(r["doc_id"] % decontam.EVAL_MOD != decontam.EVAL_REM for r in rows)
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_grams"]
        assert 0.0 <= r["contamination"] <= 1.0
        assert r["contaminated"] == (1 if r["n_hits"] > 0 else 0)


def test_contamination_exact_copy_flagged(spark, tmp_path):
    """A training doc that verbatim-copies an eval doc's 13+ tokens is
    contaminated; an unrelated doc is not; a short doc reports 0 grams."""
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi"
    rows = [
        (7, eval_text, "en", "s", len(eval_text)),  # eval split (7 % 10 == 7)
        (1, "prefix words " + eval_text, "en", "s", 10),  # contains eval 13-grams
        (2, "totally different content " * 4, "en", "s", 10),
        (3, "tiny doc", "en", "s", 8),  # < 13 tokens
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in decontam.benchmark_contamination(spark, d).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["contaminated"] == 1 and got[1]["n_hits"] >= 1
    assert got[2]["contaminated"] == 0
    assert got[3]["n_grams"] == 0 and got[3]["contamination"] == 0.0


def test_repetition_hand_computed(spark, tmp_path):
    rows = [
        # 4 tokens, all same: dup_frac = 1 - 1/4; bigrams: 3x "a a" -> 1.0
        (1, "a a a a", "en", "s", 7),
        # all distinct: dup 0; bigrams all distinct -> top frac 1/3
        (2, "w x y z", "en", "s", 7),
        (3, "solo", "en", "s", 4),  # single token: no bigrams -> 0.0
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in decontam.repetition_stats(spark, d).collect()}
    assert got[1]["dup_token_frac"] == 0.75 and got[1]["top_bigram_frac"] == 1.0
    assert got[2]["dup_token_frac"] == 0.0
    assert abs(got[2]["top_bigram_frac"] - 1 / 3) < 1e-6
    assert got[3]["top_bigram_frac"] == 0.0


def test_no_python_udf_in_repetition_plan(spark):
    """repetition_stats must stay entirely JVM-side (no BatchEvalPython
    / ArrowEvalPython in the physical plan)."""
    plan = (
        decontam.repetition_stats(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_contamination_joins_broadcast(spark):
    """The eval-gram join must broadcast (never shuffle the corpus)."""
    plan = (
        decontam.benchmark_contamination(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cross_doc_chunk_dup_detects_copies(spark, tmp_path):
    """Two docs sharing an identical 10-token chunk are both flagged;
    a unique doc reports zero shared chunks."""
    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, shared + " tail a b c", "en", "s", 10),
        (2, shared + " other words here now", "en", "s", 10),
        (3, "entirely unique tokens nothing here repeats at all ok fine", "en", "s", 10),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in decontam.cross_doc_chunk_dup(spark, d).collect()}
    assert got[1]["n_shared_chunks"] >= 1
    assert got[2]["n_shared_chunks"] >= 1
    assert got[3]["n_shared_chunks"] == 0 and got[3]["shared_frac"] == 0.0


def test_top_bigram_fold_matches_bruteforce(spark, tmp_path):
    """The sorted run-length fold equals the brute-force most-frequent-
    bigram count over a generated corpus (incl. repeats and ties)."""
    import random
    from collections import Counter

    rng = random.Random(42)
    vocab = ["a", "b", "c", "d", "e"]
    rows = []
    for i in range(40):
        n = rng.randint(1, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n)), "en", "s", n))
    d = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in decontam.repetition_stats(spark, d).collect()}
    for i, text, *_ in rows:
        toks = text.split(" ")
        bis = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        expect = (max(Counter(bis).values()) / len(bis)) if bis else 0.0
        assert abs(got[i]["top_bigram_frac"] - round(expect, 6)) < 1e-9, (i, text)


def test_clean_corpus_composition(spark):
    """clean_corpus == intersection of its three component filters."""
    kept = {r["doc_id"] for r in decontam.clean_corpus(spark, SF_DIR).collect()}
    cont_ok = {
        r["doc_id"]
        for r in decontam.benchmark_contamination(spark, SF_DIR).collect()
        if r["contaminated"] == 0
    }
    rep_ok = {
        r["doc_id"]
        for r in decontam.repetition_stats(spark, SF_DIR).collect()
        if r["dup_token_frac"] <= decontam.DUP_TOKEN_MAX
        and r["top_bigram_frac"] <= decontam.TOP_BIGRAM_MAX
    }
    assert kept <= cont_ok & rep_ok
    # eval split never leaks into the training corpus
    assert all(d % decontam.EVAL_MOD != decontam.EVAL_REM for d in kept)


def test_pii_scrub_redacts_and_preserves(spark):
    """pii_scrub_expr: redacts emails/phones/SSNs, leaves lookalikes
    (version strings, decimals, @handles without TLDs) intact."""
    import pyspark.sql.functions as F

    from indigent_defense_stats_spark.operators.textstats import (
        pii_scrub_expr,
    )

    cases = [
        (1, "mail me at jo.doe+x@sub.example.org today"),
        (2, "call 512-555-1234 or 512.555.9999"),
        (3, "ssn 123-45-6789 on file"),
        (4, "v1.2.3 released; price 3.14; ratio 10-20"),
        (5, "@handle is not an email; 1234-56-789 not an ssn"),
        (6, "a@b.co and 111-22-3333 and 999-888-7777 together"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    scrubbed, counts = pii_scrub_expr(F.col("text"))
    got = {
        r["doc_id"]: (r["out"], r["n_ssn"], r["n_phone"], r["n_email"])
        for r in df.select("doc_id", scrubbed.alias("out"), *counts).collect()
    }
    assert got[1] == ("mail me at <EMAIL> today", 0, 0, 1)
    assert got[2] == ("call <PHONE> or <PHONE>", 0, 2, 0)
    assert got[3] == ("ssn <SSN> on file", 1, 0, 0)
    assert got[4] == ("v1.2.3 released; price 3.14; ratio 10-20", 0, 0, 0)
    assert got[5] == ("@handle is not an email; 1234-56-789 not an ssn", 0, 0, 0)
    assert got[6] == ("<EMAIL> and <SSN> and <PHONE> together", 1, 1, 1)


def test_duplicate_span_stats_hand_computed(spark, tmp_path):
    """ExactSubstr-style duplicated-window marking: a 13-gram shared
    across two docs marks exactly its 13 tokens in each; a fully
    self-repeating doc is 100% covered; unique and short docs are 0."""
    K = decontam.NGRAM
    shared = " ".join(f"t{i}" for i in range(K))
    rows = [
        (1, shared + " xa xb xc", "en", "s", 16),   # 16 toks, 1 dup window
        (2, shared + " ya yb", "en", "s", 15),      # 15 toks, 1 dup window
        (3, " ".join(f"u{i}" for i in range(K + 1)), "en", "s", 14),  # unique
        (4, " ".join(["r"] * (2 * K)), "en", "s", 26),  # all windows equal
        (5, "too short", "en", "s", 2),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in decontam.duplicate_span_stats(spark, d).collect()}
    assert (got[1]["n_dup_grams"], got[1]["covered_tokens"]) == (1, K)
    assert got[1]["dup_frac"] == round(K / 16, 6)
    assert (got[2]["n_dup_grams"], got[2]["covered_tokens"]) == (1, K)
    assert (got[3]["n_dup_grams"], got[3]["covered_tokens"]) == (0, 0)
    # doc 4: 2K tokens of "r" -> K+1 identical windows, full coverage
    assert (got[4]["n_dup_grams"], got[4]["covered_tokens"]) == (K + 1, 2 * K)
    assert got[4]["dup_frac"] == 1.0
    assert (got[5]["n_dup_grams"], got[5]["covered_tokens"], got[5]["dup_frac"]) == (0, 0, 0.0)


def test_duplicate_span_stats_matches_bruteforce(spark, tmp_path):
    """Coverage equals a brute-force global 13-gram occurrence count
    over a generated corpus with planted cross-doc and in-doc repeats."""
    import random
    from collections import Counter

    K = decontam.NGRAM
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(9)]  # small vocab -> real collisions
    rows = []
    for i in range(30):
        n = rng.randint(5, 60)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n)), "en", "s", n))
    d = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in decontam.duplicate_span_stats(spark, d).collect()}

    all_grams = Counter()
    toks_by_doc = {}
    for i, text, *_ in rows:
        toks = text.lower().split(" ")
        toks_by_doc[i] = toks
        for j in range(len(toks) - K + 1):
            all_grams[" ".join(toks[j : j + K])] += 1
    for i, toks in toks_by_doc.items():
        covered = set()
        n_dup = 0
        for j in range(len(toks) - K + 1):
            if all_grams[" ".join(toks[j : j + K])] > 1:
                n_dup += 1
                covered.update(range(j, j + K))
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["n_dup_grams"] == n_dup, i
        assert r["covered_tokens"] == len(covered), i
        expect = round(len(covered) / len(toks), 6) if toks else 0.0
        assert abs(r["dup_frac"] - expect) < 1e-9, i
