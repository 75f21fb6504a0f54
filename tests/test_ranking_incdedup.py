"""Round-3 operators: TF-IDF / BM25 ranking, SemDeDup semantic dedup,
incremental new-batch-vs-corpus dedup.  (Exact cross-engine values are
oracle-checked by the driver and scripts/check_oracles.py; these tests
pin the SEMANTICS on handcrafted corpora.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import dedup, ranking, similarity

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_tfidf_rare_term_outranks_common(spark, tmp_path):
    """A term unique to one doc must outrank a term present in every
    doc (same tf), and ranks must be 1..k with non-increasing score."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "common zebra extra other words here", "en", "s", 10),
            (2, "common filler text padding words here", "en", "s", 10),
            (3, "common more filler text words again", "en", "s", 10),
        ],
    )
    out = ranking.tfidf_topk(spark, d).collect()
    doc1 = sorted(
        [r for r in out if r["doc_id"] == 1], key=lambda r: r["rank"]
    )
    terms = {r["term"]: r for r in doc1}
    assert "zebra" in terms and "common" in terms
    assert terms["zebra"]["score"] > terms["common"]["score"]
    assert terms["zebra"]["df"] == 1 and terms["common"]["df"] == 3
    scores = [r["score"] for r in doc1]
    assert scores == sorted(scores, reverse=True)
    assert [r["rank"] for r in doc1] == list(range(1, len(doc1) + 1))


def test_tfidf_tf_counts_and_topk_bound(spark, tmp_path):
    d = _write_docs(
        spark, tmp_path, [(1, "a a a b b c d e f g h", "en", "s", 10)]
    )
    out = ranking.tfidf_topk(spark, d).collect()
    assert len(out) == ranking.TFIDF_TOP_K
    by_term = {r["term"]: r["tf"] for r in out}
    assert by_term.get("a") == 3  # highest tf => always in top-k


def test_bm25_more_matches_and_length_norm(spark, tmp_path):
    """More distinct query terms -> higher score; same tf but longer
    doc -> lower score (b-length normalization)."""
    filler = " ".join(["x"] * 20)
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "spark join vector stream " + filler, "en", "s", 10),
            (2, "spark join " + filler, "en", "s", 10),
            (3, "spark join " + filler + " " + " ".join(["y"] * 40), "en", "s", 10),
            (4, filler, "en", "s", 10),
        ],
    )
    out = {r["doc_id"]: r for r in ranking.bm25_search(spark, d).collect()}
    assert out[1]["score"] > out[2]["score"] > out[3]["score"]
    assert out[4]["score"] == 0.0
    assert out[1]["tf_spark"] == 1 and out[4]["tf_spark"] == 0


def test_bm25_topk_bound_on_testdata(spark):
    rows = ranking.bm25_search(spark, SF_DIR).collect()
    assert len(rows) <= ranking.BM25_TOP_K
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_semantic_dedup_flags_injected_copies_only(spark):
    """Every injected scaled copy (cosine ~1 to its source) is a dup;
    the natural corpus (max within-cluster cosine ~0.47) is clean;
    sources keep their lower id (keep-lowest rule)."""
    out = similarity.semantic_dedup(spark, SF_DIR).collect()
    n_base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    injected = {
        r["vec_id"]
        for r in out
        if r["vec_id"] >= similarity.SEMDEDUP_INJECT_OFFSET
    }
    dups = {r["vec_id"] for r in out if r["is_dup"]}
    assert len(out) == n_base + len(injected)
    assert dups == injected  # all copies flagged, nothing else
    for r in out:
        if r["vec_id"] in injected:
            assert r["max_cosine_lower"] >= 0.999999


def test_semantic_dedup_dup_requires_same_cluster(spark):
    """is_dup implies a LOWER-id cluster member at >= threshold —
    recompute the check from the output columns."""
    out = similarity.semantic_dedup(spark, SF_DIR)
    bad = out.filter(
        F.col("is_dup")
        & (
            F.col("max_cosine_lower").isNull()
            | (F.col("max_cosine_lower") < similarity.SEMDEDUP_T)
        )
    ).count()
    assert bad == 0


def test_incremental_dedup_refetches_are_exact_dups(spark):
    out = dedup.incremental_dedup(spark, SF_DIR).collect()
    refetch = [
        r for r in out if r["doc_id"] >= dedup.INC_COPY_OFFSET
    ]
    assert refetch, "split must inject at least one refetch"
    for r in refetch:
        assert r["dup_exact"] and r["dup_near"] and not r["keep"], r
    # output holds ONLY the new batch: fresh ids have % 3 == 2
    for r in out:
        if r["doc_id"] < dedup.INC_COPY_OFFSET:
            assert r["doc_id"] % dedup.INC_NEW_MOD == dedup.INC_NEW_MOD - 1


def test_incremental_dedup_keep_is_consistent(spark):
    out = dedup.incremental_dedup(spark, SF_DIR)
    bad = out.filter(
        F.col("keep") != ~(F.col("dup_exact") | F.col("dup_near"))
    ).count()
    assert bad == 0


def test_incremental_near_dups_verify_against_bruteforce(spark, tmp_path):
    """Handcrafted cross-split near-dup: new doc 2 (% 3 == 2) is a
    one-token edit of historical doc 0 -> dup_near (not exact); an
    unrelated new doc keeps."""
    w = [f"w{i}" for i in range(12)]
    d = _write_docs(
        spark,
        tmp_path,
        [
            (0, " ".join(w), "en", "s", 10),
            (1, "other unrelated historical text entirely", "en", "s", 10),
            (2, " ".join(w[:-1] + ["zz"]), "en", "s", 10),  # ~0.818 vs doc 0
            (5, "nothing like anything else at all here", "en", "s", 10),
        ],
    )
    out = {r["doc_id"]: r for r in dedup.incremental_dedup(spark, d).collect()}
    assert set(out) == {2, 5, 1_000_000}  # new batch + refetch of doc 0
    assert out[2]["dup_near"] and not out[2]["dup_exact"] and not out[2]["keep"]
    assert out[5]["keep"] and not out[5]["dup_near"] and not out[5]["dup_exact"]


def test_inverted_index_postings_and_stop_rule(spark, tmp_path):
    """Hand corpus: postings are doc_id-sorted doc:tf entries over
    unigrams AND bigrams; a term in > 1/INDEX_STOP_DEN of docs is
    stop-listed (NULL postings) while keeping df/total_tf."""
    # 11 docs; "hot" appears in 2 (2*10 > 11 -> stop-listed);
    # "cold" in 1; bigram "cold snap" in 1
    rows = [(1, "hot cold snap", "en", "s", 10), (2, "hot hot end", "en", "s", 10)]
    rows += [(i, f"u{i} filler{i}", "en", "s", 10) for i in range(3, 12)]
    d = _write_docs(spark, tmp_path, rows)
    out = {r["term"]: r for r in ranking.inverted_index(spark, d).collect()}
    assert out["hot"]["df"] == 2 and out["hot"]["total_tf"] == 3
    assert out["hot"]["postings"] is None  # stop-listed: 2*10 > 11
    assert out["cold"]["postings"] == "1:1"
    assert out["cold snap"]["postings"] == "1:1"  # bigram indexed
    assert out["hot hot"]["postings"] == "2:1"
    # postings sorted by doc_id and tf correct for a multi-doc term
    assert all(
        r["postings"] is None
        or [int(p.split(":")[0]) for p in r["postings"].split(" ")]
        == sorted(int(p.split(":")[0]) for p in r["postings"].split(" "))
        for r in out.values()
    )


def test_inverted_index_df_equals_postings_len(spark):
    """On real testdata: every non-stop term's postings length == df,
    and every stop-listed term exceeds the document-fraction rule."""
    out = ranking.inverted_index(spark, SF_DIR)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = out.collect()
    assert any(r["postings"] is None for r in rows)  # both branches
    assert any(r["postings"] is not None for r in rows)
    for r in rows:
        if r["postings"] is None:
            assert r["df"] * ranking.INDEX_STOP_DEN > n_docs
        else:
            assert r["df"] * ranking.INDEX_STOP_DEN <= n_docs
            assert len(r["postings"].split(" ")) == r["df"]
