"""Sketch-algebra queries: HLL inclusion-exclusion overlap (union
consistency, symmetry-free pairing, accuracy vs exact) and the LSH
recall/precision report (counts consistent with the two pair sets)."""

from __future__ import annotations

from indigent_defense_stats_spark.operators import dedup as D
from indigent_defense_stats_spark.operators import sketches as S

SF_DIR = "/root/testdata/sf0.001"


def test_overlap_identities(spark):
    rows = S.hll_overlap_estimate(spark, SF_DIR).collect()
    assert rows  # >= 2 event types in the testdata
    singles = {
        r["event_type"]: r["hll_est"]
        for r in S.hll_distinct(spark, SF_DIR).collect()
    }
    for r in rows:
        # pairing is a strict upper triangle
        assert r["type_a"] < r["type_b"]
        # single estimates agree with hll_distinct's (same machinery)
        assert round(singles[r["type_a"]], 6) == r["est_a"]
        assert round(singles[r["type_b"]], 6) == r["est_b"]
        # union sketch bounds: max single <= union <= sum of singles
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9
        assert r["est_union"] <= r["est_a"] + r["est_b"] + 1e-9
        # inclusion-exclusion arithmetic is internally consistent
        assert (
            abs(r["est_overlap"] - (r["est_a"] + r["est_b"] - r["est_union"]))
            < 1e-5
        )


def test_overlap_accuracy(spark):
    rows = S.hll_overlap_estimate(spark, SF_DIR).collect()
    for r in rows:
        if r["exact_overlap"] >= 200:
            rel = abs(r["est_overlap"] - r["exact_overlap"]) / r[
                "exact_overlap"
            ]
            # intersection via subtraction compounds the error of three
            # m=64 estimates; allow a generous envelope
            assert rel < 0.6, (r["type_a"], r["type_b"], rel)


def test_lsh_recall_report_counts(spark):
    rep = D.lsh_recall_report(spark, SF_DIR).collect()
    assert len(rep) == 1
    r = rep[0]
    n_exact = D.ngram_jaccard_pairs(spark, SF_DIR).count()
    n_lsh = D.minhash_lsh_neardup(spark, SF_DIR).count()
    assert r["n_exact"] == n_exact
    assert r["n_lsh"] == n_lsh
    assert r["n_common"] <= min(n_exact, n_lsh)
    # LSH verifies candidates with exact Jaccard -> precision is 1.0
    # (every LSH pair is a true pair; banding only loses recall)
    assert r["precision"] == 1.0
    assert r["n_common"] == r["n_lsh"]
    assert 0.0 <= r["recall"] <= 1.0
