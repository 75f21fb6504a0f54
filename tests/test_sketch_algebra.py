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


def test_lsh_recall_report_sampling(spark):
    """The mechanical sampling contract: the sampled report's counts
    equal the FULL pair sets restricted to sample-endpoint pairs —
    because pair membership (exact Jaccard and per-doc LSH signatures
    alike) depends only on the two endpoint documents, sampling docs
    before pair generation loses exactly the pairs with an unsampled
    endpoint and nothing else."""
    import pyspark.sql.functions as F

    frac, seed = 0.5, 7
    rep = D.lsh_recall_report(
        spark, SF_DIR, sample_frac=frac, sample_seed=seed
    ).collect()[0]

    keep = int(frac * D.SAMPLE_DEN)
    sampled = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(
            F.pmod(
                F.xxhash64(F.col("doc_id").cast("string"), F.lit(seed)),
                F.lit(D.SAMPLE_DEN),
            )
            < keep
        )
        .select("doc_id")
        .collect()
    }
    assert 0 < len(sampled)

    def restrict(df):
        return {
            (r["d1"], r["d2"])
            for r in df.select("d1", "d2").collect()
            if r["d1"] in sampled and r["d2"] in sampled
        }

    exact_r = restrict(D.ngram_jaccard_pairs(spark, SF_DIR))
    lsh_r = restrict(D.minhash_lsh_neardup(spark, SF_DIR))
    assert rep["n_exact"] == len(exact_r)
    assert rep["n_lsh"] == len(lsh_r)
    assert rep["n_common"] == len(exact_r & lsh_r)
    # the contract is only meaningful if the sample actually bites
    full = D.lsh_recall_report(spark, SF_DIR).collect()[0]
    assert rep["n_exact"] <= full["n_exact"]
