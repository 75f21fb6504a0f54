"""Winnowing fingerprints (operators/winnow.py): the SIGMOD'03 paper's
coverage guarantee, the density bound, and match symmetry."""

from __future__ import annotations

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import winnow


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = winnow._fingerprints(df).collect()
    by_doc: dict[int, set[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    return by_doc


def test_coverage_guarantee(spark):
    """Any two docs sharing a token run of >= W + K - 1 tokens share at
    least one fingerprint — the paper's theorem 1 guarantee, on a run
    embedded in otherwise-disjoint text."""
    run = " ".join(f"shared{i}" for i in range(winnow.W + winnow.K - 1))
    rows = [
        (1, "alpha beta gamma " + run + " delta epsilon zeta"),
        (2, "uno dos tres cuatro " + run + " cinco seis"),
    ]
    by_doc = _fps(spark, rows)
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"


def test_short_run_no_guarantee_but_disjoint_text_no_match(spark):
    """Fully disjoint vocabularies share nothing."""
    rows = [
        (1, " ".join(f"a{i}" for i in range(40))),
        (2, " ".join(f"b{i}" for i in range(40))),
    ]
    by_doc = _fps(spark, rows)
    assert not (by_doc.get(1, set()) & by_doc.get(2, set()))


def test_density_and_short_doc(spark):
    """Selected fingerprints are between 1 and the window count; a doc
    shorter than K + W - 1 tokens selects none (no full window)."""
    n_tok = 60
    rows = [
        (1, " ".join(f"w{i}" for i in range(n_tok))),
        (2, " ".join(f"s{i}" for i in range(winnow.K + winnow.W - 2))),
    ]
    by_doc = _fps(spark, rows)
    n_windows = (n_tok - winnow.K + 1) - winnow.W + 1
    assert 1 <= len(by_doc[1]) <= n_windows
    assert 2 not in by_doc


def test_matches_respects_maxdf_and_threshold(spark, tmp_path):
    """winnow_matches on a world with one true near-dup pair: the pair
    is reported with n_shared_fp >= MIN_SHARED, and doc order is
    doc_a < doc_b."""
    base = " ".join(f"tok{i}" for i in range(50))
    rows = [
        (1, base + " suffix one"),
        (2, base + " other ending here"),
        (3, " ".join(f"z{i}" for i in range(50))),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("bigint")
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = winnow.winnow_matches(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared_fp"] for r in got}
    assert (1, 2) in pairs and pairs[(1, 2)] >= winnow.MIN_SHARED
    assert all(a < b for a, b in pairs)
    assert not any(3 in p for p in pairs)
