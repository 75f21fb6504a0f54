"""Unicode NFC normalization: fixture semantics (composition,
singleton mapping, ligature preservation), idempotence, and the
map-only plan contract."""

from __future__ import annotations

import unicodedata

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import unicodenorm as U

SF_DIR = "/root/testdata/sf0.001"


def test_fixture_exercises_every_nfc_behavior():
    changed = [unicodedata.normalize("NFC", v) != v for v in U.NFC_VARIANTS]
    # both changed and unchanged variants present
    assert any(changed) and not all(changed)
    # decomposed accent composes to the precomposed sibling
    assert (
        unicodedata.normalize("NFC", U.NFC_VARIANTS[0]) == U.NFC_VARIANTS[1]
    )
    # ANGSTROM SIGN singleton maps to LATIN CAPITAL A WITH RING
    assert unicodedata.normalize("NFC", "Å") == "Å"
    # ligature untouched by NFC (NFKC would decompose it)
    lig = U.NFC_VARIANTS[-1]
    assert unicodedata.normalize("NFC", lig) == lig
    assert unicodedata.normalize("NFKC", lig) != lig


def test_normalization_rows(spark):
    rows = U.nfc_normalize_docs(spark, SF_DIR).collect()
    assert len(rows) == 500
    n_changed = 0
    for r in rows:
        # codepoint counts: composition only ever shrinks or preserves
        assert r["n_cp_after"] <= r["n_cp_before"]
        assert r["changed"] == (r["n_cp_after"] < r["n_cp_before"]) or (
            # singleton substitutions keep the length but change text
            r["changed"] and r["n_cp_after"] == r["n_cp_before"]
        )
        # idempotence
        assert (
            unicodedata.normalize("NFC", r["text_nfc"]) == r["text_nfc"]
        )
        n_changed += bool(r["changed"])
    # expected count from the variant classes that NFC changes
    changing = {
        i
        for i, v in enumerate(U.NFC_VARIANTS)
        if unicodedata.normalize("NFC", v) != v
    }
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    expected = sum(1 for d in ids if d % len(U.NFC_VARIANTS) in changing)
    assert n_changed == expected


def test_plan_is_single_python_stage(spark):
    plan = (
        U.nfc_normalize_docs(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1
