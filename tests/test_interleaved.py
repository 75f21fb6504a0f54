"""Interleaved span table operators: invariants + plan shape.
(Exact DuckDB-oracle equality is covered by the driver and
scripts/check_oracles.py.)"""

from __future__ import annotations

from indigent_defense_stats_spark import schemas
from indigent_defense_stats_spark.operators import interleaved

SF_DIR = "/root/testdata/sf0.001"


def test_reconstruct_roundtrip_holds(spark):
    rows = interleaved.span_reconstruct_check(spark, SF_DIR).collect()
    assert rows and all(r["reconstruct_ok"] == 1 for r in rows)
    for r in rows:
        # media span after every 3rd text span
        assert r["n_media_spans"] == r["n_text_spans"] // interleaved.MEDIA_EVERY
        refs = [x for x in r["media_refs"].split(",") if x]
        assert len(refs) == r["n_media_spans"]
        assert refs == [f"m://{r['doc_id']}/{k}" for k in range(len(refs))]


def test_span_columns_match_input_hint_schema(spark):
    """Exploded output carries exactly the input_hint span fields."""
    cols = set(interleaved.interleaved_spans(spark, SF_DIR).columns)
    span_fields = {f.name for f in schemas.SPAN.fields}
    assert span_fields <= cols | {"offset"}
    assert {"doc_id", "offset", "kind", "text", "media_ref"} == cols


def test_plan_is_map_only(spark):
    """Span build + explode must be a pure map: no shuffle (Exchange),
    no Python (EvalPython) in the physical plan."""
    plan = (
        interleaved.interleaved_spans(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
