"""JSONL documents source (sources/jsonl.py): schema-explicit read,
round-trip fidelity, and malformed-line quarantine."""

from __future__ import annotations

from indigent_defense_stats_spark.sources import jsonl

SF_DIR = "/root/testdata/sf0.001"


def test_jsonl_round_trip_preserves_documents(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = str(tmp_path / "dump")
    jsonl.write_documents_jsonl(docs, p)
    back = jsonl.read_documents_jsonl(spark, p)
    assert back.filter("is_corrupt").count() == 0
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    a = {tuple(r) for r in docs.select(cols).collect()}
    b = {tuple(r) for r in back.select(cols).collect()}
    assert a == b


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    p = tmp_path / "dump"
    p.mkdir()
    good = '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}'
    bad1 = '{"doc_id": 2, "text": "truncated...'  # cut mid-string
    bad2 = "not json at all"
    (p / "part-0.json").write_text("\n".join([good, bad1, bad2]) + "\n")

    out = jsonl.read_documents_jsonl(spark, str(p))
    ok = out.filter("NOT is_corrupt").collect()
    quarantined = out.filter("is_corrupt").collect()
    assert len(ok) == 1 and ok[0]["doc_id"] == 1 and ok[0]["text"] == "hello world"
    # every malformed line kept, raw bytes preserved (S9 contract)
    assert {r["raw_record"] for r in quarantined} == {bad1, bad2}
    assert all(r["doc_id"] is None for r in quarantined)
    # nothing silently dropped
    assert out.count() == 3
