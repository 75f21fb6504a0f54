"""WARC sink/source (sources/warc.py): spec-shaped records, byte-true
Content-Length framing (incl. non-ASCII and adversarial payloads),
map-only write plan, and the fidelity round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from indigent_defense_stats_spark.sources import warc

SF_DIR = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_date string, payload string"
    )


def test_record_shape_and_deterministic_id(spark):
    rec = warc.to_warc_records(
        _df(spark, [("https://a/1", "2020-01-01T00:00:00Z", "hello")])
    ).collect()[0][0]
    assert rec.startswith("WARC/1.0\r\nWARC-Type: response\r\n")
    assert "WARC-Target-URI: https://a/1\r\n" in rec
    assert "Content-Length: 5\r\n\r\nhello\r\n\r\n" in rec
    # re-export is byte-identical (no uuid4 / now())
    rec2 = warc.to_warc_records(
        _df(spark, [("https://a/1", "2020-01-01T00:00:00Z", "hello")])
    ).collect()[0][0]
    assert rec == rec2


def test_roundtrip_nonascii_and_adversarial_payloads(spark, tmp_path):
    """Content-Length is OCTETS: a non-ASCII payload de-frames any
    character-counting reader; a payload containing the record magic
    or CRLFCRLF de-frames any delimiter-splitting reader."""
    rows = [
        ("https://a/1", "2020-01-01T00:00:00Z", "wörld éé ümlaut"),
        ("https://a/2", "2020-01-02T00:00:00Z", "evil\r\n\r\nWARC/1.0\r\ninside"),
        ("https://a/3", "2020-01-03T00:00:00Z", ""),
        ("https://a/4", "2020-01-04T00:00:00Z", "plain"),
    ]
    out = warc.write_warc(
        warc.to_warc_records(_df(spark, rows)), str(tmp_path / "w")
    )
    back = {
        r.url: (r.warc_date, r.payload)
        for r in warc.read_warc(spark, out).collect()
    }
    assert back == {u: (d, p) for u, d, p in rows}


def test_write_plan_is_map_only(spark):
    rec = warc.to_warc_records(warc._doc_fetches(spark, SF_DIR))
    plan = rec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_roundtrip_stats_has_seven_buckets(spark):
    out = warc.warc_roundtrip_stats(spark, SF_DIR)
    rows = out.collect()
    assert [r.bucket for r in rows] == list(range(7))
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_records for r in rows) == n_docs


def test_frame_file_rejects_bad_magic():
    import pytest

    with pytest.raises(ValueError, match="bad record magic"):
        list(warc._frame_file(b"HTTP/1.1 200 OK\r\n\r\nnope"))
