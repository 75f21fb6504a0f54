"""rfc_normalize= engine knob: spec-equivalent URL spellings collapse
to one canonical_url (one fetch), and on the reference world — whose
URLs are already spec-normal — the knob is a proven NO-OP (identical
crawl output on vs off)."""

from __future__ import annotations

from datetime import date

import pyspark.sql.functions as F

from indigent_defense_stats_spark import oracle, synth
from indigent_defense_stats_spark.plans.frontier import CrawlEngine

START = date(2024, 7, 1)


def _canon_of(spark, eng, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(eng._canon(F.col("url")).alias("c")).collect()
    ]


def test_spec_variants_collapse_only_with_knob(spark, tmp_path):
    reg = synth.make_registry(1, n_scrape=1)
    off = CrawlEngine(spark, str(tmp_path / "off"), reg, START, 1)
    on = CrawlEngine(
        spark, str(tmp_path / "on"), reg, START, 1, rfc_normalize=True
    )
    variants = [
        "HTTP://Portal.Example:80/a/b/../CaseDetail.aspx?id=7",
        "http://portal.example/a/CaseDetail.aspx?id=7",
        "http://portal.example/x/./%7Euser?q=%2f",
        "http://portal.example/x/~user?q=%2F",
    ]
    c_off = _canon_of(spark, off, variants)
    c_on = _canon_of(spark, on, variants)
    # with the knob: both spelling pairs collapse
    assert c_on[0] == c_on[1] and c_on[2] == c_on[3]
    # without it: all four stay distinct (the refetch waste)
    assert len(set(c_off)) == 4


def test_reference_world_is_a_fixpoint(spark, tmp_path):
    # the reference portals emit spec-normal URLs, so the normalizer
    # must change NOTHING: same fetch log, same seen set, same docs
    reg = synth.make_registry(2, n_scrape=2)
    log = oracle.crawl(reg, START, 1)
    outs = {}
    for name, knob in (("off", False), ("on", True)):
        eng = CrawlEngine(
            spark,
            str(tmp_path / name),
            reg,
            START,
            1,
            n_buckets=2,
            rfc_normalize=knob,
        )
        eng.run()
        outs[name] = (
            sorted(engine_rows(eng)),
            {u for _, u in eng.priority_sorted_log()},
        )
    assert outs["off"] == outs["on"]
    # and both equal the sequential oracle's fetched-URL set
    assert outs["on"][1] == {f["url"] for f in log.fetches}


def engine_rows(eng):
    return [
        (r["canonical_url"], r["status"])
        for r in eng.log_t.read().select("canonical_url", "status").collect()
    ]
