"""Large-config crawl parity: the north-rule equalities (URL-seen
set, per-host priority order, per-row span sequences) re-checked at a
config ~60x the unit-test world — 24 counties x 10 days, a four-figure
URL count with every priority class, version branch, retry schedule,
and dedup collision the synthetic world generates.  The small-world
tests catch semantic bugs; this one catches anything that only
appears under real fan-out (bucket collisions, wave batching,
cross-partition ordering).
"""

from __future__ import annotations

from datetime import date

import pytest

from indigent_defense_stats_spark import oracle, synth
from indigent_defense_stats_spark.plans.frontier import CrawlEngine

START = date(2024, 7, 1)
N_COUNTIES, N_DAYS = 24, 10


@pytest.fixture(scope="module")
def world():
    reg = synth.make_registry(N_COUNTIES, n_scrape=N_COUNTIES)
    return reg, oracle.crawl(reg, START, N_DAYS)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory, world):
    reg, _ = world
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("crawl-scale")),
        reg,
        START,
        N_DAYS,
        n_buckets=8,
    )
    eng.run()
    return eng


def test_scale_world_is_actually_bigger(world):
    _, log = world
    assert len(log.fetches) > 1500  # four-figure URL count
    assert len(log.documents) > 250


def test_scale_url_seen_set_equality(engine, world):
    _, log = world
    assert {u for _, u in engine.priority_sorted_log()} == {
        f["url"] for f in log.fetches
    }


def test_scale_per_host_priority_order(engine, world):
    _, log = world
    ps = engine.priority_sorted_log()
    for host in sorted({h for h, _ in ps}):
        eng_seq = [u for h, u in ps if h == host]
        assert eng_seq == log.host_sequence(host, dedup=True), host


def test_scale_span_sequence_equality(engine, world):
    _, log = world
    eng_docs = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in engine.documents().collect()
    }
    ora_docs = {
        cid: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for cid, (county, spans) in log.documents.items()
    }
    assert eng_docs == ora_docs
