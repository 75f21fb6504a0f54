"""Refresh crawl -> publish: the reference updater's flow, distributed.

The reference re-runs known cases through scrape -> clean -> updater,
where the updater skips records whose html_hash already exists and
versions the rest (updater/__init__.py:92-120).  Here
``CrawlEngine.refresh(generation)`` re-fetches every known case page
through the same politeness-paced fetch, and the parse -> clean ->
publish chain applies exactly those semantics set-based.  The
synthetic world drifts deterministically per generation
(synth.case_changed: ~1/3 of cases gain one event), giving ground
truth for WHICH cases must version-bump.
"""

from __future__ import annotations

from datetime import date

import pandas as pd
import pytest

from indigent_defense_stats_spark import synth
from indigent_defense_stats_spark.operators import clean, parse, publish
from indigent_defense_stats_spark.plans.frontier import (
    POLITENESS_MS,
    CrawlEngine,
)
from indigent_defense_stats_spark.sources.catalog import SnapshotTable

START = date(2024, 7, 1)


@pytest.fixture(scope="module")
def refreshed(spark, tmp_path_factory):
    """One crawl + publish + refresh(1) + republish, shared by the
    assertions below (the chain is the expensive part)."""
    reg = synth.make_registry(2, n_scrape=2)
    base = tmp_path_factory.mktemp("refresh")
    eng = CrawlEngine(spark, str(base / "crawl"), reg, START, 2, n_buckets=2)
    eng.run()
    clocks_after_crawl = dict(eng._clocks)

    charge_dim = spark.createDataFrame(pd.DataFrame(synth.make_charge_dim()))
    target = SnapshotTable(spark, str(base / "published"), None, "append")

    def publish_chain(docs):
        good = parse.good_records(parse.parse_documents(docs))
        cleaned = clean.clean_records(
            good, charge_dim, parsing_date="2024-07-31"
        )
        return publish.publish(cleaned, target, today="07-31-2024")

    docs0 = eng.documents()
    docs0_ids = {r["doc_id"] for r in docs0.select("doc_id").collect()}
    b1 = publish_chain(docs0).collect()
    docs1 = eng.refresh(generation=1)
    b2 = publish_chain(docs1).collect()
    return eng, clocks_after_crawl, docs0_ids, b1, docs1, b2


def test_refresh_refetches_every_known_case(refreshed):
    """The refresh seed set is exactly the crawl's case pages — every
    known doc comes back once, nothing new is discovered."""
    _, _, docs0_ids, _, docs1, _ = refreshed
    rows = docs1.select("doc_id").collect()
    got = [r["doc_id"] for r in rows]
    assert docs0_ids
    assert set(got) == docs0_ids
    assert len(got) == len(set(got))  # once each


def test_refresh_versions_changed_cases_only(refreshed):
    """b2 must contain exactly the drifted cases, each at version 2 —
    unchanged pages are hash-skipped (updater:92-105), changed pages
    version-bump (updater:118-120)."""
    _, _, _, b1, docs1, b2 = refreshed
    assert b1 and all(r["version"] == 1 for r in b1)
    published1 = {r["case_number"] for r in b1}

    # ground truth from the synthetic drift law
    county_i = {f"county{i}": i for i in range(2)}
    changed = {
        r["doc_id"]
        for r in docs1.select("doc_id", "county").collect()
        if synth.case_changed(county_i[r["county"]], r["doc_id"], 1)
    }
    want = changed & published1
    # the 1/3 drift law must bite but not swallow the corpus — if this
    # trips, the synthetic world changed, not the engine
    assert want and want < published1

    got = {r["case_number"] for r in b2}
    assert got == want
    assert all(r["version"] == 2 for r in b2)


def test_refresh_same_generation_is_idempotent(refreshed, spark):
    """A second refresh at the SAME generation renders byte-identical
    pages -> identical hashes -> publish inserts nothing."""
    eng, _, _, _, _, _ = refreshed
    docs_again = eng.refresh(generation=1)
    charge_dim = spark.createDataFrame(pd.DataFrame(synth.make_charge_dim()))
    good = parse.good_records(parse.parse_documents(docs_again))
    cleaned = clean.clean_records(good, charge_dim, parsing_date="2024-07-31")
    # same target the fixture published into
    base = eng.base_dir.rsplit("/crawl", 1)[0]
    target = SnapshotTable(spark, f"{base}/published", None, "append")
    inserted = publish.publish(cleaned, target, today="07-31-2024")
    assert inserted.isEmpty()


def test_refresh_politeness_carries_on(refreshed):
    """Refresh fetches are paced by the same per-host budget: clocks
    strictly advance past the crawl's, and refresh-row spacing stays a
    positive multiple of the interval."""
    eng, clocks_before, _, _, _, _ = refreshed
    assert eng._clocks  # loaded
    for h, c0 in clocks_before.items():
        assert eng._clocks[h] > c0, h
    refresh_wave = eng.fetch_log().agg({"wave": "max"}).collect()[0][0]
    rows = (
        eng.fetch_log()
        .filter(f"wave = {refresh_wave}")
        .orderBy("fetch_ts_ms")
        .select("host", "fetch_ts_ms")
        .collect()
    )
    by_host: dict[str, list[int]] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["fetch_ts_ms"])
    for h, ts in by_host.items():
        diffs = [b - a for a, b in zip(ts, ts[1:])]
        assert all(
            d >= POLITENESS_MS and d % POLITENESS_MS == 0 for d in diffs
        ), h


def test_generation_spans_round_trip_and_drift_law():
    """The gen-g page still round-trips through the HTML renderer and
    parser, and is byte-identical to gen-(g-1) exactly when the case
    did not drift."""
    hits = misses = 0
    for cid in range(100000, 100030):
        s0 = synth.case_spans(0, str(cid), 0)
        s1 = synth.case_spans(0, str(cid), 1)
        html1 = synth.render_case_html(s1)
        assert synth.extract_spans(html1) == s1
        if synth.case_changed(0, str(cid), 1):
            assert s1 != s0
            hits += 1
        else:
            assert s1 == s0
            misses += 1
    assert hits and misses


def test_refresh_with_case_filter_refetches_only_selected(refreshed, spark):
    """The rate-proportional policy hand-off: refresh(case_filter=...)
    must refetch EXACTLY the selected doc_ids (broadcast semi-join on
    the seed scan), spending politeness budget on nothing else."""
    eng, _, docs0_ids, _, _, _ = refreshed
    wanted = sorted(docs0_ids)[: max(1, len(docs0_ids) // 3)]
    filt = spark.createDataFrame([(d,) for d in wanted], "doc_id string")
    docs2 = eng.refresh(generation=2, case_filter=filt)
    got = [r["doc_id"] for r in docs2.select("doc_id").collect()]
    assert set(got) == set(wanted)
    assert len(got) == len(set(got))
