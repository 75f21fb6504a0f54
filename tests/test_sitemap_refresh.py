"""Lastmod-driven refresh: the portal's post-drift sitemap says which
case pages changed; refreshing ONLY those fetches a fraction of the
corpus yet publishes exactly what a refetch-everything refresh
publishes (unchanged pages were hash-skipped either way — the lastmod
filter saves the fetches)."""

from __future__ import annotations

from datetime import date, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from indigent_defense_stats_spark import synth
from indigent_defense_stats_spark.operators import clean, parse, publish
from indigent_defense_stats_spark.plans.frontier import CrawlEngine
from indigent_defense_stats_spark.sources import sitemap
from indigent_defense_stats_spark.sources.catalog import SnapshotTable

START = date(2024, 7, 1)
N_DAYS = 4
CRAWL_DATE = date(2024, 7, 31)


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    reg = synth.make_registry(2, n_scrape=2)
    base = tmp_path_factory.mktemp("smrefresh")
    eng = CrawlEngine(spark, str(base / "crawl"), reg, START, N_DAYS, n_buckets=2)
    eng.run()
    cases = [
        (int(r["county"].replace("county", "")), r["doc_id"])
        for r in eng.documents().select("county", "doc_id").distinct().collect()
    ]
    changed = {cid for i, cid in cases if synth.case_changed(i, cid, 1)}
    return base, eng, cases, changed


def _post_drift_sitemap(spark, cases, changed):
    """Portal sitemap AFTER generation-1 drift: changed cases carry a
    bumped lastmod, unchanged ones the crawl-date lastmod."""
    rows = spark.createDataFrame(
        pd.DataFrame(
            [
                (
                    synth.portal_host(i),
                    synth.case_url(i, cid),
                    CRAWL_DATE + timedelta(days=1)
                    if cid in changed
                    else CRAWL_DATE,
                    "0.5",
                    False,
                )
                for i, cid in cases
            ],
            columns=["host", "url", "lastmod", "prio", "fresh"],
        ),
        "host string, url string, lastmod date, prio string, fresh boolean",
    )
    return sitemap.parse_sitemaps(sitemap.build_sitemaps_from(rows))


def test_stale_seeds_are_exactly_the_drifted_cases(spark, world):
    _, _, cases, changed = world
    parsed = _post_drift_sitemap(spark, cases, changed)
    seeds = {
        r["doc_id"]
        for r in sitemap.stale_case_seeds(parsed, CRAWL_DATE).collect()
    }
    assert seeds == changed
    assert 0 < len(changed) < len(cases)  # the filter is non-trivial


def test_lastmod_refresh_publishes_same_as_full_refresh(spark, world):
    base, eng, cases, changed = world
    charge_dim = spark.createDataFrame(pd.DataFrame(synth.make_charge_dim()))

    def chain(docs, target):
        good = parse.good_records(parse.parse_documents(docs))
        cleaned = clean.clean_records(good, charge_dim, parsing_date="2024-07-31")
        return publish.publish(cleaned, target, today="07-31-2024")

    t_full = SnapshotTable(spark, str(base / "pub_full"), None, "append")
    t_stale = SnapshotTable(spark, str(base / "pub_stale"), None, "append")
    chain(eng.documents(), t_full).collect()
    chain(eng.documents(), t_stale).collect()

    # full refresh: fetch everything, publish versions the changed
    full = eng.refresh(generation=1)
    ins_full = {
        (r["case_number"], r["version"]) for r in chain(full, t_full).collect()
    }

    # lastmod refresh: fetch ONLY what the sitemap flags
    parsed = _post_drift_sitemap(spark, cases, changed)
    seeds = sitemap.stale_case_seeds(parsed, CRAWL_DATE)
    stale = eng.refresh(generation=1, case_filter=seeds)
    ins_stale = {
        (r["case_number"], r["version"]) for r in chain(stale, t_stale).collect()
    }

    assert {r["doc_id"] for r in stale.select("doc_id").collect()} == changed
    assert full.count() == len(cases)  # refetch-everything baseline
    assert ins_stale == ins_full  # identical published outcome
    assert ins_full  # drift actually published something
