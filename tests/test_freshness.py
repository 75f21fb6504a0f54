"""Recrawl scheduling (operators/freshness.py): score semantics and
determinism of the top-N cut."""

from __future__ import annotations

from indigent_defense_stats_spark.operators import freshness

SF_DIR = "/root/testdata/sf0.001"


def test_score_semantics_and_total_order(spark):
    rows = freshness.recrawl_priority(spark, SF_DIR).collect()
    assert 0 < len(rows) <= freshness.TOP_N
    # expected-missed-changes model: score == n*staleness/span exactly
    for r in rows:
        assert r.score == (r.n_changes * r.staleness_s) / max(r.obs_span_s, 1)
        assert r.staleness_s >= 0 and r.obs_span_s >= r.staleness_s
    # descending by score with page tiebreak -> a total, reproducible cut
    keys = [(-r.score, r.page) for r in rows]
    assert keys == sorted(keys)


def test_just_changed_page_scores_zero_staleness(spark):
    rows = freshness.recrawl_priority(spark, SF_DIR).collect()
    by_staleness = min(rows, key=lambda r: r.staleness_s)
    # the page whose last change IS the corpus clock (if it made the
    # top-N) must carry score proportional to zero staleness
    if by_staleness.staleness_s == 0:
        assert by_staleness.score == 0.0
