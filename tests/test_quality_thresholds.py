"""quality_thresholds: the approx (100 TB) path tracks the exact
oracle baseline within sketch tolerance."""

from __future__ import annotations

from indigent_defense_stats_spark.operators import textstats

SF_DIR = "/root/testdata/sf0.01"


def test_approx_percentiles_track_exact(spark):
    exact = {r["source"]: r for r in textstats.quality_thresholds(spark, SF_DIR).collect()}
    approx = {
        r["source"]: r
        for r in textstats.quality_thresholds(spark, SF_DIR, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for src, e in exact.items():
        a = approx[src]
        assert a["n"] == e["n"]
        for p in ("p10", "p50", "p90"):
            # approx_percentile returns an actual data value; with 25
            # docs/source the neighboring order statistic is the worst
            # case — bound by the observed spread of the group
            assert abs(a[p] - e[p]) <= 0.1, (src, p, a[p], e[p])
        # medians must be close in rank: p10 <= p50 <= p90 always
        assert a["p10"] <= a["p50"] <= a["p90"]
