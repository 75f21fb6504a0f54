"""Best-of-cluster keeper policy invariants."""

from __future__ import annotations

from collections import defaultdict

from indigent_defense_stats_spark.operators.dedup import (
    cluster_canonical_docs,
    neardup_components,
)

SF_DIR = "/root/testdata/sf0.001"


def test_keep_policy_invariants(spark):
    rows = cluster_canonical_docs(spark, SF_DIR).collect()
    comps = defaultdict(list)
    for r in rows:
        comps[r["component_id"]].append(r)
    assert len(rows) == sum(len(v) for v in comps.values())
    for members in comps.values():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1  # exactly one canonical per cluster
        best = max(members, key=lambda m: (m["quality"], -m["doc_id"]))
        assert keeps[0]["doc_id"] == best["doc_id"]

    # labels agree with the LSH component labeling it composes
    labels = {
        r["doc_id"]: r["component_id"]
        for r in neardup_components(spark, SF_DIR, edge_source="lsh").collect()
    }
    assert {r["doc_id"]: r["component_id"] for r in rows} == labels
