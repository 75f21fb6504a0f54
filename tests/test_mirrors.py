"""Mirror-host detection (operators/dedup.mirror_hosts): exactly the
full mirrors qualify, partial clones don't, and the join is an
inverted index (no host-pair cartesian)."""

from __future__ import annotations

from indigent_defense_stats_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


def test_exactly_the_even_full_mirrors_qualify(spark):
    rows = dedup.mirror_hosts(spark, SF_DIR).collect()
    got = {(r.host_a, r.host_b) for r in rows}
    assert got == {(f"host{h}", f"mirror{h}") for h in (0, 2, 4, 6, 8)}
    for r in rows:
        # full mirror: identical sets
        assert r.n_shared == r.n_a == r.n_b
        assert r.jaccard == 1.0


def test_no_cartesian_join_in_the_plan(spark):
    plan = (
        dedup.mirror_hosts(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
