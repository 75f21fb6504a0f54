"""Broadcast-rank path of the iterative graph loops.

Every iterative graph operator's docstring promises that "the rank
side broadcasts at cluster scale"; graph._rank_side / pagerank_rounds
make that a real code path (auto under BROADCAST_RANKS_MAX_NODES,
forceable with broadcast_ranks=True/False).  Two contracts pinned
here:

1. BIT-IDENTICAL results: all loop arithmetic is BIGINT (associative,
   order-free), so the broadcast plan and the shuffle plan must return
   exactly the same rows — any divergence means a float or an
   order-dependent step crept into a loop.
2. The broadcast path is actually map-side against the edge table:
   the per-round propagate join plans as BroadcastHashJoin, and the
   edge table is never hash-exchanged inside a round.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import graph

SF_DIR = "/root/testdata/sf0.001"

CASES = {
    "click_pagerank": graph.click_pagerank,
    "click_ppr_seeded": graph.click_ppr_seeded,
    "click_hits": graph.click_hits,
    "click_communities_lpa": graph.click_communities_lpa,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_broadcast_and_shuffle_paths_bit_identical(spark, name):
    fn = CASES[name]
    shuffled = sorted(
        map(tuple, fn(spark, SF_DIR, broadcast_ranks=False).collect())
    )
    bcast = sorted(
        map(tuple, fn(spark, SF_DIR, broadcast_ranks=True).collect())
    )
    assert shuffled  # non-degenerate graph at this SF
    assert bcast == shuffled


def _one_round_plan(spark, broadcast_ranks):
    """One un-checkpointed pagerank round over a generated edge table —
    the plan BEFORE localCheckpoint truncation, so the join strategy is
    visible to assert on.  autoBroadcastJoinThreshold is disabled for
    the duration: at this toy scale Catalyst would broadcast the EDGE
    side on its own, which is exactly the size regime the knob is NOT
    for — only the explicit rank-side hint may broadcast here, so the
    assertion isolates the knob's effect."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        return _one_round_plan_inner(spark, broadcast_ranks)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _one_round_plan_inner(spark, broadcast_ranks):
    n_nodes = 1000
    raw = (
        spark.range(16 * n_nodes)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 1), F.lit(n_nodes)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    edges = raw.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = edges.join(ow, "src").localCheckpoint(eager=True)
    nodes = (
        ew.select(F.col("src").alias("page"))
        .union(ew.select(F.col("dst").alias("page")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = graph.SCALE // n_nodes
    ranks = nodes.select(
        "page", F.lit(base).cast("bigint").alias("pr")
    ).localCheckpoint(eager=True)
    contrib = (
        ew.join(
            graph._rank_side(ranks, n_nodes, broadcast_ranks),
            ew["src"] == ranks["page"],
        )
        .select("dst", F.expr("(pr div ow) * w").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    return contrib._jdf.queryExecution().executedPlan().toString()


def test_broadcast_round_is_map_side(spark):
    plan = _one_round_plan(spark, broadcast_ranks=True)
    assert "BroadcastHashJoin" in plan
    # the only hash exchange left in a broadcast round is the
    # contribution aggregate's post-partial shuffle (vertex-sized)
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_shuffle_round_reshuffles_edges(spark):
    # the contrast case: forcing the shuffle path plans a non-broadcast
    # join, i.e. the edge table IS re-exchanged per round — exactly the
    # cost the broadcast knob removes
    plan = _one_round_plan(spark, broadcast_ranks=False)
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") >= 2, plan


def test_auto_policy_broadcasts_small_vertex_tables(spark):
    # auto (None) must pick the broadcast path whenever the vertex
    # table fits the policy bound — 1000 nodes is far under it
    assert 1000 <= graph.BROADCAST_RANKS_MAX_NODES
    plan = _one_round_plan(spark, broadcast_ranks=None)
    assert "BroadcastHashJoin" in plan
