"""Redirect-chain resolution (operators/redirects.py): pointer
doubling vs a brute-force walk, loop flagging, the hop cap, and the
synthetic-world invariants the DuckDB oracle relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from indigent_defense_stats_spark.operators import redirects

SF_DIR = "/root/testdata/sf0.001"


def _resolve(spark, edge_pairs, urls):
    nodes = spark.createDataFrame([(u,) for u in urls], "url string")
    edges = spark.createDataFrame(edge_pairs, "src string, dst string")
    rows = redirects.resolve_redirects(nodes, edges).collect()
    return {r.url: (r.canonical_url, r.hops, r.resolved) for r in rows}


def test_chain_longer_than_one_doubling_round(spark):
    """A 10-hop chain needs 4 doubling rounds — hops must be the TRUE
    chain length, not a power of two."""
    urls = [f"u{i}" for i in range(11)]
    edges = [(f"u{i}", f"u{i+1}") for i in range(10)]
    got = _resolve(spark, edges, urls)
    for i in range(11):
        assert got[f"u{i}"] == ("u10", 10 - i, True)


def test_two_cycle_and_chain_into_it_are_flagged(spark):
    """Loop members AND a chain that merely leads into a loop both
    come back unresolved with NULL canonical/hops."""
    urls = ["a", "b", "c", "t"]
    edges = [("a", "b"), ("b", "a"), ("c", "a")]
    got = _resolve(spark, edges, urls)
    assert got["a"] == (None, None, False)
    assert got["b"] == (None, None, False)
    assert got["c"] == (None, None, False)
    assert got["t"] == ("t", 0, True)


def test_chain_at_and_over_the_hop_cap(spark):
    """_MAX_HOPS resolves exactly at the cap; _MAX_HOPS+1 does not
    (the doubling rounds can only advance 2^_ROUNDS = _MAX_HOPS)."""
    n = redirects._MAX_HOPS + 2  # nodes 0..n-1, chain n-1 hops
    urls = [f"v{i}" for i in range(n)]
    edges = [(f"v{i}", f"v{i+1}") for i in range(n - 1)]
    got = _resolve(spark, edges, urls)
    # v1 is exactly _MAX_HOPS hops from the terminal -> resolves
    assert got["v1"] == (f"v{n-1}", redirects._MAX_HOPS, True)
    # v0 is _MAX_HOPS+1 hops away -> over the cap, unresolved
    assert got["v0"] == (None, None, False)


def test_synthetic_world_statuses(spark):
    """The deterministic redirect world: multiples of 5 are canonical
    (hops 0); the 48<->49 pairs, the 23 feeder, AND the 24s (whose
    descent passes through the 23 and is diverted into the loop) are
    unresolved; everything else resolves to the previous multiple of
    5."""
    out = redirects.redirect_resolution(spark, SF_DIR)
    rows = out.withColumn(
        "doc_id", F.regexp_extract("url", r"/case/(\d+)$", 1).cast("long")
    ).collect()
    for r in rows:
        m50, m5 = r.doc_id % 50, r.doc_id % 5
        if m50 in (48, 49, 23, 24):
            assert not r.resolved and r.canonical_url is None
        elif m5 == 0:
            assert r.resolved and r.hops == 0 and r.canonical_url == r.url
        else:
            assert r.resolved and r.hops == m5
            assert r.canonical_url.endswith(f"/case/{r.doc_id - m5}")


def test_missing_target_is_terminal(spark):
    """An edge whose destination never joined (404 fetch) must not
    exist — redirect_edges inner-joins targets to real docs, so the
    source resolves as terminal-at-one-hop or becomes terminal."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    edges = redirects.redirect_edges(spark, SF_DIR)
    # every dst is a real document URL
    n_bad = (
        edges.select(F.regexp_extract("dst", r"/case/(\d+)$", 1).cast("long").alias("d"))
        .filter((F.col("d") < 0) | (F.col("d") > max_id))
        .count()
    )
    assert n_bad == 0
