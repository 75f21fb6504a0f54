"""Click-graph PageRank: fixed-point semantics + plan shape.
(Exact DuckDB-oracle equality is covered by the driver and
scripts/check_oracles.py.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import graph

SF_DIR = "/root/testdata/sf0.001"


def _tiny_events(spark, tmp_path, rows):
    """rows: (event_id, ts_str, user_id, k)."""
    df = spark.createDataFrame(
        [
            (eid, ts, uid, "view", 1.0, '{"k": %d}' % k)
            for (eid, ts, uid, k) in rows
        ],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    return str(tmp_path)


def test_pagerank_hand_graph(spark, tmp_path):
    """One user walks 1 -> 2 -> 3 -> 2: edges (1->2), (2->3), (3->2).
    Fixed-point iteration by hand for 1 step from uniform base:
    base = SCALE//3; r1(1) = 15*base//100 (no in-edges),
    r1(2) = (15*base + 85*(base + base))//100, r1(3) = (15*base +
    85*base)//100.  Page 1 keeps exactly the no-in-edge rank after
    every iteration."""
    d = _tiny_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 7, 1),
            (2, "2024-01-01 00:00:02", 7, 2),
            (3, "2024-01-01 00:00:03", 7, 3),
            (4, "2024-01-01 00:00:04", 7, 2),
        ],
    )
    edges = {
        (r["src"], r["dst"]): (r["w"], r["ow"])
        for r in graph.click_graph_edges(spark, d).collect()
    }
    assert edges == {(1, 2): (1, 1), (2, 3): (1, 1), (3, 2): (1, 1)}
    pr = {r["page"]: r["pr_scaled"] for r in graph.click_pagerank(spark, d).collect()}
    base = graph.SCALE // 3
    leaf = (15 * base) // 100
    assert pr[1] == leaf  # no in-edges: base term only, every iteration
    assert pr[2] > pr[3] > pr[1]  # 2 has two in-edges incl. the cycle
    # rank mass never exceeds the scale (leak formulation loses mass
    # only to integer floors and dangling pages; here there are none
    # dangling, so only floor loss)
    assert sum(pr.values()) <= graph.SCALE


def test_pagerank_mass_and_determinism(spark):
    out = graph.click_pagerank(spark, SF_DIR)
    rows = {r["page"]: r["pr_scaled"] for r in out.collect()}
    assert rows and all(v >= 0 for v in rows.values())
    # total fixed-point mass is bounded by SCALE and close to it
    # (floor + dangling leak only)
    assert sum(rows.values()) <= graph.SCALE
    assert sum(rows.values()) > graph.SCALE * 0.5
    again = {
        r["page"]: r["pr_scaled"]
        for r in graph.click_pagerank(spark, SF_DIR).collect()
    }
    assert rows == again  # bit-identical re-run (integer arithmetic)


def test_edges_weights_consistent(spark):
    rows = graph.click_graph_edges(spark, SF_DIR).collect()
    assert rows
    by_src: dict[int, int] = {}
    for r in rows:
        assert r["src"] != r["dst"]
        by_src[r["src"]] = by_src.get(r["src"], 0) + r["w"]
    for r in rows:
        assert r["ow"] == by_src[r["src"]]


def test_triangles_match_bruteforce(spark):
    """Degree-ordered orientation count == brute-force enumeration
    over the undirected simple graph (each triangle once)."""
    from itertools import combinations

    from indigent_defense_stats_spark.operators import graph

    sf = "/root/testdata/sf0.001"
    row = graph.click_triangles(spark, sf).collect()[0]
    edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in graph.click_graph_edges(spark, sf).collect()
        if r["src"] != r["dst"]
    }
    verts = sorted({v for e in edges for v in e})
    brute = sum(
        1
        for a, b, c in combinations(verts, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    assert row["n_triangles"] == brute
    assert row["n_edges"] == len(edges)
    assert row["n_vertices"] == len(verts)


def test_triangles_hand_graph(spark, tmp_path):
    """K4 minus one edge has exactly 2 triangles; a path has none."""
    import json as _json

    rows = []
    # user 1 walks pages 1-2-3-1-4-2 (edges 12,23,13,14,24: K4 minus 34)
    walk = [1, 2, 3, 1, 4, 2]
    for i, p in enumerate(walk):
        rows.append(
            (i, __import__("datetime").datetime(2024, 1, 1, 0, 0, i), 1,
             "click", 0.0, _json.dumps({"k": p}))
        )
    # user 2 walks a disjoint path 10-11-12 (no triangles)
    for i, p in enumerate([10, 11, 12]):
        rows.append(
            (100 + i, __import__("datetime").datetime(2024, 1, 1, 1, 0, i),
             2, "click", 0.0, _json.dumps({"k": p}))
        )
    d = str(tmp_path / "g")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    from indigent_defense_stats_spark.operators import graph

    row = graph.click_triangles(spark, d).collect()[0]
    assert row["n_triangles"] == 2  # {1,2,3} and {1,2,4}
    assert row["n_edges"] == 7 and row["n_vertices"] == 7


def test_reachability_hand_graph_and_beam(spark, tmp_path):
    """Seed = page 0 (0 % 7 == 0).  Edges by weight from page 0:
    0->1 (x3), 0->2 (x2), 0->3 (x1).  Beam=2 keeps only 0->1 and
    0->2, so page 3 must be UNREACHABLE despite the direct edge —
    the explicit fan-out cap that makes UNION ALL recursion bounded.
    Chain 1->8 then gives 8 distance 2."""
    rows, eid = [], 0
    t0 = "2024-01-01 00:%02d:%02d"

    def walk(uid, pages, base_min):
        nonlocal eid, rows
        for i, k in enumerate(pages):
            rows.append((eid, t0 % (base_min, i), uid, k))
            eid += 1

    # three walks 0->1 (weight 3)
    walk(1, [0, 1], 1)
    walk(2, [0, 1], 2)
    walk(3, [0, 1], 3)
    # two walks 0->2 (weight 2)
    walk(4, [0, 2], 4)
    walk(5, [0, 2], 5)
    # one walk 0->3 (weight 1, pruned by the beam)
    walk(6, [0, 3], 6)
    # chain 1->8 (distance 2 from seed)
    walk(7, [1, 8], 7)
    d = _tiny_events(spark, tmp_path, rows)
    out = {r["page"]: r["dist"] for r in graph.click_reachability(spark, d).collect()}
    assert out[0] == 0
    assert out[1] == 1 and out[2] == 1
    assert out[8] == 2
    assert 3 not in out  # beam-pruned edge
    # bounded-output law: <= seeds * (1 + beam + beam^2 + beam^3)
    assert len(out) <= 1 * sum(graph.REACH_BEAM**i for i in range(graph.REACH_DEPTH + 1))


def test_reachability_min_distance_over_paths(spark, tmp_path):
    """A page reachable at depth 1 AND depth 3 reports distance 1
    (min over generated paths)."""
    rows, eid = [], 0

    def walk(uid, pages, base_min):
        nonlocal eid, rows
        for i, k in enumerate(pages):
            rows.append((eid, "2024-01-01 00:%02d:%02d" % (base_min, i), uid, k))
            eid += 1

    # 0 -> 1 -> 2 -> 1: page 1 at d=1 and (via 2) d=3
    walk(1, [0, 1, 2, 1], 1)
    walk(2, [0, 1], 5)  # reinforce 0->1
    d = _tiny_events(spark, tmp_path, rows)
    out = {r["page"]: r["dist"] for r in graph.click_reachability(spark, d).collect()}
    assert out[1] == 1 and out[2] == 2


def test_clustering_coefficients_brute_force(spark):
    from indigent_defense_stats_spark.operators.graph import (
        click_graph_edges,
        clustering_coefficients,
    )

    edges = {
        (r["src"], r["dst"])
        for r in click_graph_edges(spark, SF_DIR).select("src", "dst").collect()
    }
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = clustering_coefficients(spark, SF_DIR).collect()
    assert len(rows) == len(adj)
    for r in rows:
        v = r["page"]
        nb = adj[v]
        assert r["deg"] == len(nb)
        t = sum(
            1
            for x in nb
            for y in nb
            if x < y and (min(x, y), max(x, y)) in und
        )
        assert r["n_tri"] == t, v
        if len(nb) >= 2:
            assert r["lcc"] == round(2 * t / (len(nb) * (len(nb) - 1)), 6)
        else:
            assert r["lcc"] == 0.0


def test_hits_hand_graph(spark, tmp_path):
    """HITS on a hand graph (1->2, 1->3, 4->3: 1 is the hub, 3 the
    stronger authority) vs an independent pure-Python mirror of the
    integer max-normalized recurrence."""
    d = _tiny_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:00:01", 7, 1),
            (2, "2024-01-01 00:00:02", 7, 2),
            (3, "2024-01-01 00:00:01", 8, 1),
            (4, "2024-01-01 00:00:02", 8, 3),
            (5, "2024-01-01 00:00:01", 9, 4),
            (6, "2024-01-01 00:00:02", 9, 3),
        ],
    )
    got = {
        r["page"]: (r["hub_scaled"], r["auth_scaled"])
        for r in graph.click_hits(spark, d).collect()
    }

    S = graph.HITS_SCALE
    edges = {(1, 2): 1, (1, 3): 1, (4, 3): 1}
    nodes = {1, 2, 3, 4}
    h = {v: S for v in nodes}
    for _ in range(graph.HITS_ITERS):
        ra = {}
        for (s_, t_), w in edges.items():
            ra[t_] = ra.get(t_, 0) + h[s_] * w
        da = max(1, max(ra.values()) // S)
        a = {v: ra.get(v, 0) // da for v in nodes}
        rh = {}
        for (s_, t_), w in edges.items():
            rh[s_] = rh.get(s_, 0) + a[t_] * w
        dh = max(1, max(rh.values()) // S)
        h = {v: rh.get(v, 0) // dh for v in nodes}
    assert got == {v: (h[v], a[v]) for v in nodes}
    # structural expectations: 1 is the dominant hub, 3 the dominant
    # authority; pure sinks/sources score 0 on the other axis
    assert got[1][0] == max(x[0] for x in got.values()) > 0
    assert got[3][1] == max(x[1] for x in got.values()) > 0
    assert got[2][0] == got[3][0] == 0  # no out-edges -> no hub mass
    assert got[1][1] == got[4][1] == 0  # no in-edges -> no authority


def test_lpa_two_cliques_bridge(spark, tmp_path):
    """Two 3-cliques {1,2,3} and {10,11,12} joined by one bridge
    (3-10): LPA with min-label tie-break converges to one community
    per clique, each labeled by its minimum member."""
    walks = [
        # clique A: 1-2, 1-3, 2-3 (each via a user walk both needed
        # directions are implied — und edges are direction-free)
        (1, 1, 2), (2, 1, 3), (3, 2, 3),
        # clique B: 10-11, 10-12, 11-12
        (4, 10, 11), (5, 10, 12), (6, 11, 12),
        # bridge
        (7, 3, 10),
    ]
    rows = []
    eid = 0
    for uid, a, b in walks:
        eid += 1
        rows.append((eid, f"2024-01-01 00:00:{2*uid:02d}", uid, a))
        eid += 1
        rows.append((eid, f"2024-01-01 00:00:{2*uid+1:02d}", uid, b))
    d = _tiny_events(spark, tmp_path, rows)
    got = {
        r["page"]: r["community"]
        for r in graph.click_communities_lpa(spark, d).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]


def test_ppr_seed_locality(spark, tmp_path):
    """PPR vs an independent Python mirror on a hand graph, and the
    locality law: mass concentrates near the seed (page 10, the only
    page ≡ 0 mod PPR_SEED_MOD); a page unreachable from the seed gets
    rank 0."""
    # 10 -> 1 -> 2 (chain from the seed); 5 -> 6 (disconnected from it)
    rows = [
        (1, "2024-01-01 00:00:01", 7, 10),
        (2, "2024-01-01 00:00:02", 7, 1),
        (3, "2024-01-01 00:00:03", 7, 2),
        (4, "2024-01-01 00:00:01", 8, 5),
        (5, "2024-01-01 00:00:02", 8, 6),
    ]
    d = _tiny_events(spark, tmp_path, rows)
    got = {
        r["page"]: r["ppr_scaled"]
        for r in graph.click_ppr_seeded(spark, d).collect()
    }

    S, DN, DD = graph.SCALE, graph.DAMP_NUM, graph.DAMP_DEN
    edges = {(10, 1): (1, 1), (1, 2): (1, 1), (5, 6): (1, 1)}  # (w, ow)
    nodes = {10, 1, 2, 5, 6}
    seeds = {v for v in nodes if v % graph.PPR_SEED_MOD == 0}
    base = S // len(seeds)
    r = {v: (base if v in seeds else 0) for v in nodes}
    for _ in range(graph.N_ITERS):
        c = {}
        for (s_, t_), (w, ow) in edges.items():
            c[t_] = c.get(t_, 0) + (r[s_] // ow) * w
        r = {
            v: ((DD - DN) * (base if v in seeds else 0) + DN * c.get(v, 0))
            // DD
            for v in nodes
        }
    assert got == r
    assert got[10] > got[1] > got[2] > 0
    assert got[5] == got[6] == 0
