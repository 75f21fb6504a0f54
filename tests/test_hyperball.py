"""HyperBall harmonic centrality: exact pure-python replay of the
register propagation + estimate chain, monotonicity invariants, and
accuracy of the HLL ball sizes against exact BFS."""

from __future__ import annotations

import hashlib
import math

from indigent_defense_stats_spark.operators import graph as G
from indigent_defense_stats_spark.operators.sketches import (
    _HLL_LC,
    _HLL_NUM,
    _HLL_SMALL,
    HLL_M,
)

SF_DIR = "/root/testdata/sf0.001"


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rho(suffix: int) -> int:
    if suffix == 0:
        return 55
    return min(1 + (suffix & -suffix).bit_length() - 1, 55)


def _est(regs: dict[int, int]) -> float:
    hit_sum = sum(1 << (55 - mj) for mj in regs.values())
    hits = len(regs)
    s_scaled = hit_sum + (HLL_M - hits) * (1 << 55)
    raw = _HLL_NUM / s_scaled
    if raw <= _HLL_SMALL and hits < HLL_M:
        return _HLL_LC[HLL_M - hits - 1]
    return raw


def _python_hyperball(edges: list[tuple[int, int]]):
    nodes = sorted({v for e in edges for v in e})
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    regs = {}
    for v in nodes:
        h = _md5_int(str(v))
        regs[v] = {h % HLL_M: _rho(h >> 6)}
    ests = [{v: _est(regs[v]) for v in nodes}]
    for _ in range(G.HB_ITERS):
        nxt = {v: dict(regs[v]) for v in nodes}
        for s, d in edges:
            for reg, mj in regs[d].items():
                if nxt[s].get(reg, -1) < mj:
                    nxt[s][reg] = mj
        regs = nxt
        ests.append({v: _est(regs[v]) for v in nodes})
    res = {}
    for v in nodes:
        e0, x1, x2, x3 = (ests[t][v] for t in range(4))
        m1 = max(x1, e0)
        m2 = max(x2, m1)
        m3 = max(x3, m2)
        res[v] = (
            round(m1, 6),
            round(m2, 6),
            round(m3, 6),
            round((m1 - e0) + (m2 - m1) / 2 + (m3 - m2) / 3, 6),
        )
    return res


def _bfs_ball(out, v, t):
    seen = {v}
    frontier = {v}
    for _ in range(t):
        frontier = {d for s in frontier for d in out.get(s, [])} - seen
        seen |= frontier
    return len(seen)


def test_hyperball_matches_pure_python(spark):
    edges = [
        (r["src"], r["dst"])
        for r in G.click_graph_edges(spark, SF_DIR)
        .select("src", "dst")
        .collect()
    ]
    expected = _python_hyperball(edges)
    rows = G.hyperball_centrality(spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r in rows:
        exp = expected[r["page"]]
        got = (r["ball1"], r["ball2"], r["ball3"], r["harmonic_c"])
        assert got == exp, (r["page"], got, exp)


def test_hyperball_monotone_and_bounded(spark):
    edges_rows = (
        G.click_graph_edges(spark, SF_DIR).select("src", "dst").collect()
    )
    out: dict[int, list[int]] = {}
    for r in edges_rows:
        out.setdefault(r["src"], []).append(r["dst"])
    rows = G.hyperball_centrality(spark, SF_DIR).collect()
    for r in rows:
        assert r["ball1"] <= r["ball2"] <= r["ball3"]
        assert r["harmonic_c"] >= 0
        # HLL accuracy: for small balls the linear-counting estimate
        # is tight; allow generous 40% relative error vs exact BFS
        # (the ball includes the node itself, as does the sketch)
        exact3 = _bfs_ball(out, r["page"], 3)
        rel = abs(r["ball3"] - exact3) / max(exact3, 1)
        assert rel < 0.4, (r["page"], r["ball3"], exact3)


def test_lc_table_is_m_ln_m_over_v(spark):
    # the shared literal table both engines read is m*ln(m/V)
    for v in (1, 13, 63):
        assert math.isclose(
            _HLL_LC[v - 1], HLL_M * math.log(HLL_M / v), rel_tol=1e-12
        )


def test_neighborhood_function_consistent_with_per_node(spark):
    nf = G.hyperball_neighborhood(spark, SF_DIR).collect()
    assert len(nf) == 1
    r = nf[0]
    per = G.hyperball_centrality(spark, SF_DIR).collect()
    assert r["n_nodes"] == len(per)
    # the global sums equal the per-node ball sums (rounding slack:
    # per-node outputs are rounded to 6dp independently)
    for col, key in (("nb1", "ball1"), ("nb2", "ball2"), ("nb3", "ball3")):
        s = sum(p[key] for p in per)
        assert abs(r[col] - s) < 1e-3, (col, r[col], s)
    # monotone N(t), and the 90% effective diameter sits in [0, 3]
    assert r["nb0"] <= r["nb1"] <= r["nb2"] <= r["nb3"]
    assert 0.0 <= r["eff_diameter_90"] <= 3.0
