"""Link-graph analytics over the click stream — the crawl tier's
classic iterative workload.

The reference scraper walks a link graph implicitly (county portal →
search page → case page; scraper/__init__.py's nested loop IS a
breadth-first traversal).  At web scale the same graph is *analyzed*,
not just walked: PageRank over the link/navigation graph is the
canonical crawl-priority signal.  Here the graph is derived
deterministically from the ``events`` table: each user's consecutive
events (ordered by ts, event_id) form a navigation edge between the
pages in ``props.k`` — a click graph.

Cross-engine determinism: PageRank is usually float arithmetic, whose
SUM ORDER differs between engines (Spark's partial aggregation vs
DuckDB's sequential scan), so value-hash comparison would flake in the
last ulp.  This implementation therefore runs in FIXED-POINT integer
arithmetic: ranks are BIGINTs scaled by 10^12, every step is integer
division (``div`` / ``//``) and integer sums, which are associative
and order-independent — bit-identical on any engine, any partitioning.
The damping step is the rational form (15·base + 85·Σcontrib) div 100.
Dangling pages (no out-edges) leak their rank mass — the bounded
"leak" formulation, documented rather than redistributed, identical on
both engines.

Scale shape (10^10-edge graph):
- edge building: one window per user (shuffle by user_id, linear) +
  one (src, dst) aggregate (linear, map-side partial);
- the per-src out-weight is joined ONCE and the weighted edge list is
  ``localCheckpoint``-ed, so each iteration re-reads a materialized
  edge table instead of recomputing the window lineage;
- each iteration is one shuffle of the rank table keyed by page (the
  edge side stays put) + one linear contribution aggregate keyed by
  dst; hub-page skew is AQE-split (skew-join) and the rank table is
  orders of magnitude smaller than the edge table, so at cluster scale
  the rank side broadcasts;
- lineage is truncated per iteration with ``localCheckpoint`` (the
  iterative-algorithm idiom; without it the plan doubles every round).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

SCALE = 10**12  # fixed-point denominator for rank mass
N_ITERS = 5
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as a rational

# broadcast-rank knob: the vertex-side tables of every iterative loop
# (ranks / labels / hub scores / per-round contributions) are orders of
# magnitude smaller than the edge table.  Below this node count they
# are broadcast into the per-round joins, so the edge table is NEVER
# reshuffled inside the loop — the only remaining per-round exchange is
# the post-partial contribution aggregate, which is vertex-sized.  A
# (page:int64, pr:int64) row is ~16 B, so 4M nodes is a <=64 MB
# broadcast — comfortably under Spark's limits at any executor size.
# None = auto (by node count); True/False force either path.  Both
# paths are BIGINT-exact, so results are bit-identical by construction
# (pinned by tests/test_graph_broadcast.py).
BROADCAST_RANKS_MAX_NODES = 4_000_000


def _rank_side(df: DataFrame, n_nodes: int, broadcast_ranks: bool | None) -> DataFrame:
    """Vertex-side join input under the broadcast-rank policy."""
    if broadcast_ranks is None:
        broadcast_ranks = n_nodes <= BROADCAST_RANKS_MAX_NODES
    return F.broadcast(df) if broadcast_ranks else df


def pagerank_rounds(
    nodes: DataFrame,
    ew: DataFrame,
    *,
    n_nodes: int,
    rounds: int = N_ITERS,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """The shared fixed-point PageRank loop: ``rounds`` iterations of
    (propagate rank along weighted edges) → (damped teleport mix).

    ``nodes`` must carry (page, tp) where ``tp`` is the per-page
    BIGINT teleport mass (uniform ``SCALE div n`` for classic PageRank,
    the seed mass for personalized PageRank); ``ew`` is the weighted
    edge table (src, dst, w, ow).  Both are expected pinned
    (localCheckpoint) by the caller — the loop re-reads them every
    round.  Returns (page, pr).

    All arithmetic is BIGINT (integer div + integer sums, associative
    and order-free), so the shuffle path and the broadcast path return
    bit-identical ranks at any parallelism — the determinism contract
    the module docstring pins.

    Scale shape: with ``broadcast_ranks`` (auto under
    BROADCAST_RANKS_MAX_NODES) each round is map-side against the
    in-place edge table + ONE vertex-sized exchange (the contribution
    aggregate's post-partial shuffle); without it, each round also
    reshuffles the edge table on src — the 10^10-edge regime keeps the
    shuffle path only when the vertex table itself outgrows broadcast."""
    ranks = nodes.select("page", F.col("tp").cast("bigint").alias("pr"))
    for _ in range(rounds):
        contrib = (
            ew.join(_rank_side(ranks, n_nodes, broadcast_ranks),
                    ew["src"] == ranks["page"])
            .select("dst", F.expr("(pr div ow) * w").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(_rank_side(contrib, n_nodes, broadcast_ranks),
                       nodes["page"] == contrib["dst"], "left")
            .select(
                "page",
                F.expr(
                    f"CAST(({damp_den - damp_num} * CAST(tp AS BIGINT)"
                    f" + {damp_num} * coalesce(s, CAST(0 AS BIGINT)))"
                    f" div {damp_den} AS BIGINT)"
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def click_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted navigation edges: consecutive events per user (ts,
    event_id order) link page ``props.k`` to the next page; self-loops
    dropped; weight = transition count; ``ow`` = total out-weight of
    the source page (the PageRank denominator)."""
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        F.get_json_object("props", "$.k").cast("int").alias("page"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.withColumn("dst", F.lead("page").over(w))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("page")))
        .groupBy(F.col("page").alias("src"), "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        # pin: edges is a small aggregate with an expensive upstream
        # (events scan + per-user window) and feeds both the
        # out-weight aggregate and the final join — unpinned, the
        # window shuffle runs twice (5 exchanges / 2 scans -> 3 / 1)
        .localCheckpoint(eager=False)
    )
    ow = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    return edges.join(ow, "src").select("src", "dst", "w", "ow")


def click_pagerank(
    spark: SparkSession, sf_dir: str, broadcast_ranks: bool | None = None
) -> DataFrame:
    """Fixed-point PageRank over the click graph, N_ITERS iterations.

    Returns (page, pr_scaled) where pr_scaled is the rank in units of
    1/SCALE — BIGINT, bit-identical across engines AND across the
    broadcast/shuffle rank paths (see module docstring and
    :func:`pagerank_rounds`)."""
    edges = click_graph_edges(spark, sf_dir).localCheckpoint(eager=False)
    # nodes joins into EVERY iteration's rank update (plus the count
    # below) — pin the union+distinct once or it re-shuffles per
    # iteration (the shared-subplan discipline; the count materializes
    # the checkpoint immediately)
    nodes = (
        edges.select(F.col("src").alias("page"))
        .union(edges.select(F.col("dst").alias("page")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # one scalar aggregate — bounded driver state
    base = SCALE // n
    ranks = pagerank_rounds(
        # a pure projection over the pinned node table — no second pin
        nodes.select("page", F.lit(base).cast("bigint").alias("tp")),
        edges,
        n_nodes=n,
        broadcast_ranks=broadcast_ranks,
    )
    return ranks.select("page", F.col("pr").alias("pr_scaled"))


def click_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the undirected click graph — the classic
    distributed graph-analytics kernel (clustering-coefficient /
    community-density signal).

    Algorithm: DEGREE-ORDERED ORIENTATION (Suri & Vassilvitskii, WWW
    2011 "the curse of the last reducer"): orient every undirected
    edge from its lower-(degree, id) endpoint to the higher one.  The
    orientation is a total order, so (a) each triangle is counted
    EXACTLY once as x→y, y→z, x→z, and (b) every vertex's
    out-degree is O(sqrt(m)) — the wedge join's fan-out is bounded,
    which is precisely what kills the hub-vertex blow-up a naive
    edge-edge join suffers at 10^10 edges.  Two equi-joins, both
    keyed on vertices; hot residual keys are AQE skew-split.

    Output is a single summary row (n_triangles, n_edges, n_vertices)
    in exact BIGINTs.

    Pin-shared-subplans discipline: ``und`` (3 consumers: degree
    table, orientation join, edge count), ``deg`` (3: both sides of
    the orientation join, vertex count) and ``orient`` (3: e1/e2/e3)
    are each localCheckpoint-pinned — unpinned, every consumer
    re-derives its whole upstream and the plan explodes
    multiplicatively (measured: 97 hash exchanges / 36 parquet scans
    for this one query; pinned: 4 / 2)."""
    und, deg, tri = _oriented_triangles(spark, sf_dir)
    return (
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(und.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_vertices")))
    )


def _oriented_triangles(spark: SparkSession, sf_dir: str):
    """(und, deg, tri): undirected edge set, degree table, and the
    exactly-once triangle table (t_a, t_b, t_c) from the degree-
    ordered orientation — shared by the global count and the
    per-node clustering coefficients."""
    ed = click_graph_edges(spark, sf_dir).select("src", "dst")
    und = (
        ed.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    g = und.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    orient = g.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("x"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("y"),
    ).localCheckpoint(eager=False)
    e1 = orient.select(F.col("x").alias("t_a"), F.col("y").alias("t_b"))
    e2 = orient.select(F.col("x").alias("t_b"), F.col("y").alias("t_c"))
    e3 = orient.select(F.col("x").alias("t_a"), F.col("y").alias("t_c"))
    # pin: the triangle table feeds THREE per-corner branches in
    # clustering_coefficients — unpinned, the wedge joins recompute
    # per branch (measured 14 exchanges; pinned: 3)
    tri = (
        e1.join(e2, "t_b")
        .join(e3, ["t_a", "t_c"])
        .localCheckpoint(eager=False)
    )
    return und, deg, tri


def clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node LOCAL clustering coefficient (Watts-Strogatz): the
    fraction of a node's neighbor pairs that are themselves connected,
    lcc(v) = 2*T(v) / (deg(v) * (deg(v)-1)) — the community-density
    signal per page/host (a crawl reads high-LCC neighborhoods as
    template clusters or link farms).  Per-node triangle counts come
    from exploding the exactly-once oriented triangle table (each
    triangle credits all three corners — no double counting by
    construction); exact integers + ONE division.
    """
    und, deg, tri = _oriented_triangles(spark, sf_dir)
    tv = (
        tri.select(F.col("t_a").alias("v"))
        .unionAll(tri.select(F.col("t_b").alias("v")))
        .unionAll(tri.select(F.col("t_c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    out = deg.join(tv, "v", "left").select(
        "v",
        F.col("deg").cast("long").alias("deg"),
        F.coalesce("n_tri", F.lit(0).cast("long")).alias("n_tri"),
    )
    lcc = F.when(
        F.col("deg") >= 2,
        F.round(
            (F.lit(2).cast("long") * F.col("n_tri")) * 1.0
            / (F.col("deg") * (F.col("deg") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("v").alias("page"), "deg", "n_tri", lcc.alias("lcc")
    )


REACH_DEPTH = 3  # hop budget
REACH_BEAM = 2  # out-edges kept per page (w desc, dst tiebreak)
REACH_SEED_MOD = 7  # seed pages: src % REACH_SEED_MOD == 0


def _beam_sql(events_ref: str, json_int: str) -> str:
    """Beam edge table (top-REACH_BEAM out-edges per page) — the
    non-recursive prefix, shared text for both engines; ``json_int``
    is the engine's json-path-to-int idiom with {} for the column."""
    return f"""
        WITH
        e0 AS (
            SELECT user_id, event_id, ts,
                   {json_int.format("props")} AS page
            FROM {events_ref}
        ),
        ed AS (
            SELECT page AS src,
                   lead(page) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
            FROM e0
        ),
        ew AS (
            SELECT src, dst, CAST(count(*) AS BIGINT) AS w
            FROM ed WHERE dst IS NOT NULL AND dst <> src
            GROUP BY src, dst
        )
        SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM ew
        ) ranked WHERE rn <= {REACH_BEAM}
    """


def _reach_cte(beam_ref: str) -> str:
    """The recursion itself over a beam edge relation — identical
    text on both engines (caller supplies the WITH RECURSIVE header)."""
    return f"""
        reach(page, d) AS (
            SELECT DISTINCT src, 0 FROM {beam_ref}
            WHERE src % {REACH_SEED_MOD} = 0
            UNION ALL
            SELECT b.dst, r.d + 1
            FROM reach r JOIN {beam_ref} b ON b.src = r.page
            WHERE r.d < {REACH_DEPTH}
        )
        SELECT page, CAST(min(d) AS INT) AS dist
        FROM reach GROUP BY page
    """


def click_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from seed pages over the BEAM-pruned click graph,
    via Spark's native ``WITH RECURSIVE`` (SQL:1999 recursion landed
    in Spark 4) — the declarative form of the traversal the reference
    scraper runs imperatively (portal -> search -> case).

    Unbounded recursion over a dense graph enumerates paths, not
    vertices — UNION ALL path counts grow with fan-out^depth and
    Spark does not yet support the deduplicating UNION step (checked:
    UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the SCALABLE shape caps
    the branching factor FIRST: keep each page's top-``REACH_BEAM``
    out-edges by weight (deterministic row_number tiebreak on dst),
    giving <= seeds * beam^depth rows regardless of corpus size — the
    beam-search discipline.  For full closures the engine's iterative
    join loops with per-round checkpointing (click_pagerank,
    neardup_components) remain the 10^10-edge path; this query is the
    SQL-surface form.

    Materialization matters: Spark inlines non-recursive CTEs into
    EVERY recursive step, so leaving the edge build inside the WITH
    re-ran the full window+aggregate per iteration (measured 9.1 s at
    sf0.1 vs ~1 s materialized).  The beam edge table is therefore
    built once and ``localCheckpoint``-ed — the same
    iterative-algorithm discipline as click_pagerank — and the
    recursion reads the materialized view.  The DuckDB oracle runs
    the textually identical recursion over the same beam CTE (only
    the json-extract idiom differs)."""
    beam = spark.sql(
        _beam_sql(
            f"parquet.`{sf_dir}/events.parquet`",
            "CAST(get_json_object({0}, '$.k') AS INT)",
        )
    ).localCheckpoint()
    beam.createOrReplaceTempView("__reach_beam")
    return spark.sql("WITH RECURSIVE " + _reach_cte("__reach_beam"))


HB_ITERS = 3  # HyperBall radius (t = 1..HB_ITERS)


def _hb_rho() -> F.Column:
    """Flajolet-Martin rank of the 54-bit suffix — the exact bit-math
    form pinned in sketches.hll_registers (identical two's-complement
    semantics in Spark and DuckDB)."""
    return F.expr("least(1 + bit_count((suffix & -suffix) - 1), 55)")


def _hb_ball_est(r: DataFrame) -> DataFrame:
    """(v, e): HLL ball estimate per node — delegates to the shared
    estimate chain sketches._hll_est_over (one implementation of the
    exact-integer harmonic sum + linear-counting lookup, used by the
    sketch family and HyperBall alike)."""
    from .sketches import _hll_est_over

    return _hll_est_over(r, ["v"]).select("v", "e")


def _hyperball_monotone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", WWW 2013 workshop / arXiv 1308.2144)
    over the click graph: every node keeps an HLL REGISTER TABLE of
    the nodes reachable within t hops; one round of elementwise
    max-merge along out-edges grows every ball by one hop
    simultaneously.  The per-round ball-size estimates yield the
    neighborhood function N(v, t), and harmonic centrality accumulates
    sum_t (N(t) - N(t-1)) / t — the crawl-priority centrality signal
    computable on a 10^10-edge graph where exact per-node BFS is
    hopeless (HyperBall's whole point: O(nodes x m) state, linear
    shuffles, no frontier explosion).

    Engine shape: register state is a sparse (v, reg, mj) table; each
    round is ONE join of the register table against the edge list
    (dst side) + ONE (v, reg) max aggregate — both linear in
    |edges| x m/64, the same shuffle contract as click_pagerank's
    rank updates; per-round lineage truncated with localCheckpoint.

    Determinism: registers are exact integers (sketches.hll_registers
    discipline); the estimate is one IEEE division of a shared
    literal (or a precomputed linear-counting lookup); estimates are
    MONOTONIZED with greatest() per HyperBall §4 before the harmonic
    sum, whose three subtract-divide terms fold in a fixed order —
    bit-identical in Spark and DuckDB.
    """
    from .textstats import md5_int

    edges = (
        click_graph_edges(spark, sf_dir)
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    h = md5_int(F.col("v").cast("string"))
    r = (
        nodes.select(
            "v",
            (h % 64).alias("reg"),
            F.shiftright(h, 6).alias("suffix"),
        )
        .select("v", "reg", _hb_rho().cast("long").alias("mj"))
        # EAGER: est_t for every round joins into ONE final action, so
        # lazy checkpoints would nest (each round's materialization
        # re-entering the previous round's) — Spark then reports
        # late accumulator updates and recomputes lineage; eager
        # rounds are tiny (nodes x m rows) and keep the final plan
        # flat (measured 35 s -> ~8 s at sf0.01)
        .localCheckpoint()
    )
    ests = [_hb_ball_est(r)]
    for _ in range(HB_ITERS):
        prop = edges.join(r, r["v"] == edges["dst"]).select(
            edges["src"].alias("v"), "reg", "mj"
        )
        r = (
            r.unionByName(prop)
            .groupBy("v", "reg")
            .agg(F.max("mj").cast("long").alias("mj"))
            .localCheckpoint()
        )
        ests.append(_hb_ball_est(r))
    out = ests[0].select("v", F.col("e").alias("e0"))
    for t, est in enumerate(ests[1:], start=1):
        out = out.join(est.select("v", F.col("e").alias(f"e{t}")), "v")
    # monotonize (HyperBall uses monotone counters; the raw->LC
    # crossover could otherwise dip)
    m1 = F.greatest(F.col("e1"), F.col("e0"))
    m2 = F.greatest(F.col("e2"), m1)
    m3 = F.greatest(F.col("e3"), m2)
    return out.select("v", "e0", m1.alias("m1"), m2.alias("m2"), m3.alias("m3"))


def hyperball_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node HyperBall output: monotone ball estimates at t=1..3
    plus harmonic centrality sum_t (N(t)-N(t-1))/t — see
    :func:`_hyperball_monotone` for the algorithm and determinism
    contract."""
    out = _hyperball_monotone(spark, sf_dir)
    harmonic = (
        (F.col("m1") - F.col("e0"))
        + (F.col("m2") - F.col("m1")) / 2
        + (F.col("m3") - F.col("m2")) / 3
    )
    return out.select(
        F.col("v").alias("page"),
        F.round("m1", 6).alias("ball1"),
        F.round("m2", 6).alias("ball2"),
        F.round("m3", 6).alias("ball3"),
        F.round(harmonic, 6).alias("harmonic_c"),
    )


def hyperball_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEIGHBORHOOD FUNCTION N(t) = sum_v |B_t(v)| and the
    interpolated 90% effective diameter — HyperBall/HyperANF's
    headline graph statistic (Boldi-Vigna-Rosa, WWW 2011): how much of
    the graph is within t hops, and at what (fractional) radius 90%
    of the measured horizon is covered.  On a web graph this is the
    number a crawl planner reads to bound frontier depth.

    Determinism: per-node estimates are identical doubles in both
    engines (shared-literal division / LC lookup), but a FLOAT SUM
    across nodes is order-dependent — so each estimate is converted
    to exact integer MICRO-UNITS first (floor(x*1e6 + 0.5), an
    explicit identical op chain, NOT engine round()) and summed as
    BIGINT; one final division recovers the double.  The
    interpolation CASE runs on those identical doubles."""
    tbl = _hyperball_monotone(spark, sf_dir)

    def micro(c: str) -> F.Column:
        return F.floor(F.col(c) * 1e6 + F.lit(0.5)).cast("long")

    agg = tbl.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(micro("e0")).alias("s0"),
        F.sum(micro("m1")).alias("s1"),
        F.sum(micro("m2")).alias("s2"),
        F.sum(micro("m3")).alias("s3"),
    )
    nb = [F.col(f"s{t}") / F.lit(1e6) for t in range(4)]
    target = F.lit(0.9) * nb[3]
    eff = (
        F.when(nb[0] >= target, F.lit(0.0))
        .when(nb[1] >= target, (target - nb[0]) / (nb[1] - nb[0]))
        .when(nb[2] >= target, F.lit(1.0) + (target - nb[1]) / (nb[2] - nb[1]))
        .otherwise(F.lit(2.0) + (target - nb[2]) / (nb[3] - nb[2]))
    )
    return agg.select(
        "n_nodes",
        F.round(nb[0], 6).alias("nb0"),
        F.round(nb[1], 6).alias("nb1"),
        F.round(nb[2], 6).alias("nb2"),
        F.round(nb[3], 6).alias("nb3"),
        F.round(eff, 6).alias("eff_diameter_90"),
    )


LPA_ITERS = 4
PPR_SEED_MOD = 10  # pages with page % PPR_SEED_MOD == 0 are the seed set

HITS_ITERS = 5
HITS_SCALE = 10**9  # hub/authority fixed-point denominator


def click_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly connected components of the click graph — exact
    component labels (min reachable page) via the alternating
    large-star/small-star contraction of operators/dedup.py
    (Kiveris et al., SoCC'14), run here on navigation edges instead of
    near-dup edges.  Complements :func:`click_communities_lpa`: LPA
    finds dense communities inside a component; this finds the exact
    component partition (the unit crawl/host analyses shard by).

    The DuckDB oracle is an INDEPENDENT algorithm — a recursive-CTE
    transitive closure + min aggregate — so label equality checks the
    star contraction against a different computation of the same
    fixpoint, not a replay.  Scale shape: inherited from
    connected_components_star (edge set provably shrinks per round,
    O(log n) rounds, every pass keyed by vertex)."""
    from .dedup import connected_components_star

    ed = click_graph_edges(spark, sf_dir).select(
        F.col("src").alias("d1"), F.col("dst").alias("d2")
    )
    nodes = (
        ed.select(F.col("d1").alias("doc_id"))
        .union(ed.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    return connected_components_star(spark, nodes, ed).select(
        F.col("doc_id").alias("page"),
        F.col("component_id").alias("component"),
    )


def click_communities_lpa(
    spark: SparkSession, sf_dir: str, broadcast_ranks: bool | None = None
) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert & Kumara, Phys.
    Rev. E 2007) over the undirected click graph — the linear-time
    community detector a web pipeline runs to cluster hosts/pages into
    template families before sampling or boilerplate mining.

    Determinism contract: classic LPA breaks most-frequent-label ties
    randomly and updates asynchronously — both are non-starters for a
    distributed, replayable engine.  This is the SYNCHRONOUS variant
    with a total tie order: each round every node adopts
    ``argmax_count(neighbor labels)`` with ties broken by the SMALLEST
    label (row_number over (count DESC, label ASC) — exact integers,
    bit-identical on any engine/partitioning).  Fixed LPA_ITERS rounds
    (synchronous LPA can 2-cycle on bipartite structures, so a fixed
    round count IS the convergence policy, not a truncation).
    Node-set contract: every endpoint of the click graph starts
    self-labeled; a node whose only community evidence is itself
    (degree 0 after the undirected dedup) keeps its own id through
    every round.  Pages with NO click-graph edge at all are absent
    from the output — :func:`click_graph_edges` drops self-transitions
    (``dst <> src``), so a page seen only in self-loops never enters
    the graph; the DuckDB oracle applies the same rule.

    Scale shape (10^10 edges): per round, one join of the vertex-sized
    label table against the static neighbor table (edge-sized, pinned
    once) + one (node, label) count aggregate + one per-node window —
    all keyed by node; label table broadcasts at cluster scale;
    lineage truncated per round with ``localCheckpoint``."""
    ed = click_graph_edges(spark, sf_dir).select("src", "dst")
    und = (
        ed.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # static neighbor table (both directions), pinned once: every
    # round's join re-reads this instead of re-deriving the edge agg
    nbr = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .localCheckpoint(eager=False)
    )
    labels = lpa_rounds(nbr, broadcast_ranks=broadcast_ranks)
    return labels.select(F.col("node").alias("page"), F.col("label").alias("community"))


def lpa_rounds(
    nbr: DataFrame,
    *,
    rounds: int = LPA_ITERS,
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """The shared synchronous-LPA loop over a pinned neighbor table
    (node, nbr) — both directions materialized by the caller.  Returns
    (node, label) after ``rounds`` synchronous updates with the total
    (count DESC, label ASC) tie order (see click_communities_lpa's
    determinism contract; both the broadcast and shuffle label paths
    are exact-integer and therefore bit-identical).

    Skew note (the hub-page case): the per-round label join keys by
    ``nbr``, so a 10^5-degree hub is 10^5 rows of ONE key on the edge
    side — under the broadcast path that join is map-side and the skew
    never reaches a shuffle; under the shuffle path AQE's skew-join
    split handles it.  The (node, label) count aggregate keys by the
    PAIR, and partial aggregation combines map-side, so the hub's
    gathered rows never serialize one reducer (measured: the lpaskew
    bench cells)."""
    nodes = nbr.select("node").distinct().localCheckpoint(eager=False)
    n = nodes.count()  # bounded driver scalar (broadcast-rank policy)
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(rounds):
        gathered = (
            nbr.join(
                _rank_side(
                    labels.select(
                        F.col("node").alias("nbr"),
                        F.col("label").alias("nlabel"),
                    ),
                    n,
                    broadcast_ranks,
                ),
                "nbr",
            )
            .groupBy("node", F.col("nlabel").alias("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = (
            gathered.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(_rank_side(best, n, broadcast_ranks), "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels


def click_ppr_seeded(
    spark: SparkSession, sf_dir: str, broadcast_ranks: bool | None = None
) -> DataFrame:
    """Personalized PageRank from a seed set (pages ≡ 0 mod
    PPR_SEED_MOD) — the focused-crawl priority signal: rank pages by
    proximity to a topic seed set instead of global importance
    (Haveliwala, WWW 2002's topic-sensitive PageRank restricted to one
    teleport vector).

    Same fixed-point BIGINT discipline as :func:`click_pagerank` —
    the only change is the teleport term: instead of the uniform
    ``15·(SCALE div n)`` every node gets, only seed nodes receive
    ``15·(SCALE div n_seeds)``; non-seeds' rank is pure propagated
    mass.  All arithmetic is integer div/sums — bit-identical
    cross-engine.  Scale shape identical to click_pagerank (shares
    :func:`pagerank_rounds`, including the broadcast-rank path)."""
    edges = click_graph_edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("page"))
        .union(edges.select(F.col("dst").alias("page")))
        .distinct()
        .withColumn("is_seed", (F.col("page") % PPR_SEED_MOD == 0))
        .localCheckpoint(eager=False)
    )
    n_seeds = nodes.filter("is_seed").count()  # bounded driver scalar
    if n_seeds == 0:
        raise ValueError(
            f"click_ppr_seeded: no page id divisible by {PPR_SEED_MOD} in"
            " the click graph — the seed teleport set is empty (pick a"
            " different PPR_SEED_MOD or supply an explicit seed set)"
        )
    base = SCALE // n_seeds
    seed_mass = F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0)).cast(
        "bigint"
    )
    ranks = pagerank_rounds(
        nodes.select("page", seed_mass.alias("tp")),
        edges,
        n_nodes=nodes.count(),
        broadcast_ranks=broadcast_ranks,
    )
    return ranks.select("page", F.col("pr").alias("ppr_scaled"))


def click_hits(
    spark: SparkSession, sf_dir: str, broadcast_ranks: bool | None = None
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) over the click
    graph — the second classic link-analysis fixed point next to
    PageRank, and the one a crawl planner uses to separate directory/
    portal pages (hubs) from content pages (authorities).

    Determinism contract (same discipline as :func:`click_pagerank`):
    all arithmetic is BIGINT.  Kleinberg's L2 normalization is replaced
    by MAX-normalization with integer floor division — after each half-
    step the raw scores are divided by ``greatest(1, max(raw) div
    HITS_SCALE)``, which keeps every score in [0, 2·HITS_SCALE) without
    a single float op.  Max-normalized HITS converges to the same
    principal eigenvector direction as the L2 form; only the scaling
    differs, and the integer variant is bit-identical on any engine and
    any partitioning (sums of BIGINTs are associative; the scalar max
    is order-free).

    Scale shape (10^10 edges): per iteration, two shuffles keyed by
    page (contribution aggregate per half-step) + one scalar max
    (1-row crossJoin broadcast) + one left join against the pinned
    node table — the rank side is vertex-sized, orders of magnitude
    smaller than the edge side, so at cluster scale it broadcasts;
    lineage is truncated per round with ``localCheckpoint``.  Overflow
    headroom: scores are < 2^31 and per-vertex Σ(score·w) stays in
    BIGINT while Σw per vertex < 2^32; past that, widen the contribution
    sum to DECIMAL(38,0) (documented, not needed at any test SF)."""
    edges = click_graph_edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("page"))
        .union(edges.select(F.col("dst").alias("page")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # bounded driver scalar (broadcast-rank policy)
    hubs = nodes.select("page", F.lit(HITS_SCALE).cast("bigint").alias("h"))
    auths = None
    for _ in range(HITS_ITERS):
        raw_a = (
            edges.join(_rank_side(hubs, n, broadcast_ranks),
                       edges["src"] == hubs["page"])
            .groupBy("dst")
            .agg(F.sum(F.expr("h * w")).cast("bigint").alias("ra"))
        )
        da = raw_a.agg(
            F.expr(
                f"greatest(CAST(1 AS BIGINT), max(ra) div {HITS_SCALE})"
            ).alias("da")
        )
        auths = (
            nodes.crossJoin(F.broadcast(da))
            .join(_rank_side(raw_a, n, broadcast_ranks),
                  nodes["page"] == raw_a["dst"], "left")
            .select(
                "page",
                F.expr("CAST(coalesce(ra, CAST(0 AS BIGINT)) div da AS BIGINT)")
                .alias("a"),
            )
            .localCheckpoint(eager=False)
        )
        raw_h = (
            edges.join(_rank_side(auths, n, broadcast_ranks),
                       edges["dst"] == auths["page"])
            .groupBy("src")
            .agg(F.sum(F.expr("a * w")).cast("bigint").alias("rh"))
        )
        dh = raw_h.agg(
            F.expr(
                f"greatest(CAST(1 AS BIGINT), max(rh) div {HITS_SCALE})"
            ).alias("dh")
        )
        hubs = (
            nodes.crossJoin(F.broadcast(dh))
            .join(_rank_side(raw_h, n, broadcast_ranks),
                  nodes["page"] == raw_h["src"], "left")
            .select(
                "page",
                F.expr("CAST(coalesce(rh, CAST(0 AS BIGINT)) div dh AS BIGINT)")
                .alias("h"),
            )
            .localCheckpoint(eager=False)
        )
    return hubs.join(auths, "page").select(
        "page",
        F.col("h").alias("hub_scaled"),
        F.col("a").alias("auth_scaled"),
    )


QUERIES = {
    "click_graph_edges": click_graph_edges,
    "click_pagerank": click_pagerank,
    "click_triangles": click_triangles,
    "click_reachability": click_reachability,
    "hyperball_centrality": hyperball_centrality,
    "hyperball_neighborhood": hyperball_neighborhood,
    "clustering_coefficients": clustering_coefficients,
    "click_hits": click_hits,
    "click_communities_lpa": click_communities_lpa,
    "click_ppr_seeded": click_ppr_seeded,
    "click_components": click_components,
}

_SQL_EDGES = """
    e0 AS (
        SELECT user_id, event_id, ts,
               CAST(json_extract_string(props, '$.k') AS INT) AS page
        FROM events
    ),
    ed AS (
        SELECT page AS src,
               lead(page) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
        FROM e0
    ),
    e AS MATERIALIZED (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        FROM ed WHERE dst IS NOT NULL AND dst <> src
        GROUP BY src, dst
    ),
    o AS MATERIALIZED (
        SELECT src AS osrc, CAST(sum(w) AS BIGINT) AS ow
        FROM e GROUP BY src
    ),
    ew AS MATERIALIZED (
        SELECT src, dst, w, ow FROM e JOIN o ON e.src = o.osrc
    )
"""
# e/o/ew are MATERIALIZED: DuckDB inlines plain CTEs per reference, and
# the unrolled-iteration oracles below reference ew/e once or twice PER
# round (10x for HITS) — without materialization the events scan + the
# per-user lead window re-expand at every reference (the same lesson the
# per-round l{i}/g{i} CTEs already encode).


def _pagerank_sql() -> str:
    """Unrolled N_ITERS-iteration fixed-point PageRank (same integer
    arithmetic as the Spark side; DuckDB // is integer division and
    sums are cast back to BIGINT at every step)."""
    parts = [
        f"WITH {_SQL_EDGES}",
        """,
    n AS (SELECT DISTINCT page FROM
          (SELECT src AS page FROM e UNION SELECT dst FROM e)),
    cnt AS (SELECT count(*) AS nn FROM n)""",
        f""",
    r0 AS (SELECT page, CAST({SCALE} // nn AS BIGINT) AS pr FROM n, cnt)""",
    ]
    for i in range(N_ITERS):
        parts.append(
            f""",
    c{i + 1} AS (
        SELECT ew.dst, CAST(sum((r.pr // ew.ow) * ew.w) AS BIGINT) AS s
        FROM ew JOIN r{i} r ON ew.src = r.page
        GROUP BY ew.dst
    ),
    r{i + 1} AS (
        SELECT n.page,
               CAST(({DAMP_DEN - DAMP_NUM} * CAST({SCALE} // cnt.nn AS BIGINT)
                     + {DAMP_NUM} * coalesce(c.s, 0)) // {DAMP_DEN}
                    AS BIGINT) AS pr
        FROM n CROSS JOIN cnt
        LEFT JOIN c{i + 1} c ON n.page = c.dst
    )"""
        )
    parts.append(f"\n    SELECT page, pr AS pr_scaled FROM r{N_ITERS}")
    return "".join(parts)


def _hyperball_prefix() -> str:
    """Unrolled HB_ITERS-round HyperBall CTE chain (through the
    monotonized ``mm`` relation): register propagation as UNION ALL +
    max aggregates, per-round estimates via the exact shared-literal
    HLL machinery (sketches.hll_distinct oracle), monotonized with
    the same greatest() chain as the Spark side."""
    from .sketches import _HLL_LC, _HLL_NUM, _HLL_SMALL

    md5v = "('0x' || left(md5(v::VARCHAR), 15))::BIGINT"
    parts = [
        f"WITH {_SQL_EDGES}",
        """,
    n AS (SELECT DISTINCT page AS v FROM
          (SELECT src AS page FROM e UNION SELECT dst FROM e)),""",
        f"""
    k AS (SELECT v, {md5v} % 64 AS reg, {md5v} // 64 AS suffix FROM n),
    r0 AS (
        SELECT v, reg,
               CAST(least(1 + bit_count((suffix & (-suffix)) - 1), 55)
                    AS BIGINT) AS mj
        FROM k
    )""",
    ]
    for i in range(HB_ITERS):
        parts.append(
            f""",
    r{i + 1} AS (
        SELECT v, reg, CAST(max(mj) AS BIGINT) AS mj FROM (
            SELECT v, reg, mj FROM r{i}
            UNION ALL
            SELECT ew.src AS v, r.reg, r.mj
            FROM ew JOIN r{i} r ON r.v = ew.dst
        ) GROUP BY 1, 2
    )"""
        )
    for i in range(HB_ITERS + 1):
        parts.append(
            f""",
    b{i} AS (
        SELECT v,
               CAST(sum(1::BIGINT << (55 - mj)) AS BIGINT) AS hit_sum,
               count(*)::BIGINT AS hits
        FROM r{i} GROUP BY 1
    ),
    est{i} AS (
        SELECT v, CASE WHEN raw <= {_HLL_SMALL!r} AND hits < 64
                       THEN list_extract({_HLL_LC}, (64 - hits)::INT)
                       ELSE raw END AS e
        FROM (SELECT v, hits,
                     {_HLL_NUM!r} / (hit_sum + (64 - hits)
                                     * (1::BIGINT << 55)) AS raw
              FROM b{i})
    )"""
        )
    parts.append(
        """,
    j AS (
        SELECT est0.v, est0.e AS e0, est1.e AS x1, est2.e AS x2,
               est3.e AS x3
        FROM est0 JOIN est1 USING (v) JOIN est2 USING (v)
                  JOIN est3 USING (v)
    ),
    mm AS (
        SELECT v, e0,
               greatest(x1, e0) AS m1,
               greatest(x2, greatest(x1, e0)) AS m2,
               greatest(x3, greatest(x2, greatest(x1, e0))) AS m3
        FROM j
    )"""
    )
    return "".join(parts)


def _hyperball_sql() -> str:
    return (
        _hyperball_prefix()
        + """
    SELECT v AS page,
           round(m1, 6) AS ball1,
           round(m2, 6) AS ball2,
           round(m3, 6) AS ball3,
           round((m1 - e0) + (m2 - m1) / 2 + (m3 - m2) / 3, 6)
               AS harmonic_c
    FROM mm"""
    )


def _hyperball_nf_sql() -> str:
    """Neighborhood function: exact integer micro-unit sums (the same
    floor(x*1e6 + 0.5) op chain as the Spark side — float sums are
    order-dependent, integer sums are not) + the interpolation CASE
    on the recovered doubles."""
    return (
        _hyperball_prefix()
        + """,
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(CAST(floor(e0 * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                   AS s0,
               CAST(sum(CAST(floor(m1 * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                   AS s1,
               CAST(sum(CAST(floor(m2 * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                   AS s2,
               CAST(sum(CAST(floor(m3 * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                   AS s3
        FROM mm
    ),
    nbs AS (
        SELECT n_nodes,
               s0 / 1e6 AS nb0, s1 / 1e6 AS nb1,
               s2 / 1e6 AS nb2, s3 / 1e6 AS nb3,
               0.9::DOUBLE * (s3 / 1e6) AS target
        FROM s
    )
    SELECT n_nodes,
           round(nb0, 6) AS nb0,
           round(nb1, 6) AS nb1,
           round(nb2, 6) AS nb2,
           round(nb3, 6) AS nb3,
           round(CASE
               WHEN nb0 >= target THEN 0.0::DOUBLE
               WHEN nb1 >= target THEN (target - nb0) / (nb1 - nb0)
               WHEN nb2 >= target
                   THEN 1.0::DOUBLE + (target - nb1) / (nb2 - nb1)
               ELSE 2.0::DOUBLE + (target - nb2) / (nb3 - nb2)
           END, 6) AS eff_diameter_90
    FROM nbs"""
    )


def _hits_sql() -> str:
    """Unrolled HITS_ITERS-iteration fixed-point HITS (same BIGINT
    max-normalization arithmetic as the Spark side; DuckDB ``//`` is
    floor division — identical to Spark ``div`` on the nonnegative
    values here)."""
    parts = [
        f"WITH {_SQL_EDGES}",
        """,
    n AS MATERIALIZED (SELECT DISTINCT page FROM
          (SELECT src AS page FROM e UNION SELECT dst FROM e))""",
        f""",
    h0 AS MATERIALIZED (
        SELECT page, CAST({HITS_SCALE} AS BIGINT) AS h FROM n)""",
    ]
    # every per-iteration CTE is MATERIALIZED: DuckDB inlines plain
    # CTEs once PER REFERENCE, and each HITS level references the one
    # below it 2-3x (raw -> scalar max + left join), so an inlined
    # 5-iteration chain re-expands the whole prefix ~4^10 times —
    # materializing pins each level to one evaluation (same lesson as
    # the Spark side's per-round localCheckpoint)
    for i in range(HITS_ITERS):
        parts.append(
            f""",
    ra{i + 1} AS MATERIALIZED (
        SELECT ew.dst, CAST(sum(h.h * ew.w) AS BIGINT) AS ra
        FROM ew JOIN h{i} h ON ew.src = h.page GROUP BY ew.dst
    ),
    da{i + 1} AS MATERIALIZED (
        SELECT greatest(CAST(1 AS BIGINT),
                        CAST(max(ra) // {HITS_SCALE} AS BIGINT)) AS da
        FROM ra{i + 1}
    ),
    a{i + 1} AS MATERIALIZED (
        SELECT n.page,
               CAST(coalesce(ra.ra, CAST(0 AS BIGINT)) // d.da AS BIGINT) AS a
        FROM n CROSS JOIN da{i + 1} d
        LEFT JOIN ra{i + 1} ra ON n.page = ra.dst
    ),
    rh{i + 1} AS MATERIALIZED (
        SELECT ew.src, CAST(sum(a.a * ew.w) AS BIGINT) AS rh
        FROM ew JOIN a{i + 1} a ON ew.dst = a.page GROUP BY ew.src
    ),
    dh{i + 1} AS MATERIALIZED (
        SELECT greatest(CAST(1 AS BIGINT),
                        CAST(max(rh) // {HITS_SCALE} AS BIGINT)) AS dh
        FROM rh{i + 1}
    ),
    h{i + 1} AS MATERIALIZED (
        SELECT n.page,
               CAST(coalesce(rh.rh, CAST(0 AS BIGINT)) // d.dh AS BIGINT) AS h
        FROM n CROSS JOIN dh{i + 1} d
        LEFT JOIN rh{i + 1} rh ON n.page = rh.src
    )"""
        )
    parts.append(
        f"""
    SELECT h.page, h.h AS hub_scaled, a.a AS auth_scaled
    FROM h{HITS_ITERS} h JOIN a{HITS_ITERS} a ON h.page = a.page"""
    )
    return "".join(parts)


def _lpa_sql() -> str:
    """Unrolled LPA_ITERS-round synchronous label propagation (same
    (count DESC, label ASC) tie order as the Spark side; MATERIALIZED
    per-round CTEs — each level is referenced twice)."""
    parts = [
        f"WITH {_SQL_EDGES}",
        """,
    und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e WHERE src <> dst
    ),
    nbr AS MATERIALIZED (
        SELECT a AS node, b AS nbr FROM und
        UNION ALL SELECT b AS node, a AS nbr FROM und
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT node, node AS label FROM nbr
    )""",
    ]
    for i in range(LPA_ITERS):
        parts.append(
            f""",
    g{i + 1} AS MATERIALIZED (
        SELECT nbr.node, l.label, CAST(count(*) AS BIGINT) AS cnt
        FROM nbr JOIN l{i} l ON nbr.nbr = l.node
        GROUP BY 1, 2
    ),
    b{i + 1} AS MATERIALIZED (
        SELECT node, label AS new_label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY cnt DESC, label ASC) AS rn
            FROM g{i + 1})
        WHERE rn = 1
    ),
    l{i + 1} AS MATERIALIZED (
        SELECT l.node, coalesce(b.new_label, l.label) AS label
        FROM l{i} l LEFT JOIN b{i + 1} b USING (node)
    )"""
        )
    parts.append(
        f"""
    SELECT node AS page, label AS community FROM l{LPA_ITERS}"""
    )
    return "".join(parts)


def _ppr_sql() -> str:
    """Unrolled seeded personalized PageRank — _pagerank_sql with the
    uniform teleport replaced by the seed-set teleport."""
    parts = [
        f"WITH {_SQL_EDGES}",
        f""",
    n AS MATERIALIZED (SELECT DISTINCT page FROM
          (SELECT src AS page FROM e UNION SELECT dst FROM e)),
    sd AS MATERIALIZED (
        SELECT page, (page % {PPR_SEED_MOD} = 0) AS is_seed FROM n),
    cnt AS MATERIALIZED (
        SELECT count(*) AS ns FROM sd WHERE is_seed),
    r0 AS MATERIALIZED (
        SELECT page,
               CAST(CASE WHEN is_seed THEN {SCALE} // ns
                         ELSE 0 END AS BIGINT) AS pr
        FROM sd, cnt)""",
    ]
    for i in range(N_ITERS):
        parts.append(
            f""",
    c{i + 1} AS MATERIALIZED (
        SELECT ew.dst, CAST(sum((r.pr // ew.ow) * ew.w) AS BIGINT) AS s
        FROM ew JOIN r{i} r ON ew.src = r.page
        GROUP BY ew.dst
    ),
    r{i + 1} AS MATERIALIZED (
        SELECT sd.page,
               CAST(({DAMP_DEN - DAMP_NUM}
                     * (CASE WHEN sd.is_seed
                             THEN CAST({SCALE} // cnt.ns AS BIGINT)
                             ELSE CAST(0 AS BIGINT) END)
                     + {DAMP_NUM} * coalesce(c.s, 0)) // {DAMP_DEN}
                    AS BIGINT) AS pr
        FROM sd CROSS JOIN cnt
        LEFT JOIN c{i + 1} c ON sd.page = c.dst
    )"""
        )
    parts.append(f"\n    SELECT page, pr AS ppr_scaled FROM r{N_ITERS}")
    return "".join(parts)


ORACLE_SQL = {
    "hyperball_centrality": _hyperball_sql(),
    "click_hits": _hits_sql(),
    "click_communities_lpa": _lpa_sql(),
    "click_ppr_seeded": _ppr_sql(),
    # independent-algorithm oracle: recursive-CTE min-label propagation
    # + min aggregate (DuckDB's recursive UNION dedups visited states,
    # so it terminates) vs the engine's star contraction.  Two bounds
    # matter: the non-recursive feeders are MATERIALIZED (plain CTEs
    # inline PER REFERENCE, and the recursive arm references nbr every
    # iteration — the click_hits lesson), and the recursive arm prunes
    # to labels SMALLER than the receiving node (the component minimum
    # m satisfies m < v for every other member v, so min propagation is
    # unaffected, while the unpruned full transitive closure would
    # materialize Σ|C|² rows on a giant component)
    "click_components": (
        "WITH RECURSIVE "
        + _SQL_EDGES.strip().rstrip()
        + """,
    und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e WHERE src <> dst
    ),
    nbr AS MATERIALIZED (
        SELECT a AS node, b AS nbr FROM und
        UNION ALL SELECT b AS node, a AS nbr FROM und
    ),
    n AS MATERIALIZED (SELECT DISTINCT node FROM nbr),
    closure AS (
        SELECT node, node AS r FROM n
        UNION
        SELECT nbr.node, c.r FROM nbr JOIN closure c ON nbr.nbr = c.node
        WHERE c.r < nbr.node
    )
    SELECT node AS page, min(r) AS component
    FROM closure GROUP BY node"""
    ),
    "hyperball_neighborhood": _hyperball_nf_sql(),
    "click_graph_edges": f"WITH {_SQL_EDGES} SELECT src, dst, w, ow FROM ew",
    "click_triangles": f"""
        WITH {_SQL_EDGES},
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM e WHERE src <> dst
        ),
        dg AS (
            SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
            ) GROUP BY 1
        ),
        orient AS (
            SELECT CASE WHEN (da.deg, und.a) < (db.deg, und.b)
                        THEN und.a ELSE und.b END AS x,
                   CASE WHEN (da.deg, und.a) < (db.deg, und.b)
                        THEN und.b ELSE und.a END AS y
            FROM und
            JOIN dg da ON da.v = und.a
            JOIN dg db ON db.v = und.b
        )
        SELECT (SELECT CAST(count(*) AS BIGINT)
                FROM orient e1
                JOIN orient e2 ON e1.y = e2.x
                JOIN orient e3 ON e3.x = e1.x AND e3.y = e2.y)
                   AS n_triangles,
               (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
               (SELECT CAST(count(*) AS BIGINT) FROM dg) AS n_vertices
    """,
    "clustering_coefficients": f"""
        WITH {_SQL_EDGES},
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM e WHERE src <> dst
        ),
        dg AS (
            SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
            ) GROUP BY 1
        ),
        orient AS (
            SELECT CASE WHEN (da.deg, und.a) < (db.deg, und.b)
                        THEN und.a ELSE und.b END AS x,
                   CASE WHEN (da.deg, und.a) < (db.deg, und.b)
                        THEN und.b ELSE und.a END AS y
            FROM und
            JOIN dg da ON da.v = und.a
            JOIN dg db ON db.v = und.b
        ),
        tri AS (
            SELECT e1.x AS ta, e1.y AS tb, e2.y AS tc
            FROM orient e1
            JOIN orient e2 ON e1.y = e2.x
            JOIN orient e3 ON e3.x = e1.x AND e3.y = e2.y
        ),
        tv AS (
            SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM (
                SELECT ta AS v FROM tri
                UNION ALL SELECT tb FROM tri
                UNION ALL SELECT tc FROM tri
            ) GROUP BY 1
        )
        SELECT dg.v AS page, dg.deg,
               coalesce(tv.n_tri, CAST(0 AS BIGINT)) AS n_tri,
               CASE WHEN dg.deg >= 2
                    THEN round((2 * coalesce(tv.n_tri, 0)) * 1.0
                               / (dg.deg * (dg.deg - 1)), 6)
                    ELSE 0.0 END AS lcc
        FROM dg LEFT JOIN tv USING (v)
    """,
    "click_pagerank": _pagerank_sql(),
    # textually the SAME recursion as the engine runs — only the
    # json-extract idiom differs (DuckDB's recursive CTE is a mature
    # independent implementation, so this is a real cross-check)
    "click_reachability": (
        "WITH RECURSIVE beam AS ("
        + _beam_sql("events", "CAST(json_extract_string({0}, '$.k') AS INT)")
        + "), "
        + _reach_cte("beam")
    ),
}
