"""Deduplication suite over the ``documents`` table (training-data layer).

Four families, exact -> approximate, each the standard large-corpus
technique:

- :func:`exact_dedup_docs` — content-hash groupBy (the classic first
  pass; md5 so the DuckDB oracle hashes identically)
- :func:`ngram_jaccard_pairs` — EXACT near-dup pairs via an inverted
  shingle index self-join (candidates = pairs sharing >=1 shingle,
  which is every pair with Jaccard > 0 — exhaustive), then exact
  Jaccard from intersection counts.  Oracle-checked.
- :func:`minhash_signatures` + :func:`minhash_lsh_neardup` — the scale
  path: k=8 portable md5-based minhashes; LSH banding (4 bands x 2
  rows) buckets candidates, exact-Jaccard verification filters false
  positives (output precision 1.0; recall tested vs the exact method).
  Both oracle-checked: recall<1 is a property vs the *exact* pair set,
  but the LSH output itself is a deterministic function of the input,
  so the DuckDB oracle replays the same banding and verification.
- :func:`simhash_buckets` — 16-bit token simhash; identical-signature
  grouping.  Oracle-checked (same determinism argument).

Scale notes: the inverted-index join's hot keys are high-document-
frequency shingles (cost ~ sum(df^2)); at 100 TB you cap df or go
straight to minhash-LSH (provided).  The LSH path shuffles only
(band, bucket) pairs — linear in corpus size — then verifies a
candidate set ~ the true-duplicate count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from .textstats import _SQL_TOKENS as _TX_SQL_TOKENS
from .textstats import md5_int

JACCARD_THRESHOLD = 0.8
T_NUM, T_DEN = 4, 5  # JACCARD_THRESHOLD as an exact integer fraction
assert T_NUM / T_DEN == JACCARD_THRESHOLD
N_MINHASH = 8
LSH_BANDS = 4  # x 2 rows/band


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingles() -> Column:
    """Distinct word 3-gram shingles, document order irrelevant.

    ``transform`` over an index ``sequence`` with ``slice`` on a BOUND
    token column: the inner reference must be a plain column (one
    ``split`` per row, bound by the child projection), never the
    ``split`` expression inline — higher-order functions are
    interpreted, so an inline expression re-evaluates once *per
    element*, O(tokens^2) per document (measured 9x slower at sf0.1).
    The bound-column transform also beats the earlier triple
    slice+zip_with chain (0.83 s vs 1.08 s warm at sf0.1): one slice
    per gram instead of three array allocations + two zip passes.
    """
    t = F.col("_toks")
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(" ", F.slice(t, i, 3)),
    )
    return F.when(n >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _with_shingles(d: DataFrame) -> DataFrame:
    """(doc_id, sh) with the token split materialized as a real child
    column so the transform lambda binds it once per row."""
    return d.withColumn("_toks", F.split(F.lower(F.col("text")), " ")).select(
        "doc_id", _shingles().alias("sh")
    )


def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: keeper = min doc_id per md5(text) (D2
    shape, updater/__init__.py:92-105)."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_shingles(_docs(spark, sf_dir)).select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s")
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """EXACT Jaccard>=t near-dup pairs via PREFIX-FILTERED candidate
    generation + exact verification.  ``docs`` overrides the corpus
    relation (same (doc_id, body) schema) — the hook
    :func:`lsh_recall_report`'s sampling contract filters through, so
    a sampled audit pays the exact join only on the sample.

    The naive inverted-index self-join costs sum(df^2) over shingles
    and is dominated by hot (high-document-frequency) shingles.
    Prefix filtering (Chaudhuri et al. ICDE'06 SSJoin; Bayardo et al.
    WWW'07 All-Pairs) keeps the result EXACT while joining only a
    fraction of the index: order each document's shingles by global
    (df, shingle) ascending — rarest first — and keep the first
    ``p = n - ceil(t*n) + 1`` as its *prefix*.  Theorem: if
    J(A,B) >= t, prefix(A) and prefix(B) intersect (if A's shingles in
    the intersection all lay outside its prefix, then
    |A∩B| <= n_A - p_A = ceil(t*n_A) - 1 < t*n_A <= t*|A∪B|, a
    contradiction) — so the prefix self-join loses no true pair, and
    exact-Jaccard verification on the full sets removes every false
    candidate.  Hot shingles sort LAST and fall out of almost every
    prefix, collapsing the sum(df^2) hot-key term; at t=0.8 the prefix
    is ~20% of the index.  Two further EXACT candidate cuts from
    PPJoin (Xiao et al. WWW'08):

    - length filter: J >= t forces t*max(n1,n2) <= min(n1,n2), i.e.
      ``T_NUM*n1 <= T_DEN*n2`` and vice versa;
    - positional filter: if the first shared token sits at sorted
      positions (ra, rb), the intersection is bounded by
      ``1 + min(n1-ra, n2-rb)``, which must reach the equivalent
      overlap bound ``alpha = ceil(t/(1+t)*(n1+n2))`` — as integers,
      ``(T_NUM+T_DEN) * (1 + min(..)) >= T_NUM*(n1+n2)``.  ANY-token
      semantics is sound: for a qualifying pair the FIRST common
      token (in the global order) always passes the test.

    All threshold arithmetic is integer (t = T_NUM/T_DEN), so no
    float-ceil boundary can flip a prefix length or filter.  Unlike a
    df-cap this is not a heuristic: adversarial corpora (e.g.
    thousands of exact copies, where EVERY shingle is hot) still pair
    correctly because identical docs have identical prefixes.
    Equality with the brute-force join is pinned by pytest on both
    the oracle corpus and an all-duplicates corpus.
    """
    from pyspark.sql import Window

    # the shingle construction (interpreted HOF chain) feeds FOUR
    # consumers (df table, prefix ranking, two verification sides) —
    # materialize the compact per-doc array form once, as in
    # minhash_lsh_neardup
    if docs is None:
        docs = _docs(spark, sf_dir)
    arr = _with_shingles(docs).localCheckpoint(eager=False)
    ex = arr.select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s")
    )
    # global document frequency per shingle (linear agg, map-side
    # partial); join back is shuffle-on-shingle, same key as the old
    # self-join but against an aggregated (small) side
    df_tbl = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = ex.join(df_tbl, "s").withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "s")
        ),
    )
    # integer ceil(t*n) = (T_NUM*n + T_DEN - 1) div T_DEN
    ceil_tn = (F.lit(T_NUM) * F.col("n") + F.lit(T_DEN - 1)) / F.lit(T_DEN)
    prefix = ranked.filter(
        F.col("r") <= F.col("n") - F.floor(ceil_tn) + 1
    ).select("doc_id", "n", "r", "s")
    a, b = prefix.alias("a"), prefix.alias("b")
    # equivalent-overlap positional bound, all-integer:
    # 1 + min(n1-ra, n2-rb) >= ceil(T_NUM*(n1+n2)/(T_NUM+T_DEN))
    pos_ok = (
        F.lit(T_NUM + T_DEN)
        * (
            F.lit(1)
            + F.least(
                F.col("a.n") - F.col("a.r"), F.col("b.n") - F.col("b.r")
            )
        )
        >= F.lit(T_NUM) * (F.col("a.n") + F.col("b.n"))
    )
    len_ok = (
        F.lit(T_DEN) * F.col("a.n") >= F.lit(T_NUM) * F.col("b.n")
    ) & (F.lit(T_DEN) * F.col("b.n") >= F.lit(T_NUM) * F.col("a.n"))
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & len_ok
            & pos_ok,
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # exact verification on the candidate set only, against the COMPACT
    # per-doc arrays (array_intersect is hash-based): two joins sized by
    # |candidates| ~ true-pair count, instead of re-shuffling the full
    # exploded index twice
    pairs = (
        cand.join(
            arr.select(
                F.col("doc_id").alias("d1"), F.col("sh").alias("sh1")
            ),
            "d1",
        )
        .join(
            arr.select(
                F.col("doc_id").alias("d2"), F.col("sh").alias("sh2")
            ),
            "d2",
        )
        .select(
            "d1",
            "d2",
            F.size(F.array_intersect("sh1", "sh2")).alias("inter"),
            F.size("sh1").alias("n1"),
            F.size("sh2").alias("n2"),
        )
        .filter(F.col("inter") > 0)
    )
    j = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    ).cast("double")
    # filter on the UNROUNDED ratio (the oracle does too); round only
    # for display — round-then-filter would admit jaccard in
    # [t - 5e-7, t) that the oracle rejects
    return (
        pairs.filter(j >= JACCARD_THRESHOLD)
        .select("d1", "d2", F.round(j, 6).alias("jaccard"))
    )


MH_MOD = 2_147_483_647  # 2^31-1; affine family (a*h+b) mod p, one md5/shingle
MH_A = [131, 313, 571, 787, 1019, 1249, 1471, 1693]
MH_B = [17, 29, 43, 59, 73, 89, 101, 113]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 minhash signature per doc (portable md5-int hash family).

    Shape: explode shingles once -> one md5 per (doc, shingle) -> 8
    conditional mins in a single hash aggregate.  The per-row
    alternative (8 ``array_min(transform(...))`` columns over the
    shingle array) re-evaluates the interpreted HOF chain per column —
    measured 54s vs 6s at sf0.1.  The aggregate is partial+final
    (map-side combine), so at 100 TB it shuffles 8 longs per document,
    not the shingle sets."""
    ex = (
        _with_shingles(_docs(spark, sf_dir))
        .select("doc_id", F.explode_outer("sh").alias("sh"))
        .withColumn("h", md5_int(F.col("sh")) % MH_MOD)
    )
    aggs = [
        F.coalesce(
            F.min((F.lit(MH_A[i]) * F.col("h") + F.lit(MH_B[i])) % MH_MOD),
            F.lit(-1),
        ).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def _signatures_from_index(ex: DataFrame) -> DataFrame:
    """Minhash signatures computed from an existing shingle index
    (doc_id, n, s) — lets LSH share ONE shingle materialization between
    the banding and verification sides.  Docs with zero shingles are
    absent (vs. minhash_signatures' explode_outer -1 rows); for
    near-dup they cannot pair anyway (empty intersection fails exact
    verification)."""
    h = ex.withColumn("h", md5_int(F.col("s")) % MH_MOD)
    aggs = [
        F.min((F.lit(MH_A[i]) * F.col("h") + F.lit(MH_B[i])) % MH_MOD).alias(
            f"mh{i}"
        )
        for i in range(N_MINHASH)
    ]
    return h.groupBy("doc_id").agg(*aggs)


def _banded_from_sig(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) rows from a signature frame — one pass
    via a single explode (a per-band union would recompute the
    signature aggregate once per band per join side)."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.concat_ws(
                            ":", F.col(f"mh{2*bnd}"), F.col(f"mh{2*bnd+1}")
                        ).alias("bucket"),
                    )
                    for bnd in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_lsh_neardup(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """LSH-bucketed candidates (4 bands x 2 rows) -> exact-Jaccard
    verification at t=0.8.  Precision 1.0 by construction; recall
    1-(1-t^2)^4 ~ 0.983 at the threshold (tested vs the exact pairs).
    ``docs`` overrides the corpus relation (lsh_recall_report's
    sampling hook); per-doc signatures are corpus-independent, so the
    sampled pair set is exactly the full pair set restricted to
    sampled endpoints."""
    # the shingle CONSTRUCTION (interpreted HOF chain) feeds both the
    # signature aggregate and the two verification sides —
    # localCheckpoint materializes the compact per-doc array form once
    # (checkpointing the exploded index instead was measured slower:
    # materializing millions of exploded rows costs more than two cheap
    # re-explodes; at scale signatures/shingles are materialized tables)
    if docs is None:
        docs = _docs(spark, sf_dir)
    arr = _with_shingles(docs).localCheckpoint(eager=False)
    ex = arr.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    # one pass over the signatures -> (band, bucket) rows via a single
    # explode (a per-band union would recompute the signature aggregate
    # once per band per join side)
    sig = _signatures_from_index(ex)
    banded = _banded_from_sig(sig)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # exact verification of the candidate set only (same cached index)
    inter = (
        cand.join(ex.alias("ea"), F.col("d1") == F.col("ea.doc_id"))
        .join(
            ex.alias("eb"),
            (F.col("d2") == F.col("eb.doc_id"))
            & (F.col("ea.s") == F.col("eb.s")),
        )
        .groupBy("d1", "d2")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("ea.n").alias("n1"),
            F.max("eb.n").alias("n2"),
        )
    )
    j = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    ).cast("double")
    # unrounded filter, rounded display (same asymmetry fix as
    # ngram_jaccard_pairs — matches the oracle predicate exactly)
    return (
        inter.filter(j >= JACCARD_THRESHOLD)
        .select("d1", "d2", F.round(j, 6).alias("jaccard"))
    )


def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit token simhash; groups sharing a signature are dup buckets."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.col("text")), " "))
        ).alias("tok"),
    )
    d = d.withColumn("h", md5_int(F.col("tok")))
    bit_sums = d.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"b{j}")
            for j in range(16)
        ]
    )
    sim = bit_sums.select(
        "doc_id",
        sum(
            (F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)))
            for j in range(16)
        ).alias("simhash"),
    )
    return (
        sim.groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def neardup_components(
    spark: SparkSession, sf_dir: str, edge_source: str = "exact"
) -> DataFrame:
    """Connected components over the near-dup pair graph: every
    document labeled with
    the minimum doc_id reachable through near-dup edges — the
    canonical cluster id a dedup pipeline keys on (keep the rows
    where ``is_keeper``).  This is the step that turns *pairs* into
    *clusters*: pairwise near-dup output alone over-deletes (A~B,
    B~C with A!~C must still keep exactly one of {A,B,C}).

    Algorithm: iterative min-label propagation as DataFrame joins —
    per round ``comp(n) := min(comp(n), min over in-neighbors
    comp(m))`` with a ``localCheckpoint`` per round to truncate
    lineage and one bounded driver-side convergence count.  Round
    count = min-label propagation distance; near-dup clusters are
    shallow (transitive chains of near-identical docs), so this
    converges in a handful of rounds.  For general web-graph
    components at 10^10 edges, swap the loop body for the
    alternating large-star/small-star edge rewrite (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — same join
    machinery, O(log n) rounds; the propagation loop is the right
    tool for the dedup-cluster topology.

    ``edge_source`` selects where the pair graph comes from:
    ``'exact'`` (default) uses the prefix-filtered exact
    ``ngram_jaccard_pairs`` — the oracle-checkable baseline — while
    ``'lsh'`` uses ``minhash_lsh_neardup``, the banded linear-shuffle
    pair source, making the COMPOSED cluster-dedup path bucketed end
    to end (the 100 TB shape; recall ≈ 1-(1-t^2)^4 ≈ 0.983 per pair
    at t=0.8, and a pair missed by every band still merges whenever
    any band links it transitively).  Both variants are registered as
    driver queries with their own deterministic-replay oracles, and
    pytest pins LSH-edge labels == exact-edge labels on the test
    corpus.
    """
    if edge_source == "lsh":
        pair_df = minhash_lsh_neardup(spark, sf_dir)
    elif edge_source == "exact":
        pair_df = ngram_jaccard_pairs(spark, sf_dir)
    else:
        raise ValueError(f"edge_source must be 'exact' or 'lsh', got {edge_source!r}")
    edges = pair_df.select("d1", "d2")
    sym = edges.union(
        edges.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).localCheckpoint(eager=False)
    labels = _docs(spark, sf_dir).select(
        "doc_id", F.col("doc_id").alias("comp")
    ).localCheckpoint(eager=False)
    while True:
        nbr = (
            sym.join(labels, F.col("d1") == F.col("doc_id"))
            .groupBy(F.col("d2").alias("doc_id"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("comp").alias("component_id"),
        (F.col("doc_id") == F.col("comp")).alias("is_keeper"),
    )


def neardup_components_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`neardup_components` over the LSH edge source — the
    composed, bucketed-end-to-end cluster-dedup path (driver query
    with its own deterministic LSH-replay closure oracle)."""
    return neardup_components(spark, sf_dir, edge_source="lsh")


SPLIT_DEN = 10  # component-hash buckets; bucket 0 -> validation


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/validation split: every document is routed
    by the md5 hash of its NEAR-DUP COMPONENT label, never its own id,
    so near-duplicates cannot straddle the split — the classic eval
    leak (a validation doc whose near-copy sits in train inflates the
    benchmark) that doc-level hash splits silently commit.  The other
    direction is :func:`decontam.benchmark_contamination` (known eval
    text scrubbed from train); this op makes the split itself
    leak-proof at corpus-build time.

    Composition: the LSH-edge component labeling (the bucketed 100 TB
    cluster path) plus ONE map — the split adds zero shuffles on top
    of the clustering it reuses, and the assignment is pure arithmetic
    on the component label, so it is stable under re-sharding and
    incremental re-runs (a component keeps its side as long as its
    min-doc label survives).  Reference analog: the dedup/update
    semantics of updater/__init__.py:92-105, extended to the split
    policy an LLM corpus needs."""
    comp = neardup_components(spark, sf_dir, edge_source="lsh")
    bucket = md5_int(F.col("component_id").cast("string")) % SPLIT_DEN
    return comp.select(
        "doc_id",
        "component_id",
        F.when(bucket == 0, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def cluster_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-cluster keeper policy: within every near-dup component
    keep the HIGHEST-QUALITY member (tie -> lowest doc_id), not the
    lowest-id one.  ``neardup_components``' ``is_keeper`` keys on the
    min label because that is stable and order-free; a curation
    pipeline instead wants the best page of each mirror/boilerplate
    cluster (SlimPajama/RefinedWeb keep-best-duplicate policy).
    Composition: the LSH-edge component labels (the bucketed 100 TB
    path) joined to textstats' quality score + ONE per-component
    row_number window — the keep decision adds a single
    component-keyed shuffle on top of the clustering it reuses.

    Reference analog: updater/__init__.py:92-105 keeps the newest
    version of a re-scraped case; generalized here to keep the best
    member of a content cluster."""
    from pyspark.sql import Window

    from .textstats import quality_score

    comp = neardup_components(spark, sf_dir, edge_source="lsh").select(
        "doc_id", "component_id"
    )
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        comp.join(q, "doc_id")
        .select(
            "doc_id",
            "component_id",
            "quality",
            (F.row_number().over(w) == 1).alias("keep"),
        )
        .orderBy("doc_id")
    )


def _large_star(und: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): symmetrize, then connect every
    strictly-larger neighbor of u to m(u) = min(neighbors(u) + {u})."""
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(und: DataFrame) -> DataFrame:
    """Small-star round: orient each edge (larger -> smaller), then
    connect u and all its smaller neighbors to their minimum."""
    hi = und.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = hi.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = hi.join(mins, "u").filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    selfs = mins.select("u", F.col("m").alias("v"))
    return nbrs.union(selfs).filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    spark: SparkSession, nodes: DataFrame, edges: DataFrame
) -> DataFrame:
    """Alternating large-star/small-star connected components — the
    10^10-edge path the propagation loop's docstring names.  Each
    round is two groupBy+join passes over the CURRENT edge set, which
    the algorithm provably SHRINKS toward per-component stars rooted
    at the minimum node in O(log n) rounds — unlike min-label
    propagation, whose round count is the graph diameter and whose
    every round rejoins the full original edge set.  At web scale
    (chains of boilerplate-linked near-dups can be long) that is the
    difference between ~log2(cluster) and ~cluster rounds.

    ``nodes``: one column ``doc_id``; ``edges``: columns ``d1, d2``
    (undirected, any orientation).  Returns (doc_id, component_id,
    is_keeper) with component_id = min reachable doc_id — identical
    labels to :func:`neardup_components` (pinned by pytest on random
    graphs vs a union-find oracle and on the test corpus)."""
    und = (
        edges.select(F.col("d1").alias("u"), F.col("d2").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_sig = None
    while True:
        und = _small_star(_large_star(und)).localCheckpoint(eager=False)
        # convergence: the star edge set is a fixpoint of both rounds.
        # One bounded driver-side aggregate (count + xor of row hashes)
        # per round — O(1) rows collected, same as the loop's count.
        sig = und.select(
            F.count(F.lit(1)).alias("n"),
            # pmod 2^31 keeps each term in [0, 2^31): the sum cannot
            # overflow int64 below 2^32 edges (ANSI mode would throw)
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(2**31))), F.lit(0)
            ).alias("x"),
        ).collect()[0]
        sig = (sig["n"], sig["x"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: every non-root node has exactly one edge to its
    # component's min (u > v star edges); roots/singletons label selves
    root = und.select(
        F.greatest("u", "v").alias("doc_id"), F.least("u", "v").alias("m")
    ).groupBy("doc_id").agg(F.min("m").alias("m"))
    return (
        nodes.join(root, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m"), F.col("doc_id")).alias("component_id"),
        )
        .withColumn("is_keeper", F.col("doc_id") == F.col("component_id"))
    )


def neardup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster dedup with LSH edges + star-contraction components —
    the fully scale-true composition (banded linear-shuffle pair
    source, O(log n)-round shrinking component rounds)."""
    edges = minhash_lsh_neardup(spark, sf_dir).select("d1", "d2")
    nodes = _docs(spark, sf_dir).select("doc_id")
    return connected_components_star(spark, nodes, edges)


INC_NEW_MOD = 3  # new batch = doc_id % 3 == 2 (~1/3 of the corpus)
INC_COPY_MOD = 50  # every 50th HISTORICAL doc is refetched unchanged
INC_COPY_OFFSET = 1_000_000


def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedupe a NEW crawl batch against the EXISTING corpus without
    re-pairing the corpus with itself — the operation every wave of a
    production crawl runs (reference analog: the updater's
    skip-already-published check, updater/__init__.py:92-105,
    generalized from exact id-match to exact + near content match).

    Split (deterministic): historical = ``doc_id % 3 != 2``; new batch
    = the rest PLUS injected refetches (every 50th historical doc
    reappears unchanged under ``doc_id + 1_000_000`` — the corpus has
    no natural exact dups, so refetches are the exact-dup class;
    near-dups across the split occur naturally).

    Per new doc: ``dup_exact`` (md5 matches some historical doc),
    ``dup_near`` (LSH-candidate historical doc verifies at
    Jaccard >= 0.8), ``keep`` = neither.

    Scale shape: the historical side's signatures/banded buckets and
    content hashes are PRECOMPUTED artifacts in production (written
    once per wave, read thereafter) — per wave the work is
    O(new batch): hash-join new hashes against the corpus hash index,
    join new (band, bucket) rows against the corpus bucket index
    (linear shuffle, same keys as :func:`minhash_lsh_neardup`), and
    verify only the candidate pairs.  Nothing re-pairs the corpus
    against itself, so a 100 TB corpus costs per-wave what the WAVE
    weighs, not what the corpus weighs."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % INC_NEW_MOD != INC_NEW_MOD - 1)
    new = docs.filter(F.col("doc_id") % INC_NEW_MOD == INC_NEW_MOD - 1).union(
        hist.filter(F.col("doc_id") % INC_COPY_MOD == 0).select(
            (F.col("doc_id") + F.lit(INC_COPY_OFFSET)).alias("doc_id"), "text"
        )
    )
    # exact: shuffle join on content hash (hist side distinct => <=1
    # match per new doc, no fanout)
    hist_hash = hist.select(F.md5("text").alias("h")).distinct()
    exact = (
        new.select("doc_id", F.md5("text").alias("h"))
        .join(hist_hash.withColumn("dup_exact", F.lit(True)), "h", "left")
        .select("doc_id", F.coalesce("dup_exact", F.lit(False)).alias("dup_exact"))
    )
    # near: band the two sides separately, join new buckets against
    # hist buckets (the incremental form of the self-join), verify
    # candidates exactly
    arr_new = _with_shingles(new).localCheckpoint(eager=False)
    arr_hist = _with_shingles(hist).localCheckpoint(eager=False)
    ex_new = arr_new.select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s")
    )
    ex_hist = arr_hist.select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s")
    )
    bn = _banded_from_sig(_signatures_from_index(ex_new)).alias("bn")
    bh = _banded_from_sig(_signatures_from_index(ex_hist)).alias("bh")
    cand = (
        bn.join(
            bh,
            (F.col("bn.band") == F.col("bh.band"))
            & (F.col("bn.bucket") == F.col("bh.bucket")),
        )
        .select(
            F.col("bn.doc_id").alias("d_new"), F.col("bh.doc_id").alias("d_hist")
        )
        .distinct()
    )
    pairs = (
        cand.join(ex_new.alias("en"), F.col("d_new") == F.col("en.doc_id"))
        .join(
            ex_hist.alias("eh"),
            (F.col("d_hist") == F.col("eh.doc_id"))
            & (F.col("en.s") == F.col("eh.s")),
        )
        .groupBy("d_new", "d_hist")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("en.n").alias("n1"),
            F.max("eh.n").alias("n2"),
        )
    )
    j = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    ).cast("double")
    near = (
        pairs.filter(j >= JACCARD_THRESHOLD)
        .select("d_new")
        .distinct()
        .withColumn("dup_near", F.lit(True))
    )
    return (
        exact.join(near, exact["doc_id"] == near["d_new"], "left")
        .select(
            "doc_id",
            "dup_exact",
            F.coalesce("dup_near", F.lit(False)).alias("dup_near"),
            (
                ~(F.col("dup_exact") | F.coalesce("dup_near", F.lit(False)))
            ).alias("keep"),
        )
    )


def mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host detection: host pairs serving (near-)identical
    content sets — the crawl-ops composition of content-hash dedup at
    HOST granularity (a crawler collapses detected mirrors so every
    alias host stops being re-fetched; cf. the URL-level analog in
    operators/redirects.py).

    Synthetic mirror world (deterministic, from ``documents``): base
    host ``host{doc_id % 10}``; even-numbered hosts are FULLY
    mirrored on ``mirror{h}``, odd-numbered hosts only partially
    (``doc_id % 3 == 0`` — roughly a third of the content, a CDN
    cache or scraped clone rather than a mirror).  At threshold 0.8
    exactly the even pairs qualify.

    Algorithm — inverted index on the content hash, NEVER O(hosts^2):
    ONE aggregate by hash collects the distinct host set per content
    (the posting list), host pairs are generated MAP-SIDE from the
    sorted array (nested ``transform`` + ``flatten`` — no self-join),
    so cost is sum over hashes of (hosts-per-hash choose 2) — bounded
    by the content REPLICATION factor, not by corpus size or
    host-pair count.  Three hash exchanges total (by-hash agg, pair
    counts, per-host sizes), pinned in tests/test_shuffle_budgets.py;
    the posting table feeds two consumers and is localCheckpoint-ed
    per the pin-shared-subplans discipline.  Hot boilerplate hashes
    (error pages served by thousands of hosts) would need the same
    prefix/df treatment as ngram_jaccard_pairs; real mirror detection
    first strips boilerplate (interleaved.span_boilerplate_strip) so
    page hashes are discriminative.
    """
    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("h"))
    base = docs.select(
        F.concat(F.lit("host"), (d % 10).cast("string")).alias("host"), "h"
    )
    mirrored = docs.filter((d % 2 == 0) | (d % 3 == 0)).select(
        F.concat(F.lit("mirror"), (d % 10).cast("string")).alias("host"), "h"
    )
    # one shuffle by hash: distinct hosts per content, sorted so the
    # generated pairs are (host_a < host_b) without a join predicate
    by_hash = (
        base.unionByName(mirrored)
        .groupBy("h")
        .agg(F.sort_array(F.collect_set("host")).alias("hosts"))
        .localCheckpoint(eager=False)  # feeds pair gen AND sizes
    )
    hosts = F.col("hosts")
    pair_arr = F.flatten(
        F.transform(
            hosts,
            lambda x, i: F.transform(
                F.slice(hosts, i + 2, F.size(hosts)),
                lambda y: F.struct(x.alias("host_a"), y.alias("host_b")),
            ),
        )
    )
    shared = (
        by_hash.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.host_a").alias("host_a"), F.col("p.host_b").alias("host_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = (
        by_hash.select(F.explode("hosts").alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        shared.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.8)
        .select("host_a", "host_b", "n_shared", "n_a", "n_b", "jaccard")
        .orderBy("host_a", "host_b")
    )


def mirror_map_from_crawl(
    fetch_log: DataFrame, documents: DataFrame, containment: float = 0.8
) -> DataFrame:
    """Mine a ``(alias_host, canonical_host)`` collapse map from a
    crawl engine's OWN output — the host-level sibling of
    dust.rules_from_crawl: depth-4 fetch-log URLs joined to the span
    documents give each host's content-hash set; host pairs whose
    CONTAINMENT ``|A∩B| / min(|A|,|B|)`` clears the threshold are
    mirrors (containment, not Jaccard: a mirror discovered late has
    only a subset of the primary's corpus, which Jaccard under-scores
    but containment sees at 1.0).  The canonical side of a pair is
    the SHORTER host name (lexicographic min on ties) — the classic
    www-strip/clean-hostname canonicalization heuristic; observed
    content-set size is deliberately NOT used for direction, because
    which twin a crawl happened to discover more links on is routing
    noise, not identity.  Only alias rows are returned — feed
    straight into ``CrawlEngine(host_aliases=...)``.

    Same inverted-index shape as :func:`mirror_hosts` (posting list
    per hash, map-side pair generation — cost bounded by the content
    replication factor, never O(hosts^2))."""
    urls = fetch_log.filter(
        (F.col("depth") == 4) & (F.col("status") == "fetched")
    ).select(
        "host",
        F.regexp_extract("canonical_url", "CaseID=(\\d+)", 1).alias("doc_id"),
    )
    content = documents.select(
        "doc_id", F.md5(F.to_json("spans")).alias("h")
    ).distinct()
    cat = urls.join(content, "doc_id").select("host", "h").distinct()
    by_hash = (
        cat.groupBy("h")
        .agg(F.sort_array(F.collect_set("host")).alias("hosts"))
        .localCheckpoint(eager=False)  # feeds pair gen AND sizes
    )
    hosts = F.col("hosts")
    pair_arr = F.flatten(
        F.transform(
            hosts,
            lambda x, i: F.transform(
                F.slice(hosts, i + 2, F.size(hosts)),
                lambda y: F.struct(x.alias("host_a"), y.alias("host_b")),
            ),
        )
    )
    shared = (
        by_hash.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.host_a").alias("host_a"), F.col("p.host_b").alias("host_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = (
        by_hash.select(F.explode("hosts").alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    cont = F.col("n_shared").cast("double") / F.least("n_a", "n_b").cast(
        "double"
    )
    qualified = (
        shared.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .filter(cont >= containment)
    )
    la, lb = F.length("host_a"), F.length("host_b")
    a_is_primary = (la < lb) | ((la == lb) & (F.col("host_a") < F.col("host_b")))
    return qualified.select(
        F.when(a_is_primary, F.col("host_b"))
        .otherwise(F.col("host_a"))
        .alias("alias_host"),
        F.when(a_is_primary, F.col("host_a"))
        .otherwise(F.col("host_b"))
        .alias("canonical_host"),
    ).distinct()


_MIRROR_ORACLE = """
    WITH docs AS (
        SELECT doc_id, md5(text) AS h FROM documents
    ), postings AS (
        SELECT DISTINCT host, h FROM (
            SELECT 'host' || (doc_id % 10) AS host, h FROM docs
            UNION ALL
            SELECT 'mirror' || (doc_id % 10) AS host, h FROM docs
            WHERE doc_id % 2 = 0 OR doc_id % 3 = 0
        )
    ), sizes AS (
        SELECT host, CAST(count(*) AS BIGINT) AS n FROM postings GROUP BY host
    ), shared AS (
        SELECT a.host AS host_a, b.host AS host_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM postings a JOIN postings b
          ON a.h = b.h AND a.host < b.host
        GROUP BY a.host, b.host
    )
    SELECT s.host_a, s.host_b, s.n_shared,
           sa.n AS n_a, sb.n AS n_b,
           s.n_shared / (sa.n + sb.n - s.n_shared) AS jaccard
    FROM shared s
    JOIN sizes sa ON sa.host = s.host_a
    JOIN sizes sb ON sb.host = s.host_b
    WHERE s.n_shared / (sa.n + sb.n - s.n_shared) >= 0.8
    ORDER BY s.host_a, s.host_b
"""


SAMPLE_DEN = 1_000_000  # hash-threshold sampling granularity (ppm)


def lsh_recall_report(
    spark: SparkSession,
    sf_dir: str,
    sample_frac: float | None = None,
    sample_seed: int = 0,
) -> DataFrame:
    """One-row sketch-quality report: the MinHash-LSH pair set audited
    against the exact prefix-filtered Jaccard pairs at the same
    threshold — n_exact / n_lsh / n_common plus recall and precision.

    This is the measurement a production dedup pipeline runs on a
    SAMPLE before trusting the banded sketch on the full corpus (the
    banding parameters trade recall for candidate volume; an unstated
    recall is an unstated amount of residual duplicate data).  Composes the
    two in-tree pair generators verbatim; the exact side is the
    oracle-grade baseline, the LSH side is the 100 TB path.

    Sampling contract (the 100 TB mode): ``sample_frac`` applies ONE
    deterministic hash-threshold document sample
    (xxhash64(doc_id, seed) mod 10^6 < frac·10^6) to BOTH pair
    generators BEFORE pair generation, so the Σdf²-bounded exact join
    runs only on the sample.  Because both generators' pair membership
    depends only on the two endpoint documents (exact Jaccard by
    definition; LSH because per-doc signatures are corpus-independent),
    the sampled report equals the full report restricted to
    sample-endpoint pairs — pinned by
    tests/test_trainingdata_dedup.py::test_lsh_recall_report_sampling.
    The registered query runs the full set (test SF is bounded).

    Scale: with ``sample_frac`` the exact side is sample-sized; the
    report itself is two full-outer-joined pair sets + one global
    aggregate.
    """
    docs = _docs(spark, sf_dir)
    if sample_frac is not None:
        keep = int(sample_frac * SAMPLE_DEN)
        docs = docs.filter(
            F.pmod(
                F.xxhash64(F.col("doc_id").cast("string"), F.lit(sample_seed)),
                F.lit(SAMPLE_DEN),
            )
            < keep
        )
    exact = ngram_jaccard_pairs(spark, sf_dir, docs=docs).select("d1", "d2")
    lsh = minhash_lsh_neardup(spark, sf_dir, docs=docs).select("d1", "d2")
    j = exact.withColumn("in_e", F.lit(1)).join(
        lsh.withColumn("in_l", F.lit(1)), ["d1", "d2"], "full_outer"
    )
    agg = j.agg(
        F.sum(F.coalesce("in_e", F.lit(0))).cast("long").alias("n_exact"),
        F.sum(F.coalesce("in_l", F.lit(0))).cast("long").alias("n_lsh"),
        F.sum(
            F.when(
                F.col("in_e").isNotNull() & F.col("in_l").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_common"),
    )
    return agg.select(
        "n_exact",
        "n_lsh",
        "n_common",
        F.round(F.col("n_common") * 1.0 / F.col("n_exact"), 6).alias(
            "recall"
        ),
        F.round(F.col("n_common") * 1.0 / F.col("n_lsh"), 6).alias(
            "precision"
        ),
    )


QUERIES = {
    "lsh_recall_report": lsh_recall_report,
    "mirror_hosts": mirror_hosts,
    "exact_dedup_docs": exact_dedup_docs,
    # ngram_jaccard_pairs is deliberately NOT registered (round-4):
    # its Σdf²-bounded exact pair join is the one plan here that should
    # not run at 100 TB.  It stays a library function — the oracle
    # baseline pytest + lsh_recall_report's exact CTE still exercise it
    # (its ORACLE_SQL entry below is interpolated there) — but the
    # registry a user would run is scale-safe by inspection.
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_neardup": minhash_lsh_neardup,
    "simhash_buckets": simhash_buckets,
    "neardup_components": neardup_components,
    "neardup_components_lsh": neardup_components_lsh,
    "neardup_components_star": neardup_components_star,
    "incremental_dedup": incremental_dedup,
    "leakage_safe_split": leakage_safe_split,
    "cluster_canonical_docs": cluster_canonical_docs,
}

def _sql_sh_from(src: str) -> str:
    """Shingle CTE body over any (doc_id, text) relation."""
    return f"""
  SELECT doc_id,
         CASE WHEN len(string_split(lower(text), ' ')) >= 3
              THEN list_distinct(list_transform(
                     generate_series(1, len(string_split(lower(text),' '))-2),
                     i -> string_split(lower(text),' ')[i] || ' ' ||
                          string_split(lower(text),' ')[i+1] || ' ' ||
                          string_split(lower(text),' ')[i+2]))
              ELSE [] END AS shingles
  FROM {src}
"""


_SQL_SH = _sql_sh_from("documents")


def _sql_sig_banded(tag: str, ex: str) -> str:
    """CTE pair ``sig{tag}``/``band{tag}`` replaying minhash
    signatures + LSH banding over an exploded shingle index CTE
    ``{ex}`` (doc_id, s, n)."""
    return f"""
        hs{tag} AS (
            SELECT doc_id,
                   ('0x' || left(md5(s), 15))::BIGINT % {MH_MOD} AS h
            FROM {ex}
        ),
        sig{tag} AS (
            SELECT doc_id,
            {",".join(
                f"min(({MH_A[i]} * h + {MH_B[i]}) % {MH_MOD}) AS mh{i}"
                for i in range(N_MINHASH)
            )}
            FROM hs{tag} GROUP BY doc_id
        ),
        band{tag} AS (
            {" UNION ALL ".join(
                f'''SELECT doc_id, {bnd} AS band,
                    mh{2*bnd}::VARCHAR || ':' || mh{2*bnd+1}::VARCHAR AS bucket
                    FROM sig{tag}'''
                for bnd in range(LSH_BANDS)
            )}
        )"""

# shared CTE chain producing the LSH candidate pairs with exact
# intersection counts (ends at `pairs`); used by both the lsh pair
# oracle and the lsh-edge components oracle
_SQL_LSH_PAIR_CTES = f"""sh AS ({_SQL_SH}),
        ex AS (
            SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n
            FROM sh WHERE len(shingles) > 0
        ),
        hs AS (
            SELECT doc_id,
                   ('0x' || left(md5(s), 15))::BIGINT % {MH_MOD} AS h
            FROM ex
        ),
        sig AS (
            SELECT doc_id,
            {",".join(
                f"min(({MH_A[i]} * h + {MH_B[i]}) % {MH_MOD}) AS mh{i}"
                for i in range(N_MINHASH)
            )}
            FROM hs GROUP BY doc_id
        ),
        banded AS (
            {" UNION ALL ".join(
                f'''SELECT doc_id, {bnd} AS band,
                    mh{2*bnd}::VARCHAR || ':' || mh{2*bnd+1}::VARCHAR AS bucket
                    FROM sig'''
                for bnd in range(LSH_BANDS)
            )}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                         AND a.doc_id < b.doc_id
        ),
        pairs AS (
            SELECT d1, d2, count(*) AS inter,
                   max(ea.n) AS n1, max(eb.n) AS n2
            FROM cand
            JOIN ex ea ON cand.d1 = ea.doc_id
            JOIN ex eb ON cand.d2 = eb.doc_id AND ea.s = eb.s
            GROUP BY 1, 2
        )"""

ORACLE_SQL = {
    "mirror_hosts": _MIRROR_ORACLE,
    # deterministic replay of split + injection + cross-side banding +
    # exact verification (same arithmetic as the Spark plan)
    "incremental_dedup": f"""
        WITH hist AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id % {INC_NEW_MOD} != {INC_NEW_MOD - 1}
        ),
        newb AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id % {INC_NEW_MOD} = {INC_NEW_MOD - 1}
            UNION ALL
            SELECT doc_id + {INC_COPY_OFFSET} AS doc_id, text FROM hist
            WHERE doc_id % {INC_COPY_MOD} = 0
        ),
        shn AS ({_sql_sh_from("newb")}),
        shh AS ({_sql_sh_from("hist")}),
        exn AS (
            SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n
            FROM shn WHERE len(shingles) > 0
        ),
        exh AS (
            SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n
            FROM shh WHERE len(shingles) > 0
        ),
        {_sql_sig_banded("n", "exn")},
        {_sql_sig_banded("h", "exh")},
        cand AS (
            SELECT DISTINCT bn.doc_id AS d_new, bh.doc_id AS d_hist
            FROM bandn bn
            JOIN bandh bh ON bn.band = bh.band AND bn.bucket = bh.bucket
        ),
        pairs AS (
            SELECT d_new, d_hist, count(*) AS inter,
                   max(en.n) AS n1, max(eh.n) AS n2
            FROM cand
            JOIN exn en ON cand.d_new = en.doc_id
            JOIN exh eh ON cand.d_hist = eh.doc_id AND en.s = eh.s
            GROUP BY 1, 2
        ),
        near AS (
            SELECT DISTINCT d_new FROM pairs
            WHERE inter * 1.0 / (n1 + n2 - inter) >= 0.8
        ),
        hh AS (SELECT DISTINCT md5(text) AS h FROM hist)
        SELECT n.doc_id,
               (hh.h IS NOT NULL) AS dup_exact,
               (near.d_new IS NOT NULL) AS dup_near,
               NOT (hh.h IS NOT NULL OR near.d_new IS NOT NULL) AS keep
        FROM newb n
        LEFT JOIN hh ON md5(n.text) = hh.h
        LEFT JOIN near ON n.doc_id = near.d_new
    """,
    "exact_dedup_docs": """
        SELECT md5(text) AS content_md5,
               min(doc_id) AS keeper_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "ngram_jaccard_pairs": f"""
        WITH sh AS ({_SQL_SH}),
        ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
        pairs AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter,
                   max(a.n) AS n1, max(b.n) AS n2
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT d1, d2,
               round(inter * 1.0 / (n1 + n2 - inter), 6) AS jaccard
        FROM pairs WHERE inter * 1.0 / (n1 + n2 - inter) >= 0.8
    """,
    "minhash_signatures": f"""
        WITH sh AS ({_SQL_SH}),
        hs AS (
            SELECT doc_id,
                   list_transform(shingles,
                       s -> ('0x' || left(md5(s), 15))::BIGINT
                            % {MH_MOD}) AS h
            FROM sh
        )
        SELECT doc_id,
        {",".join(
            f'''coalesce(list_min(list_transform(h,
                x -> ({MH_A[i]} * x + {MH_B[i]}) % {MH_MOD})), -1) AS mh{i}'''
            for i in range(N_MINHASH)
        )}
        FROM hs
    """,
    # Deterministic replay of the banding + verification: the LSH pair
    # set is a pure function of the corpus (md5 family, fixed bands),
    # so "approximate recall" does NOT preclude an exact oracle.
    "minhash_lsh_neardup": f"""
        WITH {_SQL_LSH_PAIR_CTES}
        SELECT d1, d2,
               round(inter * 1.0 / (n1 + n2 - inter), 6) AS jaccard
        FROM pairs WHERE inter * 1.0 / (n1 + n2 - inter) >= 0.8
    """,
    # Ground truth for the component labels: transitive closure via a
    # recursive CTE (UNION dedups -> terminates), then min reachable
    # doc_id per source.  Closure size is sum(cluster^2) — fine at
    # oracle scale; the Spark side is the one that must scale.
    "neardup_components": f"""
        WITH RECURSIVE sh AS ({_SQL_SH}),
        ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
        pairs AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter,
                   max(a.n) AS n1, max(b.n) AS n2
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        edges AS (
            SELECT d1, d2 FROM pairs
            WHERE inter * 1.0 / (n1 + n2 - inter) >= 0.8
        ),
        sym AS (
            SELECT d1, d2 FROM edges
            UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges
        ),
        reach(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, s.d2 FROM reach r JOIN sym s ON r.dst = s.d1
        )
        SELECT src AS doc_id, min(dst) AS component_id,
               (src = min(dst)) AS is_keeper
        FROM reach GROUP BY src
    """,
    # Star-contraction components over the SAME LSH edge replay: the
    # algorithm must produce identical labels to the propagation loop,
    # so the ground truth is the same recursive closure.
    "neardup_components_star": f"""
        WITH RECURSIVE {_SQL_LSH_PAIR_CTES},
        edges AS (
            SELECT d1, d2 FROM pairs
            WHERE inter * 1.0 / (n1 + n2 - inter) >= 0.8
        ),
        sym AS (
            SELECT d1, d2 FROM edges
            UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges
        ),
        reach(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, s.d2 FROM reach r JOIN sym s ON r.dst = s.d1
        )
        SELECT src AS doc_id, min(dst) AS component_id,
               (src = min(dst)) AS is_keeper
        FROM reach GROUP BY src
    """,
    # Same closure, but the edge set is the deterministic LSH replay —
    # ground truth for the composed bucketed cluster-dedup path.
    "neardup_components_lsh": f"""
        WITH RECURSIVE {_SQL_LSH_PAIR_CTES},
        edges AS (
            SELECT d1, d2 FROM pairs
            WHERE inter * 1.0 / (n1 + n2 - inter) >= 0.8
        ),
        sym AS (
            SELECT d1, d2 FROM edges
            UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges
        ),
        reach(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, s.d2 FROM reach r JOIN sym s ON r.dst = s.d1
        )
        SELECT src AS doc_id, min(dst) AS component_id,
               (src = min(dst)) AS is_keeper
        FROM reach GROUP BY src
    """,
    # Same LSH-replay closure; the split is pure arithmetic on the
    # component label (md5 bucket 0 of SPLIT_DEN -> validation).
    "leakage_safe_split": f"""
        WITH RECURSIVE {_SQL_LSH_PAIR_CTES},
        edges AS (
            SELECT d1, d2 FROM pairs
            WHERE inter * 1.0 / (n1 + n2 - inter) >= 0.8
        ),
        sym AS (
            SELECT d1, d2 FROM edges
            UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges
        ),
        reach(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, s.d2 FROM reach r JOIN sym s ON r.dst = s.d1
        ),
        comp AS (
            SELECT src AS doc_id, min(dst) AS component_id
            FROM reach GROUP BY src
        )
        SELECT doc_id, component_id,
               CASE WHEN ('0x' || left(md5(component_id::VARCHAR), 15))
                        ::BIGINT % {SPLIT_DEN} = 0
                    THEN 'val' ELSE 'train' END AS split
        FROM comp
    """,
    # Same LSH closure, best-quality member kept per component; the
    # quality expression is textstats' quality_score verbatim (its own
    # oracle is green), so equality certifies the keep policy.
    "cluster_canonical_docs": f"""
        WITH RECURSIVE {_SQL_LSH_PAIR_CTES},
        edges AS (
            SELECT d1, d2 FROM pairs
            WHERE inter * 1.0 / (n1 + n2 - inter) >= 0.8
        ),
        sym AS (
            SELECT d1, d2 FROM edges
            UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges
        ),
        reach(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, s.d2 FROM reach r JOIN sym s ON r.dst = s.d1
        ),
        comp AS (
            SELECT src AS doc_id, min(dst) AS component_id
            FROM reach GROUP BY src
        ),
        q AS (
            SELECT doc_id,
                   round(least(len({_TX_SQL_TOKENS}) / 100.0, 1.0)
                         * (len(list_distinct({_TX_SQL_TOKENS})) * 1.0
                            / len({_TX_SQL_TOKENS})), 6) AS quality
            FROM documents
        )
        SELECT c.doc_id, c.component_id, q.quality,
               (row_number() OVER (
                    PARTITION BY c.component_id
                    ORDER BY q.quality DESC, c.doc_id
                ) = 1) AS keep
        FROM comp c JOIN q ON q.doc_id = c.doc_id
        ORDER BY c.doc_id
    """,
    "simhash_buckets": f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_distinct(string_split(lower(text), ' ')))
                       AS tok
            FROM documents
        ),
        h AS (
            SELECT doc_id, ('0x' || left(md5(tok), 15))::BIGINT AS h
            FROM toks
        ),
        bits AS (
            SELECT doc_id,
            {", ".join(
                f"sum(((h >> {j}) & 1) * 2 - 1) AS b{j}" for j in range(16)
            )}
            FROM h GROUP BY doc_id
        ),
        sim AS (
            SELECT doc_id,
            ({" + ".join(
                f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END"
                for j in range(16)
            )}) AS simhash
            FROM bits
        )
        SELECT simhash, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
        FROM sim GROUP BY 1 HAVING count(*) > 1
    """,
}


# composed sketch-quality report: both pair oracles verbatim as CTEs
# + a full outer join; integer counts + two single-division ratios
ORACLE_SQL["lsh_recall_report"] = f"""
    WITH ex AS ({ORACLE_SQL["ngram_jaccard_pairs"]}),
    ls AS ({ORACLE_SQL["minhash_lsh_neardup"]}),
    flags AS (
        SELECT CASE WHEN ex.d1 IS NOT NULL THEN 1 ELSE 0 END AS in_e,
               CASE WHEN ls.d1 IS NOT NULL THEN 1 ELSE 0 END AS in_l
        FROM ex FULL OUTER JOIN ls
          ON ex.d1 = ls.d1 AND ex.d2 = ls.d2
    )
    SELECT CAST(sum(in_e) AS BIGINT) AS n_exact,
           CAST(sum(in_l) AS BIGINT) AS n_lsh,
           CAST(sum(in_e * in_l) AS BIGINT) AS n_common,
           round(CAST(sum(in_e * in_l) AS BIGINT) * 1.0
                 / CAST(sum(in_e) AS BIGINT), 6) AS recall,
           round(CAST(sum(in_e * in_l) AS BIGINT) * 1.0
                 / CAST(sum(in_l) AS BIGINT), 6) AS "precision"
    FROM flags
"""
