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

from .textstats import md5_int

JACCARD_THRESHOLD = 0.8
N_MINHASH = 8
LSH_BANDS = 4  # x 2 rows/band


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingles() -> Column:
    """Distinct word 3-gram shingles, document order irrelevant.

    Built from three ``slice``s zipped together rather than
    ``element_at(split(..), i)`` inside a ``transform`` lambda: higher-
    order functions are interpreted (no whole-stage codegen), so an
    outer-column reference inside the lambda re-evaluates the ``split``
    once *per element* — O(tokens^2) per document.  With slices the
    split is evaluated O(1) times per row (measured 9x faster at sf0.1).
    """
    t = F.split(F.lower(F.col("text")), " ")
    n = F.size(t)
    s1 = F.slice(t, 1, n - 2)
    s2 = F.slice(t, 2, n - 2)
    s3 = F.slice(t, 3, n - 2)
    sep = F.lit(" ")
    grams = F.zip_with(
        F.zip_with(s1, s2, lambda a, b: F.concat(a, sep, b)),
        s3,
        lambda ab, c: F.concat(ab, sep, c),
    )
    return F.when(n >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
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
    return (
        _docs(spark, sf_dir)
        .select("doc_id", _shingles().alias("sh"))
        .select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard>=t near-dup pairs via inverted-index self-join."""
    ex = _shingle_index(spark, sf_dir)
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("a.n").alias("n1"),
            F.max("b.n").alias("n2"),
        )
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
        _docs(spark, sf_dir)
        .select("doc_id", F.explode_outer(_shingles()).alias("sh"))
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


def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed candidates (4 bands x 2 rows) -> exact-Jaccard
    verification at t=0.8.  Precision 1.0 by construction; recall
    1-(1-t^2)^4 ~ 0.983 at the threshold (tested vs the exact pairs)."""
    # the shingle CONSTRUCTION (interpreted HOF zip_with chain) feeds
    # both the signature aggregate and the two verification sides —
    # localCheckpoint materializes the compact per-doc array form once
    # (checkpointing the exploded index instead was measured slower:
    # materializing millions of exploded rows costs more than two cheap
    # re-explodes; at scale signatures/shingles are materialized tables)
    arr = (
        _docs(spark, sf_dir)
        .select("doc_id", _shingles().alias("sh"))
        .localCheckpoint(eager=False)
    )
    ex = arr.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    # one pass over the signatures -> (band, bucket) rows via a single
    # explode (a per-band union would recompute the signature aggregate
    # once per band per join side)
    sig = _signatures_from_index(ex)
    banded = sig.select(
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


def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact near-dup pair graph
    (``ngram_jaccard_pairs`` at t=0.8): every document labeled with
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
    """
    edges = ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
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


QUERIES = {
    "exact_dedup_docs": exact_dedup_docs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_neardup": minhash_lsh_neardup,
    "simhash_buckets": simhash_buckets,
    "neardup_components": neardup_components,
}

_SQL_SH = """
  SELECT doc_id,
         CASE WHEN len(string_split(lower(text), ' ')) >= 3
              THEN list_distinct(list_transform(
                     generate_series(1, len(string_split(lower(text),' '))-2),
                     i -> string_split(lower(text),' ')[i] || ' ' ||
                          string_split(lower(text),' ')[i+1] || ' ' ||
                          string_split(lower(text),' ')[i+2]))
              ELSE [] END AS shingles
  FROM documents
"""

ORACLE_SQL = {
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
        WITH sh AS ({_SQL_SH}),
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
        )
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
