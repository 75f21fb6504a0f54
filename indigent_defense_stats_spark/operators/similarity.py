"""Similarity search over the ``embeddings`` table (training-data layer).

- :func:`ann_topk_cosine` — brute-force cosine top-k, the exactness
  baseline.  The dot product is an index-ordered fold in double on
  both engines, so Spark and DuckDB agree bit-for-bit (verified).
- :func:`embedding_neardup_pairs` — all pairs above a cosine
  threshold (embedding near-dup dedup).  Exact; oracle-checked.
- :func:`ann_topk_lsh` — the scale path: random-hyperplane LSH
  bucketing via an Arrow-vectorized numpy matmul (one pandas_udf),
  probe restricted to the query's bucket + Hamming-1 neighbors.
  Approximate recall -> registered rows-only; recall measured in
  pytest against the brute-force baseline.

Scale notes: brute force is one scan (linear, embarrassingly
parallel) — right up to the point the *query set* is large; the LSH
variant buckets both sides so each query probes O(corpus/2^bits).
The pairs query is quadratic and exists as the small-corpus oracle
baseline; at 100 TB one uses the LSH buckets for pairing too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

COSINE_PAIR_THRESHOLD = 0.30
TOP_K = 10
LSH_BITS = 6


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a: Column, b: Column) -> Column:
    """Index-ordered fold in double — bit-identical across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    return [
        float(x)
        for x in _emb(spark, sf_dir).filter("vec_id = 0").collect()[0]["embedding"]
    ]


def _cosine_topk(cand, q: list[float]):
    """Shared scoring tail: cosine to query q, round 6, deterministic
    top-k (desc cosine, asc vec_id)."""
    qcol = F.array(*[F.lit(x) for x in q]).cast("array<double>")
    qv = np.asarray(q, dtype=np.float64)
    qn = float(np.sqrt(qv @ qv))
    cos = _dot(F.col("embedding"), qcol) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) * F.lit(qn)
    )
    return (
        cand.select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by cosine to the vec_id=0 embedding (self included)."""
    q = _query_vector(spark, sf_dir)
    return _cosine_topk(_emb(spark, sf_dir), q)


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (i<j) pairs with cosine >= threshold — embedding near-dup."""
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    e = e.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a = e.select(
        F.col("vec_id").alias("id1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    )
    b = e.select(
        F.col("vec_id").alias("id2"), F.col("v").alias("v2"), F.col("nrm").alias("n2")
    )
    pairs = a.join(b, F.col("id1") < F.col("id2"))
    cos = _dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    return pairs.select(
        "id1", "id2", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine") >= COSINE_PAIR_THRESHOLD)


def _planes(dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (seeded, no wall-clock)."""
    rng = np.random.RandomState(42)
    return rng.standard_normal((LSH_BITS, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int):
    planes = _planes(dim)

    @pandas_udf("int")
    def bucketize(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.map(lambda v: np.asarray(v, dtype=np.float64)))
        signs = (m @ planes.T) > 0  # one matmul per Arrow batch
        return pd.Series((signs @ (1 << np.arange(LSH_BITS))).astype(np.int32))

    return bucketize


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k for the vec_id=0 query: probe the
    query's bucket plus all Hamming-1 neighbor buckets."""
    q = _query_vector(spark, sf_dir)
    planes = _planes(len(q))
    qsig = int(
        ((np.asarray(q) @ planes.T) > 0) @ (1 << np.arange(LSH_BITS))
    )
    probe = [qsig] + [qsig ^ (1 << b) for b in range(LSH_BITS)]
    e = _emb(spark, sf_dir).withColumn(
        "bucket", lsh_bucket_udf(len(q))(F.col("embedding"))
    )
    cand = e.filter(F.col("bucket").isin(probe))
    return _cosine_topk(cand, q)


IVF_K = 16
IVF_NPROBE = 4
IVF_ITERS = 5


def _ivf_centroids(vectors: np.ndarray) -> np.ndarray:
    """Deterministic k-means (Lloyd, fixed iters) with farthest-point
    init (no RNG, no wall-clock).  First-k init fails when the sample
    leads with near-duplicates — every duplicate becomes its own seed
    and the cluster shatters across cells; farthest-point seeds spread
    over the data instead."""
    k = min(IVF_K, len(vectors))
    seeds = [0]
    d2min = ((vectors - vectors[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(d2min.argmax())
        seeds.append(nxt)
        d2min = np.minimum(d2min, ((vectors - vectors[nxt]) ** 2).sum(axis=1))
    cents = vectors[seeds].copy()
    for _ in range(IVF_ITERS):
        d2 = ((vectors[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = vectors[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def ivf_assign_udf(cents: np.ndarray):
    @pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.map(lambda v: np.asarray(v, dtype=np.float64)))
        # one (batch x k) distance matmul per Arrow batch
        d2 = (m * m).sum(1)[:, None] - 2 * (m @ cents.T) + (cents * cents).sum(1)[None, :]
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return assign


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: k-means-partition the corpus (centroids
    trained on a deterministic driver-side sample), probe the nprobe
    centroids closest to the query, brute-force cosine inside them.

    Scale shape: centroids are O(k x dim) — broadcast into the assign
    UDF's closure; assignment is one matmul per Arrow batch; the probe
    prunes the scan to ~nprobe/k of the corpus (partition the parquet
    by cluster_id to turn that into real partition pruning)."""
    e = _emb(spark, sf_dir)
    sample = (
        e.orderBy("vec_id")
        .limit(512)
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    cents = _ivf_centroids(vecs)
    q = _query_vector(spark, sf_dir)
    qv = np.asarray(q, dtype=np.float64)
    d2 = ((cents - qv[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in d2.argsort()[:IVF_NPROBE]]

    cand = e.withColumn(
        "cluster_id", ivf_assign_udf(cents)(F.col("embedding"))
    ).filter(F.col("cluster_id").isin(probe))
    return _cosine_topk(cand, q)


QUERIES = {
    "ann_topk_cosine": ann_topk_cosine,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "ann_topk_lsh": ann_topk_lsh,  # rows-only (approximate recall)
    "ann_topk_ivf": ann_topk_ivf,  # rows-only (approximate recall)
}

_SQL_COS_Q = """
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
"""

ORACLE_SQL = {
    "ann_topk_cosine": f"""
        {_SQL_COS_Q}
        SELECT vec_id,
               round(list_dot_product(embedding::DOUBLE[], (SELECT e FROM q))
                     / (sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[]))
                        * sqrt(list_dot_product((SELECT e FROM q),
                                                (SELECT e FROM q)))),
                     6) AS cosine
        FROM embeddings
        ORDER BY cosine DESC, vec_id ASC LIMIT {TOP_K}
    """,
    "embedding_neardup_pairs": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])) AS nrm
            FROM embeddings
        )
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
                   AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
              >= {COSINE_PAIR_THRESHOLD}
    """,
}
