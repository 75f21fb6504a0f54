"""Deterministic global row indexing + size-balanced output sharding.

At 100 TB the naive way to number rows globally — ``row_number()``
over an unpartitioned window — is a single-task global sort: the one
plan shape that can NEVER scale.  The classic distributed form (the
RDD ``zipWithIndex`` idiom, re-expressed on DataFrames) is:

1. range-partition + sort within partitions by a UNIQUE order key
   (the only corpus-sized shuffle);
2. per-partition row counts -> a bounded O(#partitions) driver
   collect -> cumulative offsets;
3. global index = partition offset + local position.

The result depends only on the total order of the key — NOT on where
the (sampled) range boundaries fall — so the output is deterministic
even though ``repartitionByRange`` samples its boundaries.  The
sorted+numbered table is ``localCheckpoint``-ed BEFORE the count
collect so the offset job and every downstream consumer read the SAME
materialization (a re-sample between two actions would silently
mis-offset; the pin makes that impossible).

Local position comes from ``monotonically_increasing_id``'s documented
layout (partition id in the upper bits, a consecutive per-partition
record number in the lower 33); ``test_sharding.py`` pins both the
decomposition against ``spark_partition_id()`` and the end result
against a ``row_number()`` oracle.

On top of the index:

- ``balanced_shards`` — the driver-graded query: assign orders rows
  (ordered by the unique o_orderkey) to fixed-size shards of
  ``ROWS_PER_SHARD`` and report per-shard row counts, key ranges, and
  an exact integer checksum.  (lineitem is NOT used: this testdata's
  (l_orderkey, l_linenumber) is not a unique key, and a non-unique
  order key makes any global index nondeterministic.)  Every shard but the last is
  exactly full — the property that keeps downstream training jobs
  (sequence packing, shard-per-worker data loading) free of straggler
  tasks.
- ``write_balanced`` — materialize those shards as one parquet file
  each (repartition on the shard id, then ``partitionBy`` so each
  shard group lands in exactly one file).  At 100 TB balanced file
  sizes are what keep the NEXT job's scan tasks uniform.

Reference analog: the scraper writes one JSON file per case in
arrival order (reference src/scraper/__init__.py case loop); this is
that sink generalized to a deterministic, evenly-cut global order.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

ROWS_PER_SHARD = 1024
_LOW33 = (1 << 33) - 1


def global_index(
    df: DataFrame, order_cols: Sequence[str], index_col: str = "idx"
) -> DataFrame:
    """Add a 0-based BIGINT global index in ``order_cols`` order
    without a single-partition sort.  ``order_cols`` must be a unique
    key (ties would make the index nondeterministic; the oracle and
    tests use unique keys only)."""
    cols = [F.col(c) for c in order_cols]
    numbered = (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id().cast("long"))
        # pin: the offset job and every consumer must see the SAME
        # range-sample; without this a second action re-samples
        # boundaries and the offsets no longer match the data
        .localCheckpoint(eager=False)
    )
    counts = numbered.groupBy("_pid").count().collect()  # O(#partitions)
    off, offsets = 0, []
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((int(r["_pid"]), off))
        off += int(r["count"])
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid long, _off long")
    return (
        numbered.join(F.broadcast(off_df), "_pid")
        .withColumn(
            index_col, F.col("_off") + (F.col("_mid").bitwiseAND(F.lit(_LOW33)))
        )
        .drop("_mid", "_pid", "_off")
    )


def balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size shard layout over orders in o_orderkey order (the
    table's unique key — a non-unique order key would make any global
    index nondeterministic): per shard the row count, the key range it
    covers, and sum(idx * o_custkey) as an exact integer checksum of
    the assignment (any mis-indexed row changes it)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    idx = global_index(o, ["o_orderkey"])
    return (
        # integer DIV, not float division: exact at any row count
        idx.withColumn("shard_id", F.expr(f"idx DIV {ROWS_PER_SHARD}"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
            F.sum(F.col("idx") * F.col("o_custkey")).alias("checksum"),
        )
        .orderBy("shard_id")
    )


def write_balanced(
    df: DataFrame,
    path: str,
    order_cols: Sequence[str],
    rows_per_file: int = ROWS_PER_SHARD,
) -> int:
    """Write ``df`` as parquet with exactly ceil(n/rows_per_file)
    equal-size files (last file takes the remainder): global index ->
    contiguous file id -> one shuffle keyed by file id ->
    ``partitionBy`` so each file group is written by exactly one task.
    Returns the number of files written."""
    idx = global_index(df, order_cols)
    filed = idx.withColumn("_file", F.expr(f"idx DIV {int(rows_per_file)}"))
    n = filed.count()
    n_files = (n + rows_per_file - 1) // rows_per_file
    (
        filed.repartition(max(1, min(int(n_files), 1024)), "_file")
        .write.mode("overwrite")
        .partitionBy("_file")
        .parquet(path)
    )
    return int(n_files)


_ORACLE = f"""
    WITH r AS (
        SELECT o_orderkey, o_custkey,
               row_number() OVER (ORDER BY o_orderkey) - 1 AS idx
        FROM orders
    )
    SELECT CAST(idx // {ROWS_PER_SHARD} AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS first_orderkey,
           CAST(max(o_orderkey) AS BIGINT) AS last_orderkey,
           CAST(sum(idx * o_custkey) AS BIGINT) AS checksum
    FROM r
    GROUP BY 1
    ORDER BY shard_id
"""

QUERIES = {"balanced_shards": balanced_shards}
ORACLE_SQL = {"balanced_shards": _ORACLE}
