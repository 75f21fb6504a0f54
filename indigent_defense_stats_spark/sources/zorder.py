"""Z-order (Morton-curve) clustering layout for multi-dimensional
file skipping — the Delta ``OPTIMIZE ZORDER BY`` / Iceberg
``rewrite_data_files(strategy => 'sort', sort_order => zorder(..))``
analog, built on plain parquet partitioning.

Why: a layout sorted linearly on ONE column prunes range predicates on
that column only — a predicate on the second column still scans every
file.  Interleaving the bits of both dimensions into one Morton code
gives every file a small rectangle of (x, y) space, so range
predicates on EITHER dimension map to a bounded set of z-cells and
prune files.  At 100 TB this is the difference between scanning a few
partitions and scanning the table for the second-dimension access
path (the crawl analog: case tables queried both by filing date and
by county — reference queries filter each independently,
SURVEY.md §2 S1/S7).

Pieces:

- :func:`zorder_cells` — the oracle-checked query: per document the
  quantized 4-bit dimensions (``x`` = length bucket, ``y`` = id
  bucket) and their 8-bit Morton interleave ``z``; pure JVM bit
  arithmetic (``shiftleft``/``shiftright``/``&``), replayed exactly
  by DuckDB's bit operators.
- :func:`write_zorder_layout` — materializes ``partitionBy(zcell)``
  (``zcell = z >> 2``: 64 directories, each a 2x2 rectangle of
  quantized space).
- :func:`zcells_for` / :func:`read_zorder` — query-side cell
  enumeration: a rectangle predicate becomes ``zcell IN (...)``,
  which Spark turns into a PARTITION filter (directory pruning —
  pytest asserts it from the executed plan), followed by the exact
  residual predicate.  Cell enumeration here scans the 16x16
  quantized grid on the driver (256 iterations, constant); the
  production form for deep codes is the BIGMIN/LITMAX successor
  computation (Tropf & Herzog 1981), which needs no enumeration.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

Z_BITS = 4  # bits per dimension -> 8-bit Morton code
X_SCALE = 64  # n_chars per x bucket
Y_MOD = 4096  # doc_id % Y_MOD // Y_SCALE -> 16 id buckets
Y_SCALE = 256
CELL_SHIFT = 2  # zcell = z >> 2 (64 directories)


def _morton(x: Column, y: Column) -> Column:
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    x = F.least(F.expr(f"n_chars div {X_SCALE}"), F.lit(15)).cast("long")
    y = F.expr(f"(doc_id % {Y_MOD}) div {Y_SCALE}").cast("long")
    return d.select("doc_id", x.alias("x"), y.alias("y"))


def zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x, y, z): quantized dimensions + Morton interleave."""
    return _dims(spark, sf_dir).select(
        "doc_id",
        "x",
        "y",
        _morton(F.col("x"), F.col("y")).alias("z"),
    )


def morton_py(x: int, y: int) -> int:
    return sum(
        (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
        for i in range(Z_BITS)
    )


def zcells_for(
    x_range: tuple[int, int] | None = None,
    y_range: tuple[int, int] | None = None,
) -> list[int]:
    """Distinct zcells intersecting the rectangle (inclusive bounds)."""
    xl, xh = x_range or (0, 15)
    yl, yh = y_range or (0, 15)
    return sorted(
        {
            morton_py(x, y) >> CELL_SHIFT
            for x in range(xl, xh + 1)
            for y in range(yl, yh + 1)
        }
    )


def write_zorder_layout(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Materialize documents partitioned by zcell (the OPTIMIZE step)."""
    (
        zorder_cells(spark, sf_dir)
        .join(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id"
        )
        .withColumn("zcell", F.shiftright(F.col("z"), CELL_SHIFT))
        .write.mode("overwrite")
        .partitionBy("zcell")
        .parquet(path)
    )


def read_zorder(
    spark: SparkSession,
    path: str,
    x_range: tuple[int, int] | None = None,
    y_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Rectangle query over the z-layout: zcell IN (qualifying cells)
    — a partition filter, so non-qualifying directories are never
    listed — plus the exact residual predicate."""
    d = spark.read.parquet(path)
    cells = zcells_for(x_range, y_range)
    d = d.filter(F.col("zcell").isin(cells))
    if x_range:
        d = d.filter(F.col("x").between(*x_range))
    if y_range:
        d = d.filter(F.col("y").between(*y_range))
    return d


QUERIES = {"zorder_cells": zorder_cells}

_Z_SQL = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(Z_BITS)
)

ORACLE_SQL = {
    "zorder_cells": f"""
        WITH dims AS (
            SELECT doc_id,
                   CAST(least(n_chars // {X_SCALE}, 15) AS BIGINT) AS x,
                   CAST((doc_id % {Y_MOD}) // {Y_SCALE} AS BIGINT) AS y
            FROM documents
        )
        SELECT doc_id, x, y, CAST({_Z_SQL} AS BIGINT) AS z FROM dims
    """,
}
