"""SQL surface: register the engine's tables as temp views and run
ANSI SQL through ``spark.sql``.

The engine is DataFrame-first (Catalyst sees the same plans either
way), but a reference user coming from SQL gets the identical
capabilities via views — and the driver-contract entry
``sql_q1_pricing_summary`` proves the SQL path end-to-end: the exact
SQL string Spark executes is also the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# One ANSI-SQL text, executed verbatim by BOTH Spark and DuckDB
# (alias discipline per the driver contract).
Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                         AS sum_qty,
           round(sum(l_extendedprice), 2)                    AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 2)                         AS avg_qty,
           count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create (or replace) one temp view per parquet table present."""
    import os

    created = []
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
            created.append(t)
    return created


def sql_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 through the ``spark.sql`` path over registered views — same
    Catalyst plan as the DataFrame build, same SQL text as the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(Q1_SQL)


QUERIES = {
    "sql_q1_pricing_summary": sql_q1_pricing_summary,
}

ORACLE_SQL = {
    "sql_q1_pricing_summary": Q1_SQL,
}
