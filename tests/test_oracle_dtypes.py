"""Structural guard against the oracle-dtype hazard class.

Three driver hash mismatches across two rounds (dismissed_count_analog
r1, pack_sequences r2, and the session_windows epoch-rounding latent)
were all DuckDB-vs-Spark dtype/semantics drift in the ORACLE SQL, not
Spark bugs.  The dominant class: DuckDB widens integer aggregates —
``sum()`` over INTEGER/BIGINT returns HUGEINT (int128), window sums
too — while Spark returns BIGINT, and the driver's value-hash
canonicalizer sees different dtypes.

This test makes the class structurally extinct: it plans EVERY
registered oracle against DuckDB and asserts no result column (top
level or nested inside LIST/STRUCT) has a type Spark cannot produce:
HUGEINT, UHUGEINT, or DECIMAL beyond Spark's precision-38 ceiling.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

_DECIMAL_RE = re.compile(r"DECIMAL\((\d+)\s*,")


def _forbidden(type_str: str) -> str | None:
    t = type_str.upper()
    if "UHUGEINT" in t:
        return "UHUGEINT"
    if "HUGEINT" in t:
        return "HUGEINT"
    for m in _DECIMAL_RE.finditer(t):
        if int(m.group(1)) > 38:
            return f"DECIMAL({m.group(1)},...) exceeds Spark's 38"
    return None


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


@pytest.fixture(scope="module")
def oracles():
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
    import __spark_entry__ as e

    return e.oracle_sql()


def test_no_oracle_column_exceeds_spark_dtypes(con, oracles):
    assert oracles, "oracle registry is empty"
    bad: list[str] = []
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)  # plans only — no execution
        for col, typ in zip(rel.columns, rel.types):
            why = _forbidden(str(typ))
            if why:
                bad.append(f"{name}.{col}: {typ} ({why})")
    assert not bad, (
        "oracle columns with dtypes Spark cannot hash-match "
        "(cast them in the oracle SQL):\n  " + "\n  ".join(bad)
    )
