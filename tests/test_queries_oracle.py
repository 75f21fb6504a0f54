"""Driver-contract smoke: entry() runs; sampled queries match DuckDB.

The full oracle sweep is scripts/check_oracles.py (and the external
driver at sf0.01); this keeps a fast representative subset in pytest.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
SAMPLE = [
    "q1_pricing_summary",
    "region_revenue",
    "event_sequence",
    "top_charge_argmin_analog",
    "customers_without_big_orders",
    "stats_orders",
    "priority_severity_rollup",
    "part_type_class",
    "doc_motion_flags",
    "stride5_chunks",
    "user_events_reversed",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/lineitem.parquet"), reason="testdata missing"
)


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns


def test_every_query_has_callable_and_most_have_oracles():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(osql) <= set(qs)
    # the vast majority must be oracle-checked
    assert len(osql) >= 0.7 * len(qs)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_duckdb(spark, ddb, name):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(osql[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _canon(srows, scols) == _canon(drows, dcols)
