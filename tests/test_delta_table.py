"""Unit tests for the merge-on-read DeltaTable (sources/catalog.py):
the frontier's O(wave) state store.  The frontier resume suite
exercises it end-to-end; these pin the store's own contract —
live-set algebra, footer-derived counts, compaction, rollback, gc —
independently of the crawl.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from indigent_defense_stats_spark.sources.catalog import DeltaTable

SCHEMA = StructType(
    [
        StructField("k", StringType(), True),
        StructField("v", IntegerType(), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


@pytest.fixture()
def table(spark, tmp_path):
    return DeltaTable(spark, str(tmp_path / "t"), SCHEMA, key="k")


def live(t):
    df = t.read()
    return sorted((r["k"], r["v"]) for r in df.collect()) if df is not None else []


def test_base_then_deltas_resolve_live_set(spark, table):
    table.write_base(_df(spark, [("a", 1), ("b", 2), ("c", 3)]), {"wave": -1})
    table.write_delta(
        _df(spark, [("d", 4)]), _keys(spark, ["a"]), {"wave": 0}, n_removes=1
    )
    table.write_delta(
        _df(spark, [("e", 5)]), _keys(spark, ["c", "d"]), {"wave": 1}, n_removes=2
    )
    assert live(table) == [("b", 2), ("e", 5)]
    assert table.live_rowcount() == 2
    assert table.removes_outstanding() == 3


def test_adds_only_and_removes_only_deltas(spark, table):
    table.write_base(_df(spark, [("a", 1)]), {"wave": -1})
    table.write_delta(_df(spark, [("b", 2)]), None, {"wave": 0}, n_removes=0)
    table.write_delta(None, _keys(spark, ["a"]), {"wave": 1}, n_removes=1)
    assert live(table) == [("b", 2)]
    assert table.adds_rowcount(2) == 1
    assert table.adds_rowcount(3) == 0


def test_compact_preserves_live_set_and_resets_counters(spark, table):
    table.write_base(_df(spark, [("a", 1), ("b", 2)]), {"wave": -1})
    table.write_delta(
        _df(spark, [("c", 3)]), _keys(spark, ["a"]), {"wave": 0}, n_removes=1
    )
    before = live(table)
    snap = table.compact({"wave": 0, "event": "compact"})
    assert table.manifest(snap)["kind"] == "base"
    assert live(table) == before
    assert table.removes_outstanding() == 0
    assert table.live_rowcount() == len(before)


def test_rollback_uncommitted_delta_restores_prewave_state(spark, table):
    table.write_base(_df(spark, [("a", 1)]), {"wave": -1})
    table.write_delta(
        _df(spark, [("b", 2)]), _keys(spark, ["a"]), {"wave": 0}, n_removes=1
    )
    committed = live(table)
    # wave 1 crashes before its commit marker: drop its snapshot
    table.write_delta(
        _df(spark, [("x", 9)]), _keys(spark, ["b"]), {"wave": 1}, n_removes=1
    )
    assert live(table) != committed
    table.drop_snapshots(lambda m: m.get("wave", -1) > 0)
    assert live(table) == committed


def test_rollback_uncommitted_compaction_falls_back(spark, table):
    table.write_base(_df(spark, [("a", 1), ("b", 2)]), {"wave": -1})
    table.write_delta(
        _df(spark, [("c", 3)]), _keys(spark, ["b"]), {"wave": 0}, n_removes=1
    )
    committed = live(table)
    table.compact({"wave": 1, "event": "compact"})  # wave 1 never commits
    table.drop_snapshots(lambda m: m.get("wave", -1) > 0)
    assert live(table) == committed


def test_gc_drops_only_pre_committed_base_snapshots(spark, table):
    table.write_base(_df(spark, [("a", 1)]), {"wave": -1})
    table.write_delta(
        _df(spark, [("b", 2)]), _keys(spark, ["a"]), {"wave": 0}, n_removes=1
    )
    table.compact({"wave": 0, "event": "compact"})
    before = live(table)
    n_before = len(table.snapshots())
    dropped = table.gc(committed_wave=0)
    assert dropped == 2  # seed base + wave-0 delta are unreachable
    assert len(table.snapshots()) == n_before - 2
    assert live(table) == before
    # a base tagged with an uncommitted wave is never a gc anchor
    table.write_delta(
        _df(spark, [("c", 3)]), None, {"wave": 1}, n_removes=0
    )
    table.compact({"wave": 1, "event": "compact"})
    assert table.gc(committed_wave=0) == 0


def test_extra_columns_on_adds_are_pruned_on_read(spark, table):
    import pyspark.sql.functions as F

    base = _df(spark, [("a", 1)]).withColumn("h1", F.lit(7))
    table.write_base(base, {"wave": -1})
    df = table.read()
    assert [f.name for f in df.schema.fields] == ["k", "v"]
    assert live(table) == [("a", 1)]
