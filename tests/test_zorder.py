"""Z-order layout (sources/zorder.py): Morton round-trip, rectangle
correctness vs brute-force, and partition pruning on BOTH dimensions
from the executed plan.  Exact cross-engine bit arithmetic is covered
by scripts/check_oracles.py (zorder_cells)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from indigent_defense_stats_spark.sources import zorder

SF_DIR = "/root/testdata/sf0.001"


def test_morton_round_trip(spark):
    """De-interleaving z must recover (x, y) for every document."""
    for r in zorder.zorder_cells(spark, SF_DIR).collect():
        x = sum((((r["z"] >> (2 * i)) & 1) << i) for i in range(zorder.Z_BITS))
        y = sum(
            (((r["z"] >> (2 * i + 1)) & 1) << i) for i in range(zorder.Z_BITS)
        )
        assert (x, y) == (r["x"], r["y"]), r


def test_zcells_cover_grid_exactly():
    """Cell enumeration partitions the full grid and shrinks with the
    rectangle: a 2-wide x-slab hits exactly 1/8 of the 64 cells."""
    assert zorder.zcells_for() == list(range(64))
    slab = zorder.zcells_for(x_range=(0, 1))
    assert len(slab) == 8
    slab_y = zorder.zcells_for(y_range=(4, 7))
    assert len(slab_y) == 16


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "docs_z")
    zorder.write_zorder_layout(spark, SF_DIR, path)
    return path


def _brute(spark, x_range, y_range):
    d = zorder.zorder_cells(spark, SF_DIR)
    if x_range:
        d = d.filter(F.col("x").between(*x_range))
    if y_range:
        d = d.filter(F.col("y").between(*y_range))
    return sorted(r["doc_id"] for r in d.collect())


@pytest.mark.parametrize(
    "x_range,y_range",
    [((0, 3), None), (None, (8, 11)), ((2, 5), (1, 2))],
    ids=["x-only", "y-only", "rectangle"],
)
def test_zorder_prunes_and_matches(spark, layout, x_range, y_range):
    """Every rectangle query — including one constrained ONLY on the
    second dimension, the case a linear sort cannot prune — must (a)
    return exactly the brute-force filter result and (b) reach the
    scan as a zcell PARTITION filter."""
    res = zorder.read_zorder(spark, layout, x_range, y_range)
    assert sorted(r["doc_id"] for r in res.collect()) == _brute(
        spark, x_range, y_range
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    parts = plan.split("PartitionFilters: [", 1)
    assert len(parts) == 2, plan
    assert "zcell" in parts[1].split("]", 1)[0], plan
    # the cell set is a strict subset of the 64 directories
    assert len(zorder.zcells_for(x_range, y_range)) < 64
