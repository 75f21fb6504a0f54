#!/usr/bin/env python
"""Frontier-maintenance scaling evidence (VERDICT r1 item 3 'done'
criterion): a fixed-size wave over a 10x-larger frontier must cost
~the same, i.e. the state transition is O(wave), not O(frontier).

Round 1 stored the frontier as a copy-on-write snapshot — every wave
rewrote the whole pending set.  Round 2's merge-on-read DeltaTable
writes only the wave's adds + retired keys.  This bench isolates the
store: build a pending set of N rows, then run fixed-size delta waves
(W adds + W removes each) and time them, at N and 10N.

Usage: python scripts/bench_frontier_mor.py [--waves 6] [--wave-size 5000]
Writes BENCH/frontier_mor.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def frontier_rows(spark, start: int, n: int):
    """FRONTIER-shaped synthetic rows keyed by a dense id range."""
    import pyspark.sql.functions as F

    return spark.range(start, start + n).select(
        F.concat(F.lit("http://h"), (F.col("id") % 254).cast("string"),
                 F.lit(".example/c?id="), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("http://h"), (F.col("id") % 254).cast("string"),
                 F.lit(".example/c?id="), F.col("id").cast("string")
                 ).alias("canonical_url"),
        F.concat(F.lit("h"), (F.col("id") % 254).cast("string")).alias("host"),
        F.lit("county0").alias("county"),
        F.lit(0).alias("county_ord"),
        F.lit(3).alias("depth"),
        F.lit(2).alias("prio"),
        (F.col("id") % 90).cast("int").alias("date_ord"),
        (F.col("id") % 7).cast("int").alias("jo_ord"),
        (F.col("id") % 11).cast("int").alias("link_ord"),
        F.lit(None).cast("date").alias("case_date"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("wave"),
    )


def run_cell(spark, n_pending: int, waves: int, wave_size: int) -> dict:
    from indigent_defense_stats_spark import schemas
    from indigent_defense_stats_spark.sources.catalog import DeltaTable

    d = tempfile.mkdtemp(prefix=f"ids-mor-{n_pending}-")
    try:
        t = DeltaTable(spark, d, schemas.FRONTIER, key="canonical_url")
        t.write_base(
            frontier_rows(spark, 0, n_pending).coalesce(16), {"wave": -1}
        )
        next_id = n_pending
        walls = []
        for w in range(waves):
            t0 = time.time()
            adds = frontier_rows(spark, next_id, wave_size).coalesce(4)
            removes = frontier_rows(spark, w * wave_size, wave_size).select(
                "canonical_url"
            ).coalesce(1)
            t.write_delta(adds, removes, {"wave": w}, n_removes=wave_size)
            walls.append(time.time() - t0)
            next_id += wave_size
        # merge-on-read cost (reported, expected O(pending)): one full
        # pending materialization
        t0 = time.time()
        n_live = t.read().count()
        read_wall = time.time() - t0
        return {
            "n_pending": n_pending,
            "wave_size": wave_size,
            "wave_wall_median": round(statistics.median(walls), 3),
            "wave_walls": [round(x, 3) for x in walls],
            "read_wall": round(read_wall, 3),
            "n_live": n_live,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=6)
    ap.add_argument("--wave-size", type=int, default=5000)
    ap.add_argument(
        "--sizes",
        type=int,
        nargs="+",
        default=[100_000, 1_000_000, 10_000_000],
        help="pending-set sizes; each decade the wave latency must stay flat",
    )
    args = ap.parse_args()

    from indigent_defense_stats_spark.session import get_spark

    spark = get_spark(app_name="mor-bench", master="local[8]")
    spark.range(1000).count()  # warm
    cells = [
        run_cell(spark, n, args.waves, args.wave_size) for n in args.sizes
    ]
    small, big = cells[0], cells[-1]
    out = {
        "cells": cells,
        "frontier_ratio": round(big["n_pending"] / small["n_pending"], 1),
        "wave_latency_ratio": round(
            big["wave_wall_median"] / small["wave_wall_median"], 3
        ),
        "wave_latency_ratio_per_decade": [
            round(b["wave_wall_median"] / a["wave_wall_median"], 3)
            for a, b in zip(cells, cells[1:])
        ],
        "note": (
            "wave_latency_ratio ~1.0 => frontier transition is O(wave);"
            " read_wall scales with pending (merge-on-read, by design —"
            " eligible selection must see the pending set)"
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "frontier_mor.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
