"""Water-filling budget split vs a brute-force mirror + invariants."""

from __future__ import annotations

import random

import pytest

from indigent_defense_stats_spark.operators.freshness import waterfill


def _brute(demand: dict[str, int], budget: int) -> dict[str, int]:
    items = sorted(demand.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    prefix, i_star, level, rem = 0, None, 0, 0
    for idx, (_, d) in enumerate(items, 1):
        share = max(budget - prefix, 0) // (n - idx + 1)
        if share < d:
            i_star, level = idx, share
            rem = (budget - prefix) - level * (n - idx + 1)
            break
        prefix += d
    out = {}
    for idx, (h, d) in enumerate(items, 1):
        if i_star is None or idx < i_star:
            out[h] = d
        else:
            out[h] = level + (1 if idx - i_star < rem else 0)
    return out


def _run(spark, demand: dict[str, int], budget: int) -> dict[str, int]:
    df = spark.createDataFrame(
        sorted(demand.items()), "host string, demand long"
    )
    return {
        r["host"]: r["allocation"] for r in waterfill(df, budget).collect()
    }


CASES = [
    ({"a": 5, "b": 50, "c": 100}, 60),  # binding in the middle
    ({"a": 5, "b": 50, "c": 100}, 200),  # covers everything
    ({"a": 5, "b": 50, "c": 100}, 0),  # nothing to give
    ({"a": 7}, 3),  # single host, capped
    ({"a": 10, "b": 10, "c": 10}, 17),  # equal demands + remainder
    ({"a": 1, "b": 1, "c": 1, "d": 1000}, 10),  # heavy tail
]


@pytest.mark.parametrize("demand,budget", CASES)
def test_matches_brute_force(spark, demand, budget):
    assert _run(spark, demand, budget) == _brute(demand, budget)


def test_randomized_invariants(spark):
    rng = random.Random(7)
    for _ in range(3):
        demand = {
            f"h{i:02d}": rng.randrange(0, 500) for i in range(rng.randrange(2, 14))
        }
        total = sum(demand.values())
        for budget in (0, total // 3, total, total + 13):
            got = _run(spark, demand, budget)
            ref = _brute(demand, budget)
            assert got == ref, (demand, budget)
            assert sum(got.values()) == min(budget, total)
            assert all(0 <= got[h] <= demand[h] for h in demand)
            # max-min: every capped host sits at the water level
            # (within the integer remainder unit)
            capped = [got[h] for h in demand if got[h] < demand[h]]
            if capped:
                assert max(capped) - min(capped) <= 1


def test_allocation_fairness_bounds(spark):
    from indigent_defense_stats_spark.operators.freshness import (
        allocation_fairness,
    )

    r = allocation_fairness(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_hosts"] >= 2
    # Jain's index lives in (1/n, 1]; max-min fairness must not be
    # LESS fair than the raw demand distribution
    for col in ("jain_allocation", "jain_demand"):
        assert 1.0 / r["n_hosts"] < r[col] <= 1.0
    assert r["jain_allocation"] >= r["jain_demand"]
    assert r["n_capped"] >= 1  # the 60% budget binds by construction
