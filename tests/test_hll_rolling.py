"""Rolling HLL distinct: the merge law (window estimate == estimate
of the merged 3-day register table, replayed in pure Python) and the
sketch's accuracy envelope against the exact rolling countDistinct."""

from __future__ import annotations

import hashlib

from indigent_defense_stats_spark.operators import sketches as S

SF_DIR = "/root/testdata/sf0.001"


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rho(suffix: int) -> int:
    if suffix == 0:
        return 55
    tz = (suffix & -suffix).bit_length() - 1
    return min(1 + tz, 55)


def _est(regs: dict[int, int]) -> float:
    hit_sum = sum(1 << (55 - mj) for mj in regs.values())
    hits = len(regs)
    raw = S._HLL_NUM / (hit_sum + (S.HLL_M - hits) * (1 << 55))
    if raw <= S._HLL_SMALL and hits < S.HLL_M:
        return S._HLL_LC[S.HLL_M - hits - 1]
    return raw


def test_rolling_matches_python_merge(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "user_id"
    )
    import datetime as dt

    epoch0 = dt.date(1970, 1, 1)
    daily: dict[int, dict[int, int]] = {}
    users_by_day: dict[int, set] = {}
    for r in ev.collect():
        ts = r["ts"]
        epoch = (
            (ts.date() - epoch0).days * 86400
            + ts.hour * 3600
            + ts.minute * 60
            + ts.second
        )
        d = epoch // 86400
        h = _md5_int(str(r["user_id"]))
        reg, rho = h % S.HLL_M, _rho(h >> 6)
        dd = daily.setdefault(d, {})
        if dd.get(reg, -1) < rho:
            dd[reg] = rho
        users_by_day.setdefault(d, set()).add(r["user_id"])
    rows = {
        r["epoch_day"]: r
        for r in S.hll_rolling_distinct(spark, SF_DIR).collect()
    }
    dmin, dmax = min(daily), max(daily)
    assert set(rows) == set(range(dmin, dmax + 1))
    for d, r in rows.items():
        merged: dict[int, int] = {}
        exact: set = set()
        for dd in range(d - S.HLL_WIN + 1, d + 1):
            exact |= users_by_day.get(dd, set())
            for reg, mj in daily.get(dd, {}).items():
                if merged.get(reg, -1) < mj:
                    merged[reg] = mj
        assert r["registers_hit"] == len(merged), d
        assert r["hll_est"] == _est(merged), d
        assert r["exact_3d"] == len(exact), d


def test_rolling_accuracy_envelope(spark):
    rows = S.hll_rolling_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["exact_3d"] >= 100:
            rel = abs(r["hll_est"] - r["exact_3d"]) / r["exact_3d"]
            # m=64 -> sigma ~ 1.04/8 = 13%; allow 3 sigma
            assert rel < 0.39, (r["epoch_day"], r["hll_est"], r["exact_3d"])
