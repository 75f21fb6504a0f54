"""AIMD adaptive politeness: a 503 on a host doubles its next-wave
interval (capped), clean waves decay it back to base; the fetch-log
virtual clock must obey the adapted interval exactly, and a resumed
engine reconstructs the same state by replaying its own log."""

from __future__ import annotations

from collections import defaultdict
from datetime import date

import pytest

from indigent_defense_stats_spark import synth
from indigent_defense_stats_spark.plans.frontier import AIMD_CAP, CrawlEngine

START = date(2024, 7, 1)
N_DAYS = 3
BASE = 200


@pytest.fixture(scope="module")
def reg():
    return synth.make_registry(2, n_scrape=2)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory, reg):
    e = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("aimd")),
        reg,
        START,
        N_DAYS,
        n_buckets=4,
        bloom_threshold=0,
        adaptive_politeness=True,
    )
    e.run()
    return e


def _replay(rows):
    """Python mirror of the engine's AIMD rule from the fetch log:
    {wave: {host: interval IN EFFECT during that wave}}."""
    by_wave = defaultdict(lambda: defaultdict(lambda: [0, 0, 0]))
    for r in rows:
        s = by_wave[r["wave"]][r["host"]]
        s[0] += 1
        s[1] += r["attempts"]
        s[2] += 1 if r["status"] == "failed" else 0
    cur: dict[str, int] = {}
    in_effect: dict[int, dict[str, int]] = {}
    for w in sorted(by_wave):
        in_effect[w] = {h: cur.get(h, BASE) for h in by_wave[w]}
        for h, (n, att, failed) in sorted(by_wave[w].items()):
            c = cur.get(h, BASE)
            if failed or att > n:
                c = min(c * 2, BASE * AIMD_CAP)
            else:
                c = max(BASE, c - (BASE + 1) // 2)
            cur[h] = c
    return in_effect, cur


def test_clock_obeys_adapted_intervals(eng):
    rows = sorted(
        eng.fetch_log().collect(), key=lambda r: (r["host"], r["fetch_ts_ms"])
    )
    in_effect, _ = _replay(rows)
    prev_ts: dict[str, int] = {}
    checked = 0
    for r in rows:
        tri = r["attempts"] * (r["attempts"] + 1) // 2
        expect_gap = in_effect[r["wave"]][r["host"]] * tri
        if r["host"] in prev_ts:
            assert r["fetch_ts_ms"] - prev_ts[r["host"]] == expect_gap, r
            checked += 1
        prev_ts[r["host"]] = r["fetch_ts_ms"]
    assert checked > 10


def test_adaptation_actually_fires_and_decays(eng):
    rows = eng.fetch_log().collect()
    in_effect, _ = _replay(rows)
    flat = [v for w in in_effect.values() for v in w.values()]
    assert any(v > BASE for v in flat)  # a 503 raised some interval
    assert any(v == BASE for v in flat)  # and base is still in play
    # retries existed in this world, else the test proves nothing
    assert any(r["attempts"] > 1 for r in rows)


def test_resume_replays_identical_state(spark, eng, reg):
    fresh = CrawlEngine(
        spark,
        eng.base_dir,
        reg,
        START,
        N_DAYS,
        n_buckets=4,
        bloom_threshold=0,
        adaptive_politeness=True,
    )
    fresh._aimd_replay()
    _, final = _replay(eng.fetch_log().collect())
    assert fresh._aimd == final
    assert eng._aimd == final  # live loop state matches the pure replay
