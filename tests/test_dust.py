"""DUST rule mining / application + URL-trap detection vs pure-Python
brute force on hand-built MULTI-param catalogs (the synthetic driver
world is single-param; these tests pin the generic path: other-param
group keys, absent-state channel, multi-key stripping, kept-param
sort order, template key sets)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from indigent_defense_stats_spark.operators import dust

SF_DIR = "/root/testdata/sf0.001"


def _brute_rules(catalog):
    """catalog: list[(url, hash)] -> {(host, pkey): (evid, viol, irr)}
    mirroring mine_dust_rules' definition independently."""

    def parse(url):
        rest = url.split("://", 1)[1]
        host, _, tail = rest.partition("/")
        tail = "/" + tail
        path, _, query = tail.partition("?")
        params = [p for p in query.split("&") if p] if query else []
        return host, path, params

    host_keys = defaultdict(set)
    rows = []
    for url, h in catalog:
        host, path, params = parse(url)
        rows.append((host, path, params, h))
        for p in params:
            host_keys[host].add(p.split("=", 1)[0])
    groups = defaultdict(lambda: (set(), set()))
    for host, path, params, h in rows:
        present = {p.split("=", 1)[0] for p in params}
        for pkey in host_keys[host]:
            if pkey in present:
                for p in params:
                    if p.split("=", 1)[0] == pkey:
                        others = "&".join(sorted(x for x in params if x != p))
                        state = p.split("=", 1)[1] if "=" in p else ""
                        g = groups[(host, pkey, path, others)]
                        g[0].add(state)
                        g[1].add(h)
            else:
                others = "&".join(sorted(params))
                g = groups[(host, pkey, path, others)]
                g[0].add(dust._ABSENT)
                g[1].add(h)
    out = {}
    for host in host_keys:
        for pkey in host_keys[host]:
            evid = sum(
                1
                for (gh, gk, _, _), (st, _) in groups.items()
                if gh == host and gk == pkey and len(st) > 1
            )
            viol = sum(
                1
                for (gh, gk, _, _), (st, hs) in groups.items()
                if gh == host and gk == pkey and len(st) > 1 and len(hs) > 1
            )
            out[(host, pkey)] = (
                evid,
                viol,
                evid >= dust.MIN_SUPPORT and viol == 0,
            )
    return out


# 6 ids on a.example: sess irrelevant (2 values + absent, hash fixed
# per id), id relevant (changes hash), lone tracker "once" appears on
# one URL only -> 1 evidence group < MIN_SUPPORT
MULTI = [
    (f"https://a.example/p?id={i}&sess={s}", f"h{i}")
    for i in range(6)
    for s in ("x", "y")
] + [(f"https://a.example/p?id={i}", f"h{i}") for i in range(6)] + [
    ("https://a.example/p?id=0&once=1", "h0"),
    ("https://b.example/q", "hb"),
]


def _mined(spark):
    df = spark.createDataFrame(MULTI, "url string, content_hash string")
    return {
        (r["host"], r["param"]): (
            r["evidence_groups"],
            r["violation_groups"],
            r["irrelevant"],
        )
        for r in dust.mine_dust_rules(df).collect()
    }


def test_mine_rules_matches_brute_force(spark):
    assert _mined(spark) == _brute_rules(MULTI)


def test_rule_classifications(spark):
    got = _mined(spark)
    # sess: 6 groups (one per id), multi-state, hash constant -> rule
    assert got[("a.example", "sess")] == (6, 0, True)
    # id: every group multi-state AND multi-hash -> rejected
    evid, viol, irr = got[("a.example", "id")]
    assert evid == viol > 0 and not irr
    # once: single evidence group (id=0: present vs absent, same hash)
    # -> correct but under MIN_SUPPORT
    assert got[("a.example", "once")] == (1, 0, False)
    assert ("b.example", "q") not in got  # no params -> no candidates


def test_apply_rules_strips_only_irrelevant_sorted(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.example/p?sess=x&id=3",),
            ("https://a.example/p?id=3",),
            ("https://a.example/p",),
            ("https://b.example/q?sess=z",),  # no rule on b.example
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [("a.example", "sess", 6, 0, True), ("a.example", "id", 6, 6, False)],
        "host string, param string, evidence_groups long, "
        "violation_groups long, irrelevant boolean",
    )
    got = {
        r["url"]: r["canonical_url"]
        for r in dust.apply_dust_rules(urls, rules).collect()
    }
    assert got == {
        "https://a.example/p?sess=x&id=3": "https://a.example/p?id=3",
        "https://a.example/p?id=3": "https://a.example/p?id=3",
        "https://a.example/p": "https://a.example/p",
        "https://b.example/q?sess=z": "https://b.example/q?sess=z",
    }


def test_apply_sorts_kept_params(spark):
    urls = spark.createDataFrame(
        [("https://a.example/p?z=1&sess=q&a=2",)], "url string"
    )
    rules = spark.createDataFrame(
        [("a.example", "sess", 9, 0, True)],
        "host string, param string, evidence_groups long, "
        "violation_groups long, irrelevant boolean",
    )
    [row] = dust.apply_dust_rules(urls, rules).collect()
    assert row["canonical_url"] == "https://a.example/p?a=2&z=1"


def test_trap_thresholds(spark):
    # 25 urls / 2 contents -> trap; 25/25 -> not; 19/1 -> under min
    cat = (
        [(f"https://t.example/cal/{i}", f"c{i % 2}") for i in range(25)]
        + [(f"https://ok.example/doc/{i}", f"d{i}") for i in range(25)]
        + [(f"https://small.example/x/{i}", "same") for i in range(19)]
    )
    df = spark.createDataFrame(cat, "url string, content_hash string")
    got = {
        (r["host"], r["path_template"]): (r["n_urls"], r["n_content"], r["trap"])
        for r in dust.find_url_traps(df).collect()
    }
    assert got[("t.example", "/cal/N")] == (25, 2, True)
    assert got[("ok.example", "/doc/N")] == (25, 25, False)
    assert got[("small.example", "/x/N")] == (19, 1, False)


def test_synthetic_world_end_to_end(spark):
    rules = {
        (r["host"], r["param"]): r["irrelevant"]
        for r in dust.dust_rules(spark, SF_DIR).collect()
    }
    hosts = {f"host{i}.example" for i in range(6)}
    assert all(rules[(h, "sess")] for h in hosts)
    assert not any(rules.get((h, "v"), False) for h in hosts)

    # applying the mined rules collapses all sess aliases: canonicals =
    # base per doc + ?v=1 per odd doc + the trap urls (unchanged)
    canon = dust.dust_canonical_urls(spark, SF_DIR)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n_odd = n_docs // 2
    n_trap = (
        dust.variant_urls(spark, SF_DIR)
        .filter("url like 'https://trap%'")
        .count()
    )
    assert (
        canon.select("canonical_url").distinct().count()
        == n_docs + n_odd + n_trap
    )


def test_canonical_rewrite_is_map_side(spark):
    """Rule application must stay broadcast + map-only so it can sit
    inside the frontier's canonicalization stage."""
    urls = spark.createDataFrame([("https://a.example/p?sess=1",)], "url string")
    rules = spark.createDataFrame(
        [("a.example", "sess", 9, 0, True)],
        "host string, param string, evidence_groups long, "
        "violation_groups long, irrelevant boolean",
    )
    plan = dust.apply_dust_rules(urls, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only hash exchange allowed is the tiny rules-dim collect_set
    # aggregate feeding the broadcast; the url side is a pure map
    assert plan.count("Exchange hashpartitioning") <= 1


def test_host_reputation_flags_trap_host(spark):
    rows = {
        r["host"]: r for r in dust.host_reputation(spark, SF_DIR).collect()
    }
    assert rows["trap.example"]["low_quality"]
    assert rows["trap.example"]["trap_templates"] == 1
    assert rows["trap.example"]["alias_params"] == 0
    for h, r in rows.items():
        if h != "trap.example":
            assert not r["low_quality"], h
            assert r["alias_params"] >= 1  # sess mined everywhere
        assert r["n_content"] <= r["n_urls"]
        assert abs(r["content_ratio"] - r["n_content"] / r["n_urls"]) == 0.0
