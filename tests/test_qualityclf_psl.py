"""Hashed-ngram quality classifier + eTLD+1 registrable-domain rollup:
brute-force Python replays, adversarial shapes (single-token docs, the
PSL miss path, a host that IS a public suffix), and the zero-shuffle
plan contract for both map-only operators."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from indigent_defense_stats_spark.operators import psl as P
from indigent_defense_stats_spark.operators import qualityclf as Q

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# quality classifier
# ---------------------------------------------------------------------------


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _w(bucket: int) -> int:
    return ((bucket * 2654435761) % 2**31) % 2001 - 1000


def _py_score(text: str) -> tuple[int, int]:
    toks = text.lower().split(" ")
    feats = [_w(_md5_int("u:" + t) % Q.CLF_B) for t in toks]
    feats += [
        _w(_md5_int(f"b:{a}_{b}") % Q.CLF_B)
        for a, b in zip(toks, toks[1:])
    ]
    return len(feats), sum(feats) + Q._BIAS_MICRO


def test_classifier_matches_pure_python(spark):
    rows = (
        Q.quality_classifier_score(spark, SF_DIR)
        .join(
            spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
                "doc_id", "text"
            ),
            "doc_id",
        )
        .collect()
    )
    assert rows
    for r in rows[:50]:
        n, s = _py_score(r["text"])
        assert (r["n_feats"], r["score_micro"]) == (n, s), r["doc_id"]
        assert r["keep"] == (s > 0)


def test_classifier_single_token_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "word"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    # substitute the reader bound into the qualityclf namespace
    orig = Q._docs
    try:
        Q._docs = lambda spark, sf_dir: df
        out = {
            r["doc_id"]: r
            for r in Q.quality_classifier_score(spark, SF_DIR).collect()
        }
    finally:
        Q._docs = orig
    # single token: 1 unigram, 0 bigrams
    assert out[1]["n_feats"] == 1
    # empty text tokenizes to [''] -> still 1 feature (never div-by-0)
    assert out[2]["n_feats"] == 1
    assert out[3]["n_feats"] == 3
    for doc_id, text in [(1, "word"), (2, ""), (3, "a b")]:
        n, s = _py_score(text)
        assert (out[doc_id]["n_feats"], out[doc_id]["score_micro"]) == (n, s)


def test_classifier_plan_is_map_only(spark):
    plan = Q.quality_classifier_score(spark, SF_DIR)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# registrable domains
# ---------------------------------------------------------------------------


def _py_registrable(host: str) -> tuple[str | None, str | None]:
    labels = host.split(".")
    best = None
    for k in range(1, len(labels) + 1):
        if ".".join(labels[-k:]) in P.PSL:
            best = k
    if best is None:
        return None, None
    sfx = ".".join(labels[-best:])
    reg = ".".join(labels[-(best + 1):]) if best < len(labels) else None
    return sfx, reg


def test_split_registrable_adversarial_hosts(spark):
    hosts = [
        "www.hays.co.uk",       # multi-level suffix beats 'uk'
        "portal.travis.tx.us",  # multi-level beats 'us'
        "a.b.example.com",      # deep subdomain -> example.com
        "cases.bexar.internal", # miss path -> (NULL, NULL)
        "co.uk",                # host IS a public suffix -> (co.uk, NULL)
        "example.com",          # bare registrable
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    sfx, reg = P.split_registrable(F.col("host"))
    got = {
        r["host"]: (r["s"], r["r"])
        for r in df.select("host", sfx.alias("s"), reg.alias("r")).collect()
    }
    for h in hosts:
        assert got[h] == _py_registrable(h), h
    assert got["www.hays.co.uk"] == ("co.uk", "hays.co.uk")
    assert got["co.uk"] == ("co.uk", None)
    assert got["cases.bexar.internal"] == (None, None)


def test_registrable_stats_cover_miss_and_multilevel(spark):
    rows = P.registrable_domain_stats(spark, SF_DIR).collect()
    by_sfx = {}
    for r in rows:
        by_sfx.setdefault(r["public_suffix"], 0)
        by_sfx[r["public_suffix"]] += r["n_docs"]
        assert r["n_hosts"] <= r["n_docs"]
        if r["registrable_domain"] != "(none)":
            # within a matched group the host varies only by subdomain
            assert r["n_hosts"] <= len(P.SUBS)
        else:
            # the miss group pools every 'internal' host
            assert r["n_hosts"] <= len(P.SUBS) * len(P.DOMS)
    # the 'internal' suffix is unmatched -> lands in '(none)'
    assert "(none)" in by_sfx
    assert "co.uk" in by_sfx and "tx.us" in by_sfx
    # every document is in exactly one group
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(by_sfx.values()) == n_docs


def test_registrable_plan_single_aggregate(spark):
    plan = P.registrable_domain_stats(spark, SF_DIR)._jdf.queryExecution(
    ).executedPlan().toString()
    # the distinct aggregate (n_hosts) plans as the standard two-phase
    # expansion: one exchange on (group, host), one on the group — both
    # linear, map-side-combined; pin that exact budget
    assert plan.count("Exchange hashpartitioning") == 2
    assert "EvalPython" not in plan
