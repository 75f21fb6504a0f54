"""Dirty-CSV quarantine: corruption-channel classification matches
the probed PERMISSIVE semantics, and the column-pruning trap stays
documented (full-row parse restores structural corruption flags)."""

from __future__ import annotations

from indigent_defense_stats_spark.operators import ingestq as Q

SF_DIR = "/root/testdata/sf0.001"


def test_accounting_matches_python(spark):
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    exp: dict[str, list[int]] = {}
    for d in ids:
        d = int(d)
        kind = Q._classify(d)
        county = "(none)" if kind == "short" else Q.COUNTIES[d % len(Q.COUNTIES)]
        e = exp.setdefault(county, [0, 0, 0, 0, 0])
        e[0] += 1
        e[1] += d
        e[2] += kind in ("bad", "extra", "short")
        amount_null = kind in ("bad", "empty")
        e[3] += amount_null
        e[4] += 0 if amount_null else Q._amount(d)
    got = {
        r["county"]: [
            r["n_rows"], r["sum_id"], r["n_corrupt"],
            r["n_amount_null"], r["sum_amount"],
        ]
        for r in Q.csv_quarantine_stats(spark, SF_DIR).collect()
    }
    assert got == exp
    # every channel actually fired
    assert "(none)" in got and got["(none)"][2] == got["(none)"][0]


def test_channels_are_disjoint_priorities():
    kinds = {k: 0 for k in ("bad", "extra", "short", "empty", "clean")}
    for d in range(1000):
        kinds[Q._classify(d)] += 1
    assert all(v > 0 for v in kinds.values())
    # priority: a doc hitting bad AND extra counts as bad
    d = 3
    while not (d % Q.BAD_MOD == Q.BAD_REM and d % Q.EXTRA_MOD == Q.EXTRA_REM):
        d += 1
    assert Q._classify(d) == "bad"
