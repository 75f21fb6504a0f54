"""Fuzzy record linkage: pure-Python replay of the blocked
edit-distance match, typo-pair recall, and the no-exact-pairs law."""

from __future__ import annotations

from indigent_defense_stats_spark.operators import linkage as L

SF_DIR = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _py_names(n_docs: int) -> dict[str, int]:
    out: dict[str, int] = {}
    for d in range(n_docs):
        base = (
            L.FIRSTS[d % len(L.FIRSTS)]
            + " "
            + L.LASTS[(d // len(L.FIRSTS)) % len(L.LASTS)]
        )
        if d % L.TYPO_MOD == L.TYPO_MOD - 1:
            p = d % (len(base) - 2) + 2  # 1-based deleted position
            base = base[: p - 1] + base[p:]
        out[base] = out.get(base, 0) + 1
    return out


def test_matches_pure_python(spark):
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    names = _py_names(n_docs)
    expected = set()
    for a in names:
        for b in names:
            if a < b and a[0] == b[0] and _lev(a, b) <= L.LEV_MAX:
                expected.add((a, b, _lev(a, b), names[a], names[b]))
    got = {
        (r["name1"], r["name2"], r["lev"], r["n1"], r["n2"])
        for r in L.fuzzy_name_pairs(spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # the typo channel guarantees real fuzzy pairs


def test_typo_pairs_recovered_and_no_exact_pairs(spark):
    rows = L.fuzzy_name_pairs(spark, SF_DIR).collect()
    for r in rows:
        assert 1 <= r["lev"] <= L.LEV_MAX  # identical names excluded
        assert r["name1"][0] == r["name2"][0]  # blocking respected
    # every typo variant pairs with its base (deletion distance 1,
    # first char untouched so the block holds)
    names = _py_names(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    bases = {
        n for n in names if n.count(" ") == 1 and any(
            n == f + " " + s for f in L.FIRSTS for s in L.LASTS
        )
    }
    pairs = {(r["name1"], r["name2"]) for r in rows}
    flat = {x for p in pairs for x in p}
    typos = set(names) - bases
    assert typos and typos <= flat
