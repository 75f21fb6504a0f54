"""Registrable-domain (eTLD+1) extraction and rollup — the host
granularity every web-scale crawl metric actually aggregates by.

Counting "hosts" treats ``www.hays.co.uk`` and ``portal.hays.co.uk``
as unrelated; crawl budgets, reputation, and dedup policy are set per
REGISTRABLE DOMAIN (``hays.co.uk``), which requires the public-suffix
algorithm (Mozilla Public Suffix List, publicsuffix.org): find the
LONGEST suffix of the host's label sequence that is a public suffix,
then keep one more label.  Plain "last two labels" is wrong for
multi-level suffixes (``co.uk``, ``tx.us``, ``com.au``) — exactly the
shapes the reference's Texas county portals sit under (``*.tx.us``,
SURVEY.md §1 host model; the engine's per-host politeness/reputation
tables, plans/frontier.py and operators/dust.py, key by host and
would mis-group without this collapse).

The PSL here is a baked representative SUBSET (a handful of ICANN
suffixes incl. the multi-level ones above); production swaps the
literal array for the full ~9k-entry list — still a broadcast-sized
constant, so the operator stays a zero-shuffle map + one grouped
aggregate at any corpus size.

Host synthesis: like the media queries (pipeline_queries.py
``_media_decoded``), hosts are derived ARITHMETICALLY from ``doc_id``
(sub.domain.suffix picked from literal arrays by integer mixing), so
the DuckDB oracle recomputes the full input and any defect in the
longest-match logic hash-mismatches.  One suffix ('internal') is
deliberately NOT in the PSL to exercise the no-match path.

Determinism: pure integer index arithmetic + string joins; the
longest-match is an integer max over a <=3-element candidate set —
no floats anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..functions.fixtures import pick_lit as _pick
from ..functions.fixtures import sql_list_lit as _sql_lit
from .textstats import _docs

SUBS = ["www", "portal", "search", "cases", "m"]
DOMS = ["odyssey", "hays", "travis", "bexar", "dallas", "denton", "collin"]
SUFS = [
    "com",
    "org",
    "co.uk",
    "ac.uk",
    "tx.us",
    "com.au",
    "net",
    "gov",
    "internal",  # NOT in the PSL -> exercises the miss path
]
# baked PSL subset: single-label parents ('uk', 'us', 'au') are
# present alongside their multi-level children so longest-match is
# load-bearing, not incidental
PSL = [
    "com",
    "org",
    "net",
    "gov",
    "edu",
    "io",
    "uk",
    "co.uk",
    "ac.uk",
    "us",
    "tx.us",
    "au",
    "com.au",
]


def synth_host() -> Column:
    """Deterministic host for a document row: sub.domain.suffix by
    integer mixing of doc_id (replayed verbatim by the oracle)."""
    d = F.col("doc_id")
    return F.concat_ws(
        ".",
        _pick(SUBS, d % len(SUBS)),
        _pick(DOMS, F.expr(f"doc_id div {len(SUBS)}") % len(DOMS)),
        _pick(SUFS, F.expr(f"doc_id div {len(SUBS) * len(DOMS)}") % len(SUFS)),
    )


def split_registrable(host: Column) -> tuple[Column, Column]:
    """(public_suffix, registrable_domain) for a host column — the PSL
    longest-match algorithm as pure JVM array expressions:
    candidate k-label suffixes (k = 1..n-1) filtered against the PSL
    set, integer max picks the longest, one extra label makes the
    registrable domain.  NULL when no suffix matches or the host IS a
    public suffix."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    psl = F.array(*[F.lit(s) for s in PSL])
    # k ranges to n, not n-1: a host that IS a public suffix (e.g.
    # 'co.uk') must match at k = n and yield a NULL registrable domain
    ks = F.filter(
        F.sequence(F.lit(1), n),
        lambda k: F.array_contains(
            psl, F.array_join(F.slice(labels, -k, k), ".")
        ),
    )
    s = F.array_max(ks)
    suffix = F.when(
        s.isNotNull(), F.array_join(F.slice(labels, -s, s), ".")
    )
    reg = F.when(
        s.isNotNull() & (s < n),
        F.array_join(F.slice(labels, -(s + 1), s + 1), "."),
    )
    return suffix, reg


def registrable_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(public_suffix, registrable_domain, n_docs, n_hosts): the
    eTLD+1 rollup over the synthesized host universe.  One grouped
    aggregate (map-side partial) after a zero-shuffle projection —
    linear at any scale."""
    suffix, reg = split_registrable(F.col("host"))
    hosts = _docs(spark, sf_dir).select(
        "doc_id", synth_host().alias("host")
    )
    tagged = hosts.select(
        "host",
        F.coalesce(suffix, F.lit("(none)")).alias("public_suffix"),
        F.coalesce(reg, F.lit("(none)")).alias("registrable_domain"),
    )
    return tagged.groupBy("public_suffix", "registrable_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
    )


QUERIES = {
    "registrable_domain_stats": registrable_domain_stats,
}


_HOST_SQL = (
    f"list_extract({_sql_lit(SUBS)}, CAST(doc_id % {len(SUBS)} AS INT) + 1)"
    f" || '.' || list_extract({_sql_lit(DOMS)},"
    f" CAST((doc_id // {len(SUBS)}) % {len(DOMS)} AS INT) + 1)"
    f" || '.' || list_extract({_sql_lit(SUFS)},"
    f" CAST((doc_id // {len(SUBS) * len(DOMS)}) % {len(SUFS)} AS INT) + 1)"
)

ORACLE_SQL = {
    # independent row-form replay: candidate suffixes via unnest
    # instead of the engine's array HOFs; list_slice(ls, n-k+1, n) is
    # DuckDB's 1-based inclusive slice of the last k labels
    "registrable_domain_stats": f"""
        WITH d AS (
            SELECT doc_id, {_HOST_SQL} AS host FROM documents
        ),
        l AS (
            SELECT doc_id, host, string_split(host, '.') AS ls FROM d
        ),
        cand AS (
            SELECT doc_id, g.k,
                   array_to_string(
                       list_slice(ls, len(ls) - g.k + 1, len(ls)), '.'
                   ) AS sfx
            FROM l, unnest(generate_series(1, len(ls))) AS g(k)
        ),
        hit AS (
            SELECT doc_id, max(k) AS s
            FROM cand WHERE list_contains({_sql_lit(PSL)}, sfx)
            GROUP BY doc_id
        ),
        tagged AS (
            SELECT l.host,
                   coalesce(
                       CASE WHEN h.s IS NOT NULL THEN array_to_string(
                           list_slice(l.ls, len(l.ls) - h.s + 1, len(l.ls)),
                           '.')
                       END, '(none)') AS public_suffix,
                   coalesce(
                       CASE WHEN h.s IS NOT NULL AND h.s < len(l.ls)
                            THEN array_to_string(
                                list_slice(l.ls, len(l.ls) - h.s, len(l.ls)),
                                '.')
                       END, '(none)') AS registrable_domain
            FROM l LEFT JOIN hit h USING (doc_id)
        )
        SELECT public_suffix, registrable_domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
        FROM tagged GROUP BY 1, 2
    """,
}
