"""DUST rule mining + URL-trap detection — crawl-frontier hygiene.

DUST ("Different URLs with Similar Text", Bar-Yossef et al., WWW'07)
is the within-host dual of mirror detection (dedup.py mirror_hosts):
the same page is reachable under many URLs that differ only in
content-irrelevant query parameters (session ids, trackers, sort
toggles).  The reference meets this on Odyssey portals — its case-URL
key extraction (/root/reference/src/scraper/__init__.py:446
``case_url.split("=")[1]``) is a HAND-WRITTEN dust rule ("only the
CaseID param matters").  At 10^10-URL frontier scale the rules must
instead be LEARNED from the fetch log, because every alias that the
URL-seen filter cannot collapse is a wasted refetch and a duplicate
document downstream.

Three operators, all over a catalog of observed ``(url,
content_hash)`` fetches:

- :func:`dust_rules` — mine per-``(host, param)`` irrelevance rules.
  Evidence group = URLs identical except for the candidate param's
  state (absent counts as a state); the rule holds when >= MIN_SUPPORT
  groups show multiple states and NO group shows multiple content
  hashes.  This is the conservative big-data restatement of the
  paper's "likely dust rules + validation" two-phase scheme.
- :func:`apply_dust_rules` / ``dust_canonical_urls`` — rewrite URLs by
  stripping every irrelevant param (sorted residue), the
  canonicalization hook the frontier's seen filter keys on
  (functions/urls.py canonicalize_col composes before it).
- :func:`url_trap_hosts` — crawler-trap detection: per ``(host,
  path-template)`` (digit runs -> ``N``, param VALUES dropped), flag
  templates whose distinct-URL count explodes past the distinct-
  content count (calendar pages, infinite pagination).  A trapped
  template is a frontier blocklist entry; the politeness scheduler
  stops expanding links that match it.

Scale shape (10^10 URLs): everything is linear hash aggregation on
``(host, param, group-key)`` — no self-joins, no per-row Python.  The
absent-state channel joins the catalog against a BROADCAST
``host -> observed-param-keys`` dim (bounded: real crawls df-cap the
candidate params per host exactly like the shingle df-cap in
dedup.py).  Skewed hosts split under AQE; the final per-rule rollup
is tiny.

Synthetic fetch catalog (deterministic, from ``documents``; host
arithmetic matches redirects.py / sources/sitemap.py so the channels
compose):

- base page        ``https://host{d%6}.example/case/{d}``  (hash of text)
- session aliases  ``?sess=a{d%7}`` and ``?sess=b{d%5}``   (same hash —
                   sess is TRUE dust on every host)
- version param    ``?v=1`` on odd doc_ids                 (hash changes —
                   a real parameter the miner must NOT strip)
- calendar trap    ``https://trap.example/cal/{d//10}/{k}``, k=0..3,
                   for d%10==0; content depends only on k%2, so URL
                   count outruns content count 10x -> trap.

The DuckDB oracles replay the same mining / strip / trap arithmetic
from the same synthetic catalog, so equality certifies group keying,
the absent-state channel, violation accounting, rule application, and
the trap ratio rule.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

_HOST_MOD = 6
MIN_SUPPORT = 5
_ABSENT = "~absent~"  # > any [a-z0-9] value char; never a real value
TRAP_MIN_URLS = 20
TRAP_RATIO = 10  # trap when n_urls >= TRAP_RATIO * n_content


# ---------------------------------------------------------------- synthetic

def variant_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed fetch catalog ``(url, content_hash)`` (distinct)."""
    d = F.col("doc_id")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = F.concat(
        F.lit("https://host"),
        (d % _HOST_MOD).cast("string"),
        F.lit(".example/case/"),
        d.cast("string"),
    )
    h0 = F.md5(F.col("text"))
    h1 = F.md5(F.concat(F.col("text"), F.lit("#v=1")))
    v0 = docs.select(base.alias("url"), h0.alias("content_hash"))
    v1 = docs.select(
        F.concat(base, F.lit("?sess=a"), (d % 7).cast("string")).alias("url"),
        h0.alias("content_hash"),
    )
    v2 = docs.select(
        F.concat(base, F.lit("?sess=b"), (d % 5).cast("string")).alias("url"),
        h0.alias("content_hash"),
    )
    v3 = docs.filter(d % 2 == 1).select(
        F.concat(base, F.lit("?v=1")).alias("url"), h1.alias("content_hash")
    )
    cal = (
        docs.filter(d % 10 == 0)
        .select(d, F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"))
        .select(
            F.concat(
                F.lit("https://trap.example/cal/"),
                F.floor(d / 10).cast("long").cast("string"),
                F.lit("/"),
                F.col("k").cast("string"),
            ).alias("url"),
            F.md5(F.concat(F.lit("cal"), (F.col("k") % 2).cast("string"))).alias(
                "content_hash"
            ),
        )
    )
    return v0.unionByName(v1).unionByName(v2).unionByName(v3).unionByName(cal).distinct()


_SYNTH_SQL = f"""
    docs AS (
        SELECT doc_id,
               'https://host' || (doc_id % {_HOST_MOD}) || '.example/case/'
                              || doc_id                        AS base,
               md5(text)                                       AS h0,
               md5(text || '#v=1')                             AS h1
        FROM documents
    ), catalog AS (
        SELECT DISTINCT url, content_hash FROM (
            SELECT base AS url, h0 AS content_hash FROM docs
            UNION ALL
            SELECT base || '?sess=a' || (doc_id % 7), h0 FROM docs
            UNION ALL
            SELECT base || '?sess=b' || (doc_id % 5), h0 FROM docs
            UNION ALL
            SELECT base || '?v=1', h1 FROM docs WHERE doc_id % 2 = 1
            UNION ALL
            SELECT 'https://trap.example/cal/'
                       || CAST(doc_id // 10 AS BIGINT) || '/' || k.k,
                   md5('cal' || (k.k % 2))
            FROM docs, (SELECT unnest(range(4)) AS k) k
            WHERE doc_id % 10 = 0
        )
    )
"""


# ---------------------------------------------------------------- parsing

def _host(url: Column) -> Column:
    return F.regexp_extract(url, "^[a-z]+://([^/]+)", 1)


def _path(url: Column) -> Column:
    return F.regexp_extract(url, "^[a-z]+://[^/]+([^?]*)", 1)


def _params(url: Column) -> Column:
    query = F.when(
        url.contains("?"), F.regexp_replace(url, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    return F.filter(F.split(query, "&"), lambda p: p != "")


def _pkey(param: Column) -> Column:
    return F.regexp_extract(param, "^([^=]*)", 1)


def _parsed(urls: DataFrame) -> DataFrame:
    u = F.col("url")
    return urls.select(
        "url",
        "content_hash",
        _host(u).alias("host"),
        _path(u).alias("path"),
        _params(u).alias("params"),
    )


# ---------------------------------------------------------------- operators

def mine_dust_rules(
    catalog: DataFrame, min_support: int = MIN_SUPPORT
) -> DataFrame:
    """``(url, content_hash)`` -> per-(host, param) irrelevance rules.

    Generic over any URL shape: group key = (host, path, every OTHER
    param sorted), candidate state = the param's full ``k=v`` token
    value (or the absent marker).  One row per observed (host, param
    key).  ``min_support`` = evidence groups required before a
    violation-free param is declared irrelevant (small crawl windows
    warrant a lower bar than a production log).
    """
    parsed = _parsed(catalog).localCheckpoint(eager=False)
    withp = (
        parsed.select(
            "host",
            "path",
            "params",
            "content_hash",
            F.explode("params").alias("param"),
        )
        .withColumn("pkey", _pkey(F.col("param")))
        .withColumn(
            "others",
            F.array_join(
                F.array_sort(F.array_remove(F.col("params"), F.col("param"))), "&"
            ),
        )
        .withColumn(
            "state", F.regexp_replace(F.col("param"), "^[^=]*=?", "")
        )
        .select("host", "pkey", "path", "others", "state", "content_hash")
    )
    # bounded dim: the param keys ever observed on each host
    pkeys = withp.select("host", "pkey").distinct()
    absent = (
        parsed.join(F.broadcast(pkeys), "host")
        .filter(
            ~F.exists(
                F.col("params"), lambda p: _pkey(p) == F.col("pkey")
            )
        )
        .select(
            "host",
            "pkey",
            "path",
            F.array_join(F.array_sort(F.col("params")), "&").alias("others"),
            F.lit(_ABSENT).alias("state"),
            "content_hash",
        )
    )
    groups = (
        withp.unionByName(absent)
        .groupBy("host", "pkey", "path", "others")
        .agg(
            F.countDistinct("state").alias("ns"),
            F.countDistinct("content_hash").alias("nh"),
        )
    )
    ns, nh = F.col("ns"), F.col("nh")
    rules = (
        groups.groupBy("host", "pkey")
        .agg(
            F.sum(F.when(ns > 1, 1).otherwise(0)).cast("long").alias(
                "evidence_groups"
            ),
            F.sum(F.when((ns > 1) & (nh > 1), 1).otherwise(0))
            .cast("long")
            .alias("violation_groups"),
        )
        .select(
            "host",
            F.col("pkey").alias("param"),
            "evidence_groups",
            "violation_groups",
            (
                (F.col("evidence_groups") >= min_support)
                & (F.col("violation_groups") == 0)
            ).alias("irrelevant"),
        )
    )
    return rules


def rules_from_crawl(
    fetch_log: DataFrame,
    documents: DataFrame,
    min_support: int = MIN_SUPPORT,
) -> DataFrame:
    """Mine rules from a crawl engine's OWN output: depth-4 fetch-log
    URLs joined to the per-case span documents (content identity =
    md5 of the canonical span JSON).  This closes the loop the module
    docstring describes — crawl with aliases, mine, hand the rules to
    the next ``CrawlEngine(dust_rules=...)`` — with no side channel:
    everything the miner sees, the crawler observed itself."""
    urls = fetch_log.filter(
        (F.col("depth") == 4) & (F.col("status") == "fetched")
    ).select(
        F.col("canonical_url").alias("url"),
        F.regexp_extract("canonical_url", "CaseID=(\\d+)", 1).alias("doc_id"),
    )
    content = documents.select(
        "doc_id", F.md5(F.to_json("spans")).alias("content_hash")
    )
    catalog = urls.join(content, "doc_id").select("url", "content_hash")
    return mine_dust_rules(catalog, min_support=min_support)


def irrelevant_keys_dim(rules: DataFrame) -> DataFrame:
    """Mined rules -> broadcastable ``(host, irr_keys array)`` dim."""
    return (
        rules.filter(F.col("irrelevant"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("irr_keys"))
    )


def strip_params_col(url: Column, irr_keys: Column) -> Column:
    """Rewrite ``url`` dropping params whose key is in ``irr_keys``
    (NULL-safe: no rules on the host -> url unchanged up to param
    sort).  Pure expression — composes into any map stage."""
    keys = F.coalesce(irr_keys, F.array().cast("array<string>"))
    kept = F.array_sort(
        F.filter(_params(url), lambda p: ~F.array_contains(keys, _pkey(p)))
    )
    base = F.regexp_extract(url, "^([^?]*)", 1)
    return F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)


def template_col(url: Column) -> Column:
    """URL -> trap template: digit runs in the path -> ``N``, param
    VALUES dropped (sorted distinct keys)."""
    tmpl_path = F.regexp_replace(_path(url), "[0-9]+", "N")
    keyset = F.array_join(
        F.array_sort(F.array_distinct(F.transform(_params(url), _pkey))), "&"
    )
    return F.when(
        F.size(_params(url)) > 0, F.concat(tmpl_path, F.lit("?"), keyset)
    ).otherwise(tmpl_path)


def apply_dust_rules(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Strip every mined-irrelevant param: ``url -> canonical_url``.

    ``rules`` is the :func:`mine_dust_rules` output; only
    ``irrelevant`` rows act.  The per-host key set is tiny ->
    broadcast; the rewrite itself is a pure map (no shuffle), so it
    composes into the frontier's canonicalization stage
    (plans/frontier.py seen-filter keys) for free.
    """
    dim = irrelevant_keys_dim(rules)
    u = F.col("url")
    joined = urls.select("url", _host(u).alias("host")).join(
        F.broadcast(dim), "host", "left"
    )
    return joined.select(
        "url", strip_params_col(u, F.col("irr_keys")).alias("canonical_url")
    )


def find_url_traps(catalog: DataFrame) -> DataFrame:
    """Per-(host, template) explosion stats; ``trap`` when distinct
    URLs >= TRAP_MIN_URLS and outrun distinct content TRAP_RATIO x."""
    u = F.col("url")
    agg = (
        catalog.select(
            _host(u).alias("host"),
            template_col(u).alias("path_template"),
            "content_hash",
        )
        .groupBy("host", "path_template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("content_hash").alias("n_content"),
        )
    )
    return agg.select(
        "host",
        "path_template",
        "n_urls",
        "n_content",
        (
            (F.col("n_urls") >= TRAP_MIN_URLS)
            & (F.col("n_content") * TRAP_RATIO <= F.col("n_urls"))
        ).alias("trap"),
    )


# ---------------------------------------------------------------- queries

def dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mine_dust_rules(variant_urls(spark, sf_dir)).orderBy("host", "param")


def dust_canonical_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog = variant_urls(spark, sf_dir).localCheckpoint(eager=False)
    rules = mine_dust_rules(catalog)
    return apply_dust_rules(catalog.select("url"), rules).orderBy("url")


def url_trap_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return find_url_traps(variant_urls(spark, sf_dir)).orderBy(
        "host", "path_template"
    )


def host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl-quality rollup — the scheduler-facing summary a
    frontier uses to deprioritize junk hosts: distinct URLs vs
    distinct content (duplication ratio), flagged trap templates, and
    mined-irrelevant params, with ``low_quality`` set when a host has
    any trap template or its URL count outruns content 5x at >= 20
    URLs.  Composes the three hygiene miners over one shared catalog
    (pinned — three consumers); all per-host dims, broadcast-sized.
    The reference analog is manual: a human removes a broken county
    from the registry (``scrape != 'yes'``); at 10^10 URLs the
    blocklist must be computed."""
    catalog = variant_urls(spark, sf_dir).localCheckpoint(eager=False)
    u = F.col("url")
    base = (
        catalog.select(_host(u).alias("host"), "content_hash")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("content_hash").alias("n_content"),
        )
    )
    traps = (
        find_url_traps(catalog)
        .filter(F.col("trap"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("trap_templates"))
    )
    aliases = (
        mine_dust_rules(catalog)
        .filter(F.col("irrelevant"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("alias_params"))
    )
    out = (
        base.join(traps, "host", "left")
        .join(aliases, "host", "left")
        .select(
            "host",
            "n_urls",
            "n_content",
            (
                F.col("n_content").cast("double")
                / F.col("n_urls").cast("double")
            ).alias("content_ratio"),
            F.coalesce("trap_templates", F.lit(0)).alias("trap_templates"),
            F.coalesce("alias_params", F.lit(0)).alias("alias_params"),
        )
    )
    low = (F.col("trap_templates") > 0) | (
        (F.col("n_urls") >= 20) & (F.col("n_content") * 5 <= F.col("n_urls"))
    )
    return out.withColumn("low_quality", low).orderBy("host")


# ---------------------------------------------------------------- oracles

# the mining replay, shared by the rules + canonicalization oracles;
# single-param catalog => others = '' for param rows, and an absent
# row's group key is its own (sorted) param string
_MINE_SQL = f"""
    parsed AS (
        SELECT url, content_hash,
               regexp_extract(url, '^[a-z]+://([^/]+)', 1)      AS host,
               regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
               CASE WHEN contains(url, '?')
                    THEN regexp_replace(url, '^[^?]*\\?', '')
                    ELSE '' END                                 AS query
        FROM catalog
    ), withp AS (
        SELECT host,
               split_part(query, '=', 1)                 AS pkey,
               path,
               ''                                        AS others,
               regexp_replace(query, '^[^=]*=?', '')     AS state,
               content_hash
        FROM parsed WHERE query <> ''
    ), pkeys AS (
        SELECT DISTINCT host, pkey FROM withp
    ), absent AS (
        SELECT p.host, k.pkey, p.path,
               p.query                                   AS others,
               '{_ABSENT}'                               AS state,
               p.content_hash
        FROM parsed p JOIN pkeys k ON k.host = p.host
        WHERE p.query = '' OR split_part(p.query, '=', 1) <> k.pkey
    ), groups AS (
        SELECT host, pkey, path, others,
               count(DISTINCT state)        AS ns,
               count(DISTINCT content_hash) AS nh
        FROM (SELECT * FROM withp UNION ALL SELECT * FROM absent)
        GROUP BY host, pkey, path, others
    ), rules AS (
        SELECT host, pkey AS param,
               CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS evidence_groups,
               CAST(sum(CASE WHEN ns > 1 AND nh > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS violation_groups
        FROM groups GROUP BY host, pkey
    )
"""

_RULES_ORACLE = f"""
    WITH {_SYNTH_SQL}, {_MINE_SQL}
    SELECT host, param, evidence_groups, violation_groups,
           (evidence_groups >= {MIN_SUPPORT} AND violation_groups = 0)
               AS irrelevant
    FROM rules
    ORDER BY host, param
"""

_CANON_ORACLE = f"""
    WITH {_SYNTH_SQL}, {_MINE_SQL}
    SELECT p.url AS url,
           CASE WHEN p.query <> '' AND r.param IS NULL
                THEN p.url
                ELSE 'https://' || p.host || p.path END AS canonical_url
    FROM parsed p
    LEFT JOIN (SELECT host, param FROM rules
               WHERE evidence_groups >= {MIN_SUPPORT}
                 AND violation_groups = 0) r
      ON r.host = p.host AND r.param = split_part(p.query, '=', 1)
         AND p.query <> ''
    ORDER BY url
"""

_TRAP_ORACLE = f"""
    WITH {_SYNTH_SQL},
    parsed AS (
        SELECT url, content_hash,
               regexp_extract(url, '^[a-z]+://([^/]+)', 1)      AS host,
               regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
               CASE WHEN contains(url, '?')
                    THEN regexp_replace(url, '^[^?]*\\?', '')
                    ELSE '' END                                 AS query
        FROM catalog
    ), tmpl AS (
        SELECT host,
               regexp_replace(path, '[0-9]+', 'N', 'g')
                   || CASE WHEN query <> ''
                           THEN '?' || split_part(query, '=', 1)
                           ELSE '' END          AS path_template,
               content_hash
        FROM parsed
    )
    SELECT host, path_template,
           CAST(count(*) AS BIGINT)              AS n_urls,
           count(DISTINCT content_hash)          AS n_content,
           (count(*) >= {TRAP_MIN_URLS}
            AND count(DISTINCT content_hash) * {TRAP_RATIO} <= count(*))
               AS trap
    FROM tmpl
    GROUP BY host, path_template
    ORDER BY host, path_template
"""

_REPUTATION_ORACLE = f"""
    WITH {_SYNTH_SQL}, {_MINE_SQL},
    tmpl AS (
        SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               regexp_replace(regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1),
                              '[0-9]+', 'N', 'g')
                   || CASE WHEN contains(url, '?')
                           THEN '?' || split_part(
                               regexp_replace(url, '^[^?]*\\?', ''), '=', 1)
                           ELSE '' END AS path_template,
               content_hash
        FROM catalog
    ), traps AS (
        SELECT host, CAST(count(*) AS BIGINT) AS trap_templates
        FROM (
            SELECT host, path_template,
                   count(*) AS c, count(DISTINCT content_hash) AS d
            FROM tmpl GROUP BY host, path_template
        )
        WHERE c >= {TRAP_MIN_URLS} AND d * {TRAP_RATIO} <= c
        GROUP BY host
    ), aliasr AS (
        SELECT host, CAST(count(*) AS BIGINT) AS alias_params
        FROM rules
        WHERE evidence_groups >= {MIN_SUPPORT} AND violation_groups = 0
        GROUP BY host
    ), base AS (
        SELECT host,
               CAST(count(*) AS BIGINT)      AS n_urls,
               count(DISTINCT content_hash)  AS n_content
        FROM parsed GROUP BY host
    )
    SELECT b.host AS host, b.n_urls, b.n_content,
           CAST(b.n_content AS DOUBLE) / CAST(b.n_urls AS DOUBLE)
               AS content_ratio,
           coalesce(t.trap_templates, 0) AS trap_templates,
           coalesce(a.alias_params, 0)   AS alias_params,
           (coalesce(t.trap_templates, 0) > 0
            OR (b.n_urls >= 20 AND b.n_content * 5 <= b.n_urls))
               AS low_quality
    FROM base b
    LEFT JOIN traps t ON t.host = b.host
    LEFT JOIN aliasr a ON a.host = b.host
    ORDER BY b.host
"""

QUERIES = {
    "dust_rules": dust_rules,
    "dust_canonical_urls": dust_canonical_urls,
    "url_trap_hosts": url_trap_hosts,
    "host_reputation": host_reputation,
}

ORACLE_SQL = {
    "dust_rules": _RULES_ORACLE,
    "dust_canonical_urls": _CANON_ORACLE,
    "url_trap_hosts": _TRAP_ORACLE,
    "host_reputation": _REPUTATION_ORACLE,
}
