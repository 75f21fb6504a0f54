"""RFC 9309 robots rule matching as a relational operator.

The crawl engine's robots filter (plans/frontier.py C3) historically
used the conservative deny-prefix model; RFC 9309 §2.2.2-3 specifies
the full one — ``Allow`` AND ``Disallow`` patterns with ``*`` /
trailing-``$`` wildcards, the matching rule with the longest pattern
(octets) winning and Allow beating Disallow on ties.  This module
surfaces that evaluation as a driver query: per (host, path), is the
fetch permitted?

Single source of truth: the synthetic robots.txt TEXTS below are
compiled ONCE by ``functions/robots.parse_robots_txt`` (pattern ->
portable regex of escaped literals + ``.*`` + anchors, precedence =
pattern octet length), and the SAME compiled rows are baked into both
the Spark dim and the DuckDB ``VALUES`` oracle — so equality
certifies the match/precedence arithmetic, while text->rules parsing
itself is pinned by tests/test_robots_parse.py.

Evaluation is `robots_allowed_col`: filter the per-host rule array by
regex match, take ``array_max`` over ``struct(prec, allow)`` —
lexicographic struct ordering IS the RFC precedence.  The oracle
mirrors it with ``arg_max(allow, prec * 2 + allow::int)`` (the same
total order, integer-encoded).

Scale shape: the rule dim is O(#hosts), broadcast; matching is a pure
map over candidates (exactly how the engine runs it inside
``_robots_filter`` when ``CrawlEngine(robots_texts=...)`` is given).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.robots import parse_robots_txt, robots_allowed_col

_HOST_MOD = 4

# wildcard-heavy rule files: trailing-$ anchors, mid-pattern *, an
# Allow carve-out inside a Disallow subtree, pure-prefix rules, and
# an empty (allow-all) file
TEXTS = {
    "host0.example": (
        "User-agent: *\nDisallow: /case/*9$\nAllow: /case/199$\n"
    ),
    "host1.example": (
        "User-agent: *\nDisallow: /cal/\nAllow: /cal/*/0$\n"
    ),
    "host2.example": (
        "User-agent: *\nDisallow: /case\nAllow: /case/1*\n"
    ),
    "host3.example": "",
}

COMPILED = {
    h: [(r["regex"], r["allow"], r["prec"]) for r in parse_robots_txt(t)["rules"]]
    for h, t in sorted(TEXTS.items())
}


def _paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    host = F.concat(
        F.lit("host"), (d % _HOST_MOD).cast("string"), F.lit(".example")
    )
    case = docs.select(
        host.alias("host"),
        F.concat(F.lit("/case/"), d.cast("string")).alias("path"),
    )
    cal = docs.select(
        host.alias("host"),
        F.concat(
            F.lit("/cal/"),
            (d % 40).cast("string"),
            F.lit("/"),
            (d % 7).cast("string"),
        ).alias("path"),
    )
    return case.unionByName(cal).distinct()


def robots_path_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = spark.createDataFrame(
        [(h, rules) for h, rules in COMPILED.items()],
        "host string, rules array<struct<rx:string,allow:boolean,prec:int>>",
    )
    paths = _paths(spark, sf_dir)
    return (
        paths.join(F.broadcast(dim), "host", "left")
        .select(
            "host",
            "path",
            robots_allowed_col(F.col("path"), F.col("rules")).alias("allowed"),
        )
        .orderBy("host", "path")
    )


def _rules_values() -> str:
    rows = [
        f"('{h}', '{rx}', {'TRUE' if allow else 'FALSE'}, {prec})"
        for h, rules in COMPILED.items()
        for (rx, allow, prec) in rules
    ]
    return ",\n            ".join(rows) if rows else "('', '', TRUE, 0)"


_ORACLE = f"""
    WITH paths AS (
        SELECT DISTINCT * FROM (
            SELECT 'host' || (doc_id % {_HOST_MOD}) || '.example' AS host,
                   '/case/' || doc_id                             AS path
            FROM documents
            UNION ALL
            SELECT 'host' || (doc_id % {_HOST_MOD}) || '.example',
                   '/cal/' || (doc_id % 40) || '/' || (doc_id % 7)
            FROM documents
        )
    ), rules(host, rx, allow, prec) AS (
        VALUES {_rules_values()}
    ), m AS (
        SELECT p.host, p.path,
               arg_max(r.allow, r.prec * 2 + CAST(r.allow AS INT)) AS won
        FROM paths p
        JOIN rules r
          ON r.host = p.host AND regexp_matches(p.path, r.rx)
        GROUP BY p.host, p.path
    )
    SELECT p.host AS host, p.path AS path, coalesce(m.won, TRUE) AS allowed
    FROM paths p LEFT JOIN m ON m.host = p.host AND m.path = p.path
    ORDER BY p.host, p.path
"""

QUERIES = {
    "robots_path_matching": robots_path_matching,
}

ORACLE_SQL = {
    "robots_path_matching": _ORACLE,
}
