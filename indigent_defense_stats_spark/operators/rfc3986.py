"""RFC 3986 syntax-based URL normalization as a corpus operator.

The engine's frontier already canonicalizes by crawl POLICY
(functions/urls.canonicalize_col: fragment strip, tracking params,
query sort) and by MINED equivalence rules (operators/dust.py).  This
module adds the third leg every production crawler runs underneath
both: the SPEC normalization of RFC 3986 §6.2.2 (case normalization,
percent-encoding normalization — uppercase hex digits, decode
unreserved octets — and dot-segment removal) plus §6.2.3's
scheme-based default-port rule.  Two URLs that differ only in these
dimensions are THE SAME resource by spec, so normalizing before the
URL-seen filter removes refetches no mined rule has to learn.

Three implementations must agree exactly: the pure-Python mirror and
Spark column form live in functions/urls.py (same primitive steps —
appendix-B regex split, '%'-split uppercase fold, string-fold
dot-segment stack); the DuckDB oracle here replays them with
list_reduce.  The URL universe is arithmetic in doc_id (the media
convention) and covers mixed-case schemes/hosts, default and
non-default ports, '.'/'..' segments (including above-root and
trailing), lowercase escapes of unreserved (%7e) and reserved (%2f)
octets, and fragments.

Scale shape: map-only (regex + array folds, whole-stage codegen);
zero shuffle at any corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..functions.fixtures import pick_lit as _pick
from ..functions.fixtures import sql_list_lit as _sql_lit
from ..functions.urls import UNRESERVED, rfc3986_normalize_col
from .textstats import _docs

SCHEMES = ["http", "HTTP", "https", "HTTPS"]
HOSTS = [
    "Portal.Hays.Tx.US",
    "ODYSSEY.example.COM",
    "search.Travis.tx.us",
    "WWW.Example.com",
    "M.Bexar.TX.us",
]
PORTS = ["", ":80", ":443", ":8080"]
PATHS = [
    "",
    "/",
    "/a/b/../c",
    "/./CaseDetail.aspx",
    "/x/%7euser/./y",
    "/a/b/c/../../d/%41bc",
    "/a/../../b",
    "/search/case/..",
]
QS = ["", "?CaseID=12&b=%2fx", "?b=2&a=%7e1"]
FRAGS = ["", "#RESULTS"]


def synth_url() -> Column:
    # mixing divisors are small and pairwise varied so EVERY channel
    # is reachable on the 500-row testdata (the original //640 made
    # both non-empty query variants unreachable — caught in review)
    d = F.col("doc_id")
    return F.concat(
        _pick(SCHEMES, d % 4),
        F.lit("://"),
        _pick(HOSTS, F.expr("doc_id div 4") % 5),
        _pick(PORTS, F.expr("doc_id div 7") % 4),
        _pick(PATHS, F.expr("doc_id div 3") % 8),
        _pick(QS, F.expr("doc_id div 5") % 3),
        _pick(FRAGS, d % 2),
    )


def rfc3986_canonical_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url, canon_url) over the synthesized URL universe.

    The url is projected FIRST (the lang_id projection-boundary
    discipline): the normalizer references its input ~10 times
    (appendix-B extracts + both percent folds), so inlining the synth
    expression would multiply the tree ~10x."""
    u = _docs(spark, sf_dir).select("doc_id", synth_url().alias("url"))
    return u.select(
        "doc_id", "url", rfc3986_normalize_col(F.col("url")).alias("canon_url")
    )


QUERIES = {
    "rfc3986_canonical_urls": rfc3986_canonical_urls,
}


_URL_SQL = (
    f"list_extract({_sql_lit(SCHEMES)}, CAST(doc_id % 4 AS INT) + 1)"
    " || '://' || "
    f"list_extract({_sql_lit(HOSTS)}, CAST((doc_id // 4) % 5 AS INT) + 1)"
    f" || list_extract({_sql_lit(PORTS)}, CAST((doc_id // 7) % 4 AS INT) + 1)"
    f" || list_extract({_sql_lit(PATHS)}, CAST((doc_id // 3) % 8 AS INT) + 1)"
    f" || list_extract({_sql_lit(QS)}, CAST((doc_id // 5) % 3 AS INT) + 1)"
    f" || list_extract({_sql_lit(FRAGS)}, CAST(doc_id % 2 AS INT) + 1)"
)

_RE = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?$"


def _sql_pct(s: str) -> str:
    """Uppercase-hex fold then unreserved decode — same step order and
    same fold init (first '%'-split part) as the Spark/Python forms."""
    up = (
        f"list_reduce(string_split({s}, '%'), "
        "(a, b) -> a || '%' || upper(substr(b, 1, 2)) || substr(b, 3))"
    )
    for c in UNRESERVED:
        up = f"replace({up}, '%{ord(c):02X}', '{c}')"
    return up


ORACLE_SQL = {
    "rfc3986_canonical_urls": f"""
        WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
        p AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '{_RE}', 2)) AS scheme,
                   lower(regexp_extract(url, '{_RE}', 4)) AS auth0,
                   {_sql_pct(f"regexp_extract(url, '{_RE}', 5)")} AS path0,
                   {_sql_pct(f"regexp_extract(url, '{_RE}', 7)")} AS q
            FROM u
        ),
        a AS (
            SELECT *, CASE
                WHEN scheme = 'http' AND ends_with(auth0, ':80')
                    THEN substr(auth0, 1, len(auth0) - 3)
                WHEN scheme = 'https' AND ends_with(auth0, ':443')
                    THEN substr(auth0, 1, len(auth0) - 4)
                ELSE auth0 END AS auth,
                string_split(path0, '/') AS ts
            FROM p
        ),
        d AS (
            SELECT *, list_reduce(
                list_prepend('', list_slice(ts, 2, len(ts))),
                (x, s) -> CASE WHEN s = '.' THEN x
                               WHEN s = '..'
                                   THEN regexp_replace(x, '/[^/]*$', '')
                               ELSE x || '/' || s END) AS acc
            FROM a
        ),
        e AS (
            SELECT *, CASE WHEN ts[len(ts)] IN ('.', '..')
                                AND NOT ends_with(acc, '/')
                           THEN acc || '/' ELSE acc END AS path1
            FROM d
        ),
        f AS (
            SELECT doc_id, url, scheme, auth, q,
                   CASE WHEN auth <> '' AND path1 = ''
                        THEN '/' ELSE path1 END AS path
            FROM e
        )
        SELECT doc_id, url,
               scheme || '://' || auth || path
               || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canon_url
        FROM f
    """,
}
