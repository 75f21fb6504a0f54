"""URL canonicalization — the frontier's dedup key primitive.

Generalizes the reference's case-id extraction
(/root/reference/src/scraper/__init__.py:446 ``case_url.split("=")[1]``)
into a proper canonical form: lowercase scheme+host, fragment stripped,
tracking params dropped, remaining query params sorted.

Two implementations that must agree exactly (tested):

- :func:`canonicalize` — pure Python, used by the sequential oracle.
- :func:`canonicalize_col` — native Spark column expression
  (regexp + array ops, whole-stage-codegen friendly; no Python in the
  engine's hot path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

TRACKING_PARAMS = ("ref", "session", "utm_source", "utm_campaign", "utm_medium")


def canonicalize(url: str) -> str:
    import re

    url = url.split("#", 1)[0]
    base, _, query = url.partition("?")
    m = re.match(r"^([a-zA-Z]+://[^/]*)(.*)$", base)
    if m:
        base = m.group(1).lower() + m.group(2)
    params = [
        p
        for p in query.split("&")
        if p and p.split("=", 1)[0].lower() not in TRACKING_PARAMS
    ]
    params.sort()
    return base + ("?" + "&".join(params) if params else "")


def canonicalize_col(url: Column) -> Column:
    """Native-expression mirror of :func:`canonicalize`."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    base = F.regexp_extract(no_frag, "^([^?]*)", 1)
    query = F.when(
        no_frag.contains("?"), F.regexp_replace(no_frag, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    # lowercase scheme://host portion only
    scheme_host = F.lower(F.regexp_extract(base, "^([a-zA-Z]+://[^/]*)", 1))
    path = F.regexp_replace(base, "^[a-zA-Z]+://[^/]*", "")
    base_norm = F.when(scheme_host != "", F.concat(scheme_host, path)).otherwise(base)
    tracked = F.array(*[F.lit(p) for p in TRACKING_PARAMS])
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.array_contains(
                tracked, F.lower(F.regexp_extract(p, "^([^=]*)", 1))
            ),
        )
    )
    joined = F.array_join(params, "&")
    return F.when(
        F.size(params) > 0, F.concat(base_norm, F.lit("?"), joined)
    ).otherwise(base_norm)


def absolutize(base_url: Column, href: Column) -> Column:
    """base + relative href (scraper/__init__.py:438-441 semantics)."""
    return F.when(
        href.rlike("^[a-zA-Z]+://"), href
    ).otherwise(F.concat(base_url, href))
