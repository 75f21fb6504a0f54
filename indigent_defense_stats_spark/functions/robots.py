"""robots.txt parsing — RFC 9309 groups + the de-facto ``Crawl-delay``
extension.

The crawl engine consumes compiled per-host rules (deny prefixes
broadcast as a tiny dimension, ``frontier.CrawlEngine(robots_rules=...,
crawl_delay_ms=...)``); this module produces them from raw robots.txt
bytes, so a deployment points the engine at real fetched files instead
of hand-built dicts.  The reference never fetches robots.txt (public
portal, politeness only) — this is the north-rule C3 surface.

Parsing model (RFC 9309 §2.2):

- a GROUP is one or more consecutive ``User-agent`` lines followed by
  rules; a rule line before any User-agent line is ignored;
- group selection: the group(s) whose agent token is the longest
  case-insensitive prefix of the product token win; ``*`` matches when
  no specific group does.  Multiple groups for the same agent merge;
- ``Disallow:`` with an empty value allows everything (no rule);
- TWO rule views are produced: ``deny`` (prefix-only Disallow list —
  the conservative legacy consumer, never over-blocks) and ``rules``
  (the FULL RFC 9309 §2.2.2-3 model: Allow + Disallow with ``*`` /
  trailing-``$`` wildcards compiled to portable regexes, precedence =
  pattern octet length, Allow beats Disallow on ties — evaluate with
  :func:`robots_allowed` / :func:`robots_allowed_col`);
- ``Crawl-delay: <seconds>`` (may be fractional) applies per group;
  milliseconds, rounded half-up to an int, capped at one hour;
- comments (``#`` to end of line), blank lines and unknown
  directives are tolerated and skipped;
- an unparseable or empty file yields allow-all, no delay (RFC 9309
  §2.3.1.2-4: unreachable robots means unrestricted).

Driver-side ``parse_robots_txt`` covers the bounded registry case
(hosts ≪ data); ``parse_robots_batch`` is the Arrow-batched bulk form
for a crawl that stores millions of robots files as a table.
"""

from __future__ import annotations

import re as _re

MAX_DELAY_MS = 3_600_000  # cap: one hour between requests


def pattern_to_regex(pat: str) -> str:
    """RFC 9309 §2.2.3 path pattern -> anchored regex.

    ``*`` matches any run of characters; a TRAILING ``$`` anchors the
    end of the path; every other character (including a non-trailing
    ``$``) is literal.  The output uses only escaped literals, ``.*``
    and anchors, so it evaluates identically under Java regex (Spark)
    and RE2 (DuckDB oracle)."""
    anchored = pat.endswith("$")
    body = pat[:-1] if anchored else pat
    rx = "^" + ".*".join(_re.escape(part) for part in body.split("*"))
    return rx + "$" if anchored else rx


def robots_allowed(path: str, rules: list[dict]) -> bool:
    """RFC 9309 §2.2.2 rule evaluation: the matching rule with the
    longest pattern (octets) wins; at equal length Allow beats
    Disallow; no matching rule means allowed."""
    best: tuple[int, bool] | None = None
    for r in rules:
        if _re.match(r["regex"], path):
            key = (r["prec"], r["allow"])
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def parse_robots_txt(text: str | None, agent: str = "*") -> dict:
    """Parse one robots.txt into ``{"deny": [...], "crawl_delay_ms":
    int | None, "sitemaps": [...]}`` for *agent* (product token, e.g.
    ``"ids-crawler"``).

    ``Sitemap:`` is a NON-group directive (sitemaps.org protocol /
    RFC 9309 "other records"): it applies regardless of user-agent,
    may appear before any group, and must not terminate a
    ``User-agent`` run — so it is collected globally and is
    transparent to the group machinery.  The URLs feed the sitemap
    discovery channel (sources/sitemap.py ``parse_sitemaps`` entry
    points).
    """
    if not text:
        return {"deny": [], "crawl_delay_ms": None, "sitemaps": [], "rules": []}
    agent_l = agent.lower()
    sitemaps: list[str] = []

    # pass 1: split into groups of (agent_tokens, rule_lines)
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            if val:
                sitemaps.append(val)
            continue  # transparent: does not open/close a group
        if key == "user-agent":
            if not in_agent_run and (cur_agents or cur_rules):
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agent_run = True
        else:
            in_agent_run = False
            if cur_agents:  # rules before any User-agent line: ignored
                cur_rules.append((key, val))
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    # pass 2: select groups — longest agent-token prefix match wins;
    # '*' only when no specific group matched
    def match_len(tok: str) -> int:
        if tok == "*":
            return 0
        return len(tok) if agent_l.startswith(tok) else -1

    best = max(
        (match_len(t) for agents, _ in groups for t in agents),
        default=-1,
    )
    use_star = best <= 0  # no specific (non-*) token matched
    deny: list[str] = []
    full_rules: list[tuple[str, bool]] = []
    delay_ms: int | None = None
    for agents, rules in groups:
        selected = (
            any(t == "*" for t in agents)
            if use_star
            else any(match_len(t) == best and t != "*" for t in agents)
        )
        if not selected:
            continue
        for key, val in rules:
            if key == "disallow" and val:
                deny.append(val)
                full_rules.append((val, False))
            elif key == "allow" and val:
                full_rules.append((val, True))
            elif key == "crawl-delay":
                try:
                    ms = int(round(float(val) * 1000.0))
                except ValueError:
                    continue
                if ms > 0:
                    d = min(ms, MAX_DELAY_MS)
                    delay_ms = d if delay_ms is None else max(delay_ms, d)
    # dedup, keep order (first occurrence)
    seen: set[str] = set()
    deny = [d for d in deny if not (d in seen or seen.add(d))]
    seen_sm: set[str] = set()
    sitemaps = [s for s in sitemaps if not (s in seen_sm or seen_sm.add(s))]
    seen_fr: set[tuple[str, bool]] = set()
    rules_out = [
        {
            "pattern": p,
            "regex": pattern_to_regex(p),
            "allow": a,
            "prec": len(p.encode("utf-8")),
        }
        for (p, a) in full_rules
        if not ((p, a) in seen_fr or seen_fr.add((p, a)))
    ]
    return {
        "deny": deny,
        "crawl_delay_ms": delay_ms,
        "sitemaps": sitemaps,
        "rules": rules_out,
    }


def rules_from_robots_texts(
    texts: dict[str, str | None], agent: str = "*"
) -> tuple[dict[str, list[str]], dict[str, int]]:
    """Compile {host: robots_txt} into the two CrawlEngine ctor args:
    ``robots_rules`` (host -> deny prefixes) and ``crawl_delay_ms``
    (host -> ms, only hosts that declare one)."""
    rules: dict[str, list[str]] = {}
    delays: dict[str, int] = {}
    for host, text in texts.items():
        parsed = parse_robots_txt(text, agent)
        rules[host] = parsed["deny"]
        if parsed["crawl_delay_ms"] is not None:
            delays[host] = parsed["crawl_delay_ms"]
    return rules, delays


def parse_robots_batch(agent: str = "*"):
    """Arrow-batched bulk parser for ``mapInPandas`` over a
    (host string, robots_txt string) table; output schema
    ``host string, deny array<string>, crawl_delay_ms int,
    sitemaps array<string>``.  Use when robots files are DATA
    (millions of hosts), not registry config."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            parsed = [parse_robots_txt(t, agent) for t in pdf["robots_txt"]]
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "deny": [p["deny"] for p in parsed],
                    "crawl_delay_ms": [p["crawl_delay_ms"] for p in parsed],
                    "sitemaps": [p["sitemaps"] for p in parsed],
                }
            )

    return run


def robots_allowed_col(path, rules):
    """Native-expression mirror of :func:`robots_allowed`.

    ``rules`` is an ``array<struct<rx string, allow boolean,
    prec int>>`` column (one row per host, broadcast as a tiny dim);
    NULL or empty means allow-all.  The winning rule is
    ``array_max`` over ``struct(prec, allow)`` of the matching rules
    — lexicographic struct ordering IS the RFC precedence (longest
    pattern first, Allow beats Disallow on ties, since
    false < true)."""
    import pyspark.sql.functions as F

    matched = F.filter(
        F.coalesce(
            rules, F.array().cast("array<struct<rx:string,allow:boolean,prec:int>>")
        ),
        lambda r: F.rlike(path, r["rx"]),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(r["prec"].alias("p"), r["allow"].alias("a")),
        )
    )
    return F.when(F.size(matched) == 0, F.lit(True)).otherwise(best["a"])
