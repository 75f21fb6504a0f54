"""Distributed URL frontier + fetch scheduler (the north-rule core).

Replaces the reference's strictly sequential nested crawl loop
(/root/reference/src/orchestrator/__init__.py:31-36,
/root/reference/src/scraper/__init__.py:568-588) with a wave-based
DataFrame program:

  seeds -> [wave: schedule (per-host politeness token bucket)
            -> fetch (bounded retry, linear backoff)
            -> expand (native column ops: version branch, date x
               officer cross, link extraction + canonicalization)
            -> robots filter
            -> URL-seen dedup (partitioned bloom + exact anti-join)
            -> checkpoint frontier/seen/documents/log/metrics]

Ordering contract (BASELINE.json north_rule): every URL carries the
priority tuple (prio, date_ord, jo_ord, link_ord) that encodes the
reference's depth-first order (results page link_ord=-1 sorts before
its case links, which sort before the next results page — O5).  Each
host's fetches are strictly sequential inside one ``applyInPandas``
group in that order with politeness spacing carried across waves
(host clock in ``host_state``), so:

- per-host fetch sequences sorted by priority == the reference's
  (dedup'd) sequential order, in every mode;
- with ``max_per_host_per_wave=1`` the *wall-clock* per-host order is
  the reference order exactly (strict mode);
- unrestricted waves trade wall-clock order (never cross-host
  equality, which the reference doesn't define anyway) for full
  fan-out throughput — cross-host parallelism is where N->4N scaling
  comes from (the politeness budget caps each host at 5 req/s).

Skew (one dominant county, SURVEY §4.3.1): the per-host group is the
unavoidable politeness unit; everything downstream of fetch
(expansion, dedup, parse) is re-spread via hash partitioning on
canonical_url / doc_id, so a hot host does not produce a hot
*processing* partition.

Scale notes: the frontier is a merge-on-read delta table
(sources/catalog.py:DeltaTable — the plain-parquet analog of an
Iceberg v2 table with equality deletes): a wave appends its
discoveries and the keys it retired — O(wave) I/O — and a compaction
folds deltas into a new base only when the dead fraction crosses a
threshold, so frontier maintenance is amortized O(wave), never the
O(frontier)-per-wave rewrite a copy-on-write snapshot would cost at
10^10 URLs.  On a real cluster the same call sites are ``MERGE INTO``
on an Iceberg table bucketed by ``pmod(xxhash64(canonical_url), N)``.
Fetching real HTTP swaps ``synth.fetch`` for a requests/aiohttp call
inside the same per-host group — the only per-row Python in the
engine, at the I/O boundary where each row *is* a network round-trip.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from datetime import date, timedelta

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import schemas, synth
from ..functions.urls import absolutize, canonicalize_col
from ..sources.catalog import DeltaTable, SnapshotTable
from . import bloom

POLITENESS_MS = 200  # scraper/__init__.py:57
MAX_RETRIES = 5  # scraper/helpers.py:88
AIMD_CAP = 8  # adaptive politeness: interval ceiling, x base

FETCH_OUT = StructType(
    schemas.FRONTIER.fields
    + [
        StructField("attempts", IntegerType(), False),
        StructField("fetch_ts_ms", LongType(), False),
        StructField("payload_json", StringType(), True),
        StructField("spans_json", StringType(), True),
    ]
)

HOST_STATE = StructType(
    [
        StructField("host", StringType(), False),
        StructField("clock_ms", LongType(), False),
    ]
)

SEEN = StructType([StructField("canonical_url", StringType(), False)])

_LOG_COLS = [
    ("host", StringType()),
    ("canonical_url", StringType()),
    ("county", StringType()),
    ("county_ord", IntegerType()),
    ("depth", IntegerType()),
    ("prio", IntegerType()),
    ("date_ord", IntegerType()),
    ("jo_ord", IntegerType()),
    ("link_ord", IntegerType()),
    ("status", StringType()),
    ("attempts", IntegerType()),
    ("fetch_ts_ms", LongType()),
    ("wave", IntegerType()),
    ("partition_id", IntegerType()),
]
LOG_SCHEMA = StructType([StructField(n, t, True) for n, t in _LOG_COLS])
METRICS_SCHEMA = StructType(
    [
        StructField("wave", IntegerType(), True),
        StructField("partition_id", IntegerType(), True),
        StructField("status", StringType(), True),
        StructField("n", LongType(), True),
        StructField("attempts", LongType(), True),
    ]
)

_PRIO_COLS = ["prio", "date_ord", "jo_ord", "link_ord", "canonical_url"]


def _fetch_host_group(
    politeness_ms: int,
    max_retries: int,
    generation: int = 0,
    fetch_col: str = "canonical_url",
    alias_noise: bool = False,
    mirror_noise: bool = False,
):
    """Per-host sequential fetch with token-bucket spacing.

    The row loop below is the network I/O boundary (each row is one
    HTTP round trip in production) — the politeness semantics *are*
    per-host sequential (helpers.py:93).  Everything around this
    function is columnar.

    The spacing interval is per-host: the group's ``interval_ms``
    column (the robots.txt ``Crawl-delay`` directive where a host
    declares one, else the reference-parity default) — constant
    within a group since groups ARE hosts.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_PRIO_COLS).reset_index(drop=True)
        clock = int(pdf["clock_ms"].iloc[0]) if pd.notna(pdf["clock_ms"].iloc[0]) else 0
        interval = politeness_ms
        if "interval_ms" in pdf.columns and pd.notna(pdf["interval_ms"].iloc[0]):
            interval = int(pdf["interval_ms"].iloc[0])
        attempts, ts, payloads, spans_out, statuses = [], [], [], [], []
        # under DUST alias collapse the dedup key (canonical_url) is a
        # stripped form the origin server may not serve; the fetch then
        # targets the representative's pre-strip URL (fetch_col='url')
        for url in pdf[fetch_col]:
            page = {"status": 503}
            n = 0
            for attempt in range(max_retries):
                clock += interval * (attempt + 1)  # backoff incl. first
                page = synth.fetch(
                    url, attempt, generation, alias_noise, mirror_noise
                )
                n = attempt + 1
                if page.get("status") != 503:
                    break
            ok = page.get("status") == 200
            statuses.append("fetched" if ok else "failed")
            attempts.append(n)
            ts.append(clock)
            # case pages arrive as HTML (like the real portal); span
            # extraction happens here, at the same point the reference
            # runs BeautifulSoup after its GET (parser/__init__.py:225)
            html_doc = page.pop("html", None)
            spans = synth.extract_spans(html_doc) if html_doc is not None else None
            payloads.append(json.dumps(page) if ok else None)
            spans_out.append(json.dumps(spans) if spans is not None else None)
        pdf = pdf.drop(columns=["clock_ms", "interval_ms"], errors="ignore")
        pdf["status"] = statuses
        pdf["attempts"] = attempts
        pdf["fetch_ts_ms"] = ts
        pdf["payload_json"] = payloads
        pdf["spans_json"] = spans_out
        return pdf

    return run


@dataclass
class WaveStats:
    wave: int
    fetched: int
    failed: int
    new_urls: int
    documents: int


def _lineage_writer(eng: "CrawlEngine", wave: int, fetched: DataFrame, summary):
    """Fetch-log + per-partition lineage metrics writes (C6).

    Lineage is folded from the wave summary already on the driver — no
    second cluster aggregation over the fetch output.  Both tables are
    write-only during the run (nothing the next wave reads), so the
    writes run on a background thread overlapped with the wave's tail
    and are joined before the wave ends — every snapshot exists when
    ``run()`` returns, and the resume-critical tables (frontier, seen,
    host_state) stay synchronous."""

    def write() -> None:
        eng.log_t.write(
            fetched.select(
                "host",
                "canonical_url",
                "county",
                "county_ord",
                "depth",
                "prio",
                "date_ord",
                "jo_ord",
                "link_ord",
                "status",
                "attempts",
                "fetch_ts_ms",
                "wave",
                "partition_id",
            ).coalesce(eng.n_buckets),
            {"wave": wave},
        )
        lineage: dict[tuple[int, str], tuple[int, int]] = {}
        for r in summary:
            key = (r["partition_id"], r["status"])
            n0, a0 = lineage.get(key, (0, 0))
            lineage[key] = (n0 + r["n"], a0 + (r["attempts"] or 0))
        eng.metrics_t.write(
            eng.spark.createDataFrame(
                pd.DataFrame(
                    [
                        (wave, pid, st, n, att)
                        for (pid, st), (n, att) in sorted(lineage.items())
                    ],
                    columns=["wave", "partition_id", "status", "n", "attempts"],
                ),
                "wave int, partition_id int, status string,"
                " n bigint, attempts bigint",
            ).coalesce(1),
            {"wave": wave},
        )

    return write


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        registry: list[dict],
        start_date: date,
        n_days: int,
        politeness_ms: int = POLITENESS_MS,
        max_retries: int = MAX_RETRIES,
        n_buckets: int = 16,
        bloom_bits: int = 1 << 20,
        bloom_threshold: int = 10_000,
        max_per_host_per_wave: int | None = None,
        priority: str = "reference",  # 'reference' | 'recency'
        robots_rules: dict[str, list[str]] | None = None,
        crawl_delay_ms: dict[str, int] | None = None,
        seen_filter: str = "bloom",  # 'bloom' | 'cuckoo' (north rule)
        dust_rules: "DataFrame | None" = None,
        trap_blocklist: "DataFrame | None" = None,
        alias_noise: bool = False,
        mirror_noise: bool = False,
        host_aliases: "DataFrame | None" = None,
        robots_texts: "dict[str, str] | None" = None,
        wave_budget: int | None = None,
        adaptive_politeness: bool = False,
        rfc_normalize: bool = False,
    ) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.registry = registry
        self.start_date = start_date
        self.n_days = n_days
        self.politeness_ms = politeness_ms
        self.max_retries = max_retries
        self.n_buckets = n_buckets
        self.bloom_bits = bloom_bits
        self.bloom_threshold = bloom_threshold
        self._seen_count = 0
        self.max_per_host = max_per_host_per_wave
        # global per-wave fetch budget, split ACROSS hosts max-min
        # fairly (operators/freshness.waterfill) — small hosts get
        # their full demand, big hosts share the rest at the water
        # level; composes with max_per_host (the tighter cap wins).
        # Unselected rows simply stay pending for later waves.
        self.wave_budget = wave_budget
        # default-off RFC 3986 syntax normalization (case, percent-
        # encoding, default ports, dot segments) UNDER the policy
        # canonicalizer: two spec-equivalent spellings of one URL then
        # share a canonical_url, so the seen filter drops the refetch
        # no mined DUST rule has to learn.  Off => byte-identical to
        # the reference parity path (pinned by pytest).
        self.rfc_normalize = rfc_normalize
        self.priority = priority
        assert seen_filter in ("bloom", "cuckoo")
        # note: priority only matters under a per-wave budget — with
        # unlimited fan-out every pending row fetches this wave anyway
        assert priority in ("reference", "recency")
        self.seen_filter = seen_filter
        t = lambda name, schema, mode: SnapshotTable(  # noqa: E731
            spark, os.path.join(base_dir, name), schema, mode
        )
        # pending-only merge-on-read store: fetched/failed rows leave
        # the frontier (their lineage lives in fetch_log/metrics), so
        # the table IS the work queue and a wave writes O(wave) bytes
        self.frontier_t = DeltaTable(
            spark,
            os.path.join(base_dir, "frontier"),
            schemas.FRONTIER,
            key="canonical_url",
        )
        self.host_state_t = t("host_state", HOST_STATE, "overwrite")
        # persisted bloom bits: incrementally OR-updated per wave
        # (O(wave)), never rebuilt from the full seen set — rollback
        # participates via the same wave tags so state stays in lock-
        # step with seen after a mid-wave kill
        self.bloom_t = t("bloom", bloom.BLOOM_SCHEMA, "overwrite")
        self.seen_t = t("seen", SEEN, "append")
        self.documents_t = t("documents", schemas.DOCUMENTS, "append")
        self.log_t = t("fetch_log", LOG_SCHEMA, "append")
        self.metrics_t = t("metrics", METRICS_SCHEMA, "append")
        # robots: compiled allow/deny prefix rules per host, broadcast
        # as a tiny dimension (C3; absent in the reference)
        hosts = {
            synth.portal_host(int(r["county"].replace("county", "")))
            for r in registry
        }
        rules = robots_rules or {h: synth.robots_txt(h) for h in hosts}
        self.robots_df = spark.createDataFrame(
            pd.DataFrame(
                [(h, rules.get(h, [])) for h in sorted(hosts)],
                columns=["host", "deny"],
            ),
            "host string, deny array<string>",
        )
        # full RFC 9309 matching (Allow + Disallow with */$ wildcards,
        # longest-match precedence) when raw robots.txt TEXTS are
        # provided; compiled once to a per-host regex-rule dim and
        # evaluated with robots_allowed_col.  The prefix-deny
        # robots_df above stays the default (parity + conservative)
        self._rfc_rules_df = None
        if robots_texts is not None:
            from ..functions.robots import parse_robots_txt

            rows = [
                (
                    h,
                    [
                        (r["regex"], r["allow"], r["prec"])
                        for r in parse_robots_txt(t)["rules"]
                    ],
                )
                for h, t in sorted(robots_texts.items())
            ]
            self._rfc_rules_df = spark.createDataFrame(
                rows,
                "host string, rules array<struct<rx:string,allow:boolean,prec:int>>",
            )
        # per-host politeness interval: the robots.txt ``Crawl-delay``
        # directive where a host declares one (the de-facto extension
        # next to RFC 9309 allow/deny), else the reference-parity
        # POLITENESS_MS.  A tiny O(#hosts) dimension broadcast onto the
        # wave batch; the default map is empty so every existing crawl
        # (and the ordering/URL-seen parity suite) is byte-identical.
        # crawl-hygiene hooks (operators/dust.py), both optional and
        # OFF by default so every existing crawl — and the reference-
        # ordering/URL-seen parity suite — is byte-identical:
        # - dust_rules: mine_dust_rules output; mined-irrelevant
        #   params are stripped from candidate canonical URLs, so the
        #   seen filter collapses aliases and the engine fetches ONE
        #   representative (the first-discovered candidate) per class
        # - trap_blocklist: find_url_traps output; candidates whose
        #   (host, template) is a flagged trap never enter the
        #   frontier (calendar/pagination explosion defense)
        # Both are tiny per-host dims applied broadcast + map-side.
        # synthetic-world knob: decorate case links with ignorable
        # session params (the DUST pathology the hooks above cure);
        # default off = the parity world, bit-identical
        self.alias_noise = alias_noise
        self.mirror_noise = mirror_noise
        # mirror-host collapse (operators/dedup.mirror_map_from_crawl
        # output, (alias_host, canonical_host)): candidate canonical
        # URLs on an alias host are rekeyed onto the canonical host so
        # the seen filter collapses mirror copies; the representative
        # fetch still targets the host it was discovered on.  Same
        # contract as dust_rules: tiny broadcast dim, off by default.
        self._alias_dim = None
        if host_aliases is not None:
            self._alias_dim = host_aliases.select(
                F.col("alias_host").alias("host"), "canonical_host"
            )
        self._dust_dim = None
        if dust_rules is not None:
            from ..operators.dust import irrelevant_keys_dim

            self._dust_dim = irrelevant_keys_dim(dust_rules)
        self._trap_dim = None
        if trap_blocklist is not None:
            self._trap_dim = (
                trap_blocklist.filter(F.col("trap"))
                .select("host", "path_template")
                .distinct()
            )
        self.crawl_delay_ms = {
            h: int(v) for h, v in (crawl_delay_ms or {}).items()
        }
        self._hosts = sorted(hosts)
        self._intervals_df = spark.createDataFrame(
            pd.DataFrame(
                [
                    (h, self.crawl_delay_ms.get(h, politeness_ms))
                    for h in self._hosts
                ],
                columns=["host", "interval_ms"],
            ),
            "host string, interval_ms int",
        )
        # AIMD adaptive politeness (opt-in; default = the fixed
        # per-host interval above, reference parity): a host that
        # returned ANY 503 this wave (retries or a final failure)
        # doubles its interval next wave, capped at AIMD_CAP x base;
        # an all-clean wave decays it additively (base/2 per wave)
        # back down to base.  Driver state, O(#hosts); deterministic
        # replay from the fetch log on resume (no schema change).
        self.adaptive_politeness = adaptive_politeness
        self._aimd: dict[str, int] | None = None
        # static dimensions, built once per engine (a createDataFrame
        # from a Python list pays a pickled-row Python-worker round
        # trip on *every* job that scans it — the Arrow/pandas path
        # materializes a JVM local relation instead: measured 4.7s vs
        # 0.2s per tiny write in this sandbox)
        self._counties_df = self._build_counties_df()
        self._dates_df = spark.createDataFrame(
            pd.DataFrame(
                [
                    (d, (start_date + timedelta(days=d)).strftime("%m/%d/%Y"))
                    for d in range(n_days)
                ],
                columns=["date_ord", "date_str"],
            ),
            "date_ord int, date_str string",
        )

    # ------------------------------------------------------------------
    # wave-commit protocol: the wave's writes span six tables; a marker
    # file written atomically AFTER all of them is the commit point
    # (the plain-parquet analog of Iceberg's multi-table transaction).
    # Resume rolls back any table snapshot tagged beyond the last
    # marker — a kill anywhere mid-wave leaves the store exactly at the
    # previous wave, and the wave re-runs from scratch: exactly-once
    # fetch log, no duplicate documents, politeness clocks intact.
    def _commit_wave(self, wave: int) -> None:
        d = os.path.join(self.base_dir, "commits")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".wave-{wave}.tmp")
        with open(tmp, "w") as f:
            json.dump({"wave": wave, "ts": time.time()}, f)
        os.rename(tmp, os.path.join(d, f"wave-{wave:05d}.json"))

    def _last_committed_wave(self) -> int | None:
        d = os.path.join(self.base_dir, "commits")
        if not os.path.isdir(d):
            return None
        waves = []
        for f in os.listdir(d):
            if f.startswith("wave-") and f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    waves.append(json.load(fh)["wave"])
        return max(waves) if waves else None

    def _tables(self) -> tuple:
        return (
            self.frontier_t,
            self.seen_t,
            self.documents_t,
            self.host_state_t,
            self.log_t,
            self.metrics_t,
            self.bloom_t,
        )

    def _rollback_uncommitted(self) -> None:
        last = self._last_committed_wave()
        if last is None:
            # no commit marker at all: either a fresh dir (no snapshots
            # -> no-op) or a kill during the seed writes — drop the
            # torn seed snapshots so seeding restarts atomically
            for t in self._tables():
                t.drop_snapshots(lambda m: True)
            return
        for t in self._tables():
            t.drop_snapshots(lambda m: m.get("wave", last) > last)

    # ------------------------------------------------------------------
    def _build_counties_df(self) -> DataFrame:
        rows = [
            (
                r["county"],
                ci,
                r["portal"],
                r["version"],
                r.get("notes") or "",
                synth.portal_host(int(r["county"].replace("county", ""))),
                str(r.get("scrape", "")).lower(),
            )
            for ci, r in enumerate(self.registry)
        ]
        return self.spark.createDataFrame(
            pd.DataFrame(
                rows,
                columns=[
                    "county",
                    "county_ord",
                    "portal",
                    "version",
                    "notes",
                    "host",
                    "scrape",
                ],
            ),
            "county string, county_ord int, portal string, version string,"
            " notes string, host string, scrape string",
        )

    def counties_df(self) -> DataFrame:
        return self._counties_df

    def _canon(self, url_expr) -> F.Column:
        """The frontier's canonical-URL key: policy canonicalization
        (fragment/tracking/query-sort), optionally over the RFC 3986
        spec normalizer (functions/urls.rfc3986_normalize_col) when
        ``rfc_normalize=True``."""
        if self.rfc_normalize:
            from ..functions.urls import rfc3986_normalize_col

            url_expr = rfc3986_normalize_col(url_expr)
        return canonicalize_col(url_expr)

    def seeds(self) -> DataFrame:
        """Wave-0 frontier: login POST (when notes carry PUBLICLOGIN#,
        scraper/__init__.py:254-263) + portal main page, per active
        county (S1 filter, orchestrator/__init__.py:27)."""
        def seed_rows(df: DataFrame, url_expr, depth: int, prio: int) -> DataFrame:
            return df.select(
                url_expr.alias("url"),
                self._canon(url_expr).alias("canonical_url"),
                "host",
                "county",
                "county_ord",
                F.lit(depth).alias("depth"),
                F.lit(prio).alias("prio"),
                F.lit(-1).alias("date_ord"),
                F.lit(-1).alias("jo_ord"),
                F.lit(-1).alias("link_ord"),
                F.lit(None).cast("date").alias("case_date"),
                F.lit("pending").alias("status"),
                F.lit(0).alias("wave"),
            )

        c = self.counties_df().filter(F.col("scrape") == "yes")
        main = seed_rows(c, F.col("portal"), depth=1, prio=1)
        login = seed_rows(
            c.filter(F.col("notes").contains("PUBLICLOGIN#")),
            F.concat("portal", F.lit("login.aspx")),
            depth=0,
            prio=0,
        )
        # robots applies to seeds too (login/main pages), not only to
        # expanded candidates — a deny-all host must never be fetched
        return self._robots_filter(login.unionByName(main))

    # ------------------------------------------------------------------
    def _eligible(self, pending: DataFrame) -> DataFrame:
        caps = None
        if self.wave_budget is not None:
            from ..operators.freshness import waterfill

            demand = pending.groupBy("host").agg(
                F.count(F.lit(1)).cast("long").alias("demand")
            )
            caps = waterfill(demand, self.wave_budget).select(
                "host", F.col("allocation").alias("__cap")
            )
        if self.max_per_host is None and caps is None:
            return pending
        if self.priority == "recency":
            order = [F.col("case_date").desc_nulls_last(), F.col("depth").asc()] + [
                F.col(c) for c in _PRIO_COLS
            ]
        else:
            order = [F.col(c) for c in _PRIO_COLS]
        w = Window.partitionBy("host").orderBy(*order)
        out = pending
        if caps is not None:
            out = out.join(F.broadcast(caps), "host", "left")
            cap = F.coalesce(F.col("__cap"), F.lit(0))
            if self.max_per_host is not None:
                cap = F.least(cap, F.lit(self.max_per_host))
        else:
            cap = F.lit(self.max_per_host)
        return (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn", "__cap")
        )

    def _write_host_state_local(self, wave: int) -> None:
        """Host-clock checkpoint: O(#hosts) rows — a pyarrow driver
        write under the same snapshot protocol (a Spark job to move a
        few KB costs ~0.5s/wave in this sandbox; at 10^5 hosts the
        table is still ~MBs, driver-sized by construction)."""
        import pyarrow as pa

        items = sorted(self._clocks.items()) or [("__none__", 0)]
        t = pa.table(
            {
                "host": pa.array([h for h, _ in items], pa.string()),
                "clock_ms": pa.array([int(c) for _, c in items], pa.int64()),
            }
        )
        self.host_state_t.write_local(t, {"wave": wave})

    def _append_seen_from_adds(self, delta_snap: int, wave: int) -> None:
        """Seen-set append derived from the frontier delta's just-
        written adds files: the seen rows ARE the adds' canonical_urls,
        so re-running the expand/dedup plan (a second Spark job) to
        produce them is pure waste.  Small deltas copy the column
        driver-side (pyarrow column read of files already on disk);
        large ones fall back to a Spark job so the driver never
        materializes an unbounded wave."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..sources.catalog import parquet_dir_bytes

        d = self.frontier_t.adds_dir(delta_snap)
        if d is None:
            return
        if parquet_dir_bytes(d) <= 64 * 1024 * 1024:
            parts = [
                pq.read_table(
                    os.path.join(d, n), columns=["canonical_url"]
                )
                for n in sorted(os.listdir(d))
                if n.startswith("part-") and n.endswith(".parquet")
            ]
            self.seen_t.write_local(
                pa.concat_tables(parts), {"wave": wave}
            )
        else:
            self.seen_t.write(
                self.spark.read.parquet(d)
                .select("canonical_url")
                .coalesce(self.n_buckets),
                {"wave": wave},
            )

    def _update_bloom_state(self, snap: int, wave: int) -> None:
        """OR the snapshot's adds into the persisted bloom bits.

        The adds parquet already carries (bucket, h1, h2) — computed
        as JVM expressions inside the wave's write job — so the update
        is a driver-side numpy pass over three int64 columns plus a
        pyarrow state write: O(adds) rows of metadata-cheap I/O, no
        Spark job, no hashing.  Oversized deltas (> 64 MB) fall back
        to the distributed ``bloom.update_state`` job so the driver
        never materializes an unbounded wave."""
        if self.seen_filter != "bloom":
            return  # cuckoo path builds its own filter (test surface)
        d = self.frontier_t.adds_dir(snap)
        if d is None:
            return
        from ..sources.catalog import parquet_dir_bytes

        if parquet_dir_bytes(d) > 64 * 1024 * 1024:
            state = bloom.update_state(
                self.bloom_t.read(),
                self.spark.read.parquet(d),
                "canonical_url",
                self.n_buckets,
                self.bloom_bits,
            )
            self.bloom_t.write(state.coalesce(1), {"wave": wave})
            return

        import pyarrow as pa
        import pyarrow.parquet as pq

        import numpy as np

        parts = [
            pq.read_table(os.path.join(d, n), columns=["bucket", "h1", "h2"])
            for n in sorted(os.listdir(d))
            if n.startswith("part-") and n.endswith(".parquet")
        ]
        t = pa.concat_tables(parts)
        state: dict[int, np.ndarray] = {}
        prev = self.bloom_t.latest()
        if prev is not None:
            data_dir = os.path.join(self.bloom_t._snap_dir(prev), "data")
            for n in sorted(os.listdir(data_dir)):
                if n.startswith("part-") and n.endswith(".parquet"):
                    st = pq.read_table(os.path.join(data_dir, n))
                    for b, bits in zip(
                        st["bucket"].to_pylist(), st["bits"].to_pylist()
                    ):
                        state[int(b)] = np.frombuffer(
                            bits, dtype=np.uint8
                        ).copy()
        bucket = t["bucket"].to_numpy()
        idx_all = bloom._indices(
            t["h1"].to_numpy(), t["h2"].to_numpy(), self.bloom_bits
        )
        for b in np.unique(bucket):
            bits = state.get(int(b))
            if bits is None:
                bits = np.zeros(self.bloom_bits // 8, dtype=np.uint8)
                state[int(b)] = bits
            idx = idx_all[bucket == b].ravel()
            np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        out = pa.table(
            {
                "bucket": pa.array(sorted(state), pa.int32()),
                "bits": pa.array(
                    [state[b].tobytes() for b in sorted(state)], pa.binary()
                ),
            }
        )
        self.bloom_t.write_local(out, {"wave": wave})

    # ---------------------------------------------------------- AIMD
    def _aimd_base(self, host: str) -> int:
        return self.crawl_delay_ms.get(host, self.politeness_ms)

    def _aimd_update(self, per_host: dict[str, tuple[int, int, int]]) -> None:
        """per_host: host -> (rows, total_attempts, failed_rows)."""
        assert self._aimd is not None
        for h, (n, att, failed) in sorted(per_host.items()):
            base = self._aimd_base(h)
            cur = self._aimd.get(h, base)
            if failed or att > n:  # some request saw a 503 this wave
                cur = min(cur * 2, base * AIMD_CAP)
            else:
                cur = max(base, cur - (base + 1) // 2)
            self._aimd[h] = cur

    def _aimd_replay(self) -> None:
        """Rebuild the interval state from the fetch log (resume path):
        the state is a pure function of per-wave per-host outcomes, so
        replaying the bounded (wave x host) aggregate reproduces it
        exactly — no extra checkpoint table needed."""
        self._aimd = {}
        log = self.fetch_log()
        if log is None:
            return
        rows = (
            log.groupBy("wave", "host")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("attempts").alias("att"),
                F.sum(
                    F.when(F.col("status") == "failed", 1).otherwise(0)
                ).alias("failed"),
            )
            .orderBy("wave")
            .collect()
        )
        by_wave: dict[int, dict[str, tuple[int, int, int]]] = {}
        for r in rows:
            by_wave.setdefault(r["wave"], {})[r["host"]] = (
                r["n"],
                r["att"],
                r["failed"],
            )
        for w in sorted(by_wave):
            self._aimd_update(by_wave[w])

    def _current_intervals_df(self) -> DataFrame:
        if self._aimd is None:
            return self._intervals_df
        return self.spark.createDataFrame(
            pd.DataFrame(
                [
                    (h, self._aimd.get(h, self._aimd_base(h)))
                    for h in self._hosts
                ],
                columns=["host", "interval_ms"],
            ),
            "host string, interval_ms int",
        ).coalesce(1)

    def _host_state_df(self) -> DataFrame:
        # Arrow/pandas path + coalesce(1): O(#hosts) rows, one file,
        # no Python-worker round trip per downstream job
        return self.spark.createDataFrame(
            pd.DataFrame(
                list(self._clocks.items()) or [("__none__", 0)],
                columns=["host", "clock_ms"],
            ),
            HOST_STATE,
        ).coalesce(1)

    def _fetch(
        self, eligible: DataFrame, wave: int, generation: int = 0
    ) -> DataFrame:
        hs = self._host_state_df()
        batch = (
            eligible.join(F.broadcast(hs), "host", "left")
            .withColumn("clock_ms", F.coalesce(F.col("clock_ms"), F.lit(0)))
            .join(F.broadcast(self._current_intervals_df()), "host", "left")
            .withColumn(
                "interval_ms",
                F.coalesce(F.col("interval_ms"), F.lit(self.politeness_ms)),
            )
        )
        # (Measured: pre-partitioning hosts at finer grain — 8x cores —
        # to shave the ~3x straggler skew of 254 hosts in 32 tasks LOSES
        # net throughput here: extra task/Arrow-batch overhead exceeds
        # the balance gain.  Revisit on a real cluster where tasks are
        # cheaper relative to fetch CPU.)
        fetched = batch.groupBy("host").applyInPandas(
            _fetch_host_group(
                self.politeness_ms,
                self.max_retries,
                generation,
                # see _apply_hygiene: with dust/mirror collapse on,
                # 'url' always holds the representative's pre-collapse
                # canonical, which is what the origin can serve
                fetch_col=(
                    "url"
                    if (self._dust_dim is not None or self._alias_dim is not None)
                    else "canonical_url"
                ),
                alias_noise=self.alias_noise,
                mirror_noise=self.mirror_noise,
            ),
            schema=FETCH_OUT,
        )
        return fetched.withColumn("wave", F.lit(wave)).withColumn(
            "partition_id", F.spark_partition_id()
        )

    def _expand(self, fetched: DataFrame, wave: int) -> DataFrame:
        """Discoveries -> candidate frontier rows (all native exprs)."""
        c = self.counties_df().select("county", "version", "portal")
        dates_df = self._dates_df

        base = fetched.filter(F.col("status") == "fetched")

        # main page -> search URL (version branch, scraper:337-342)
        main = (
            base.filter(F.col("depth") == 1)
            .join(F.broadcast(c), "county")
            .withColumn(
                "payload",
                F.from_json("payload_json", "search_id INT"),
            )
            .select(
                F.when(
                    F.col("version").startswith("2017"),
                    F.concat("portal", F.lit("Home/Dashboard/26")),
                )
                .otherwise(
                    F.concat(
                        "portal",
                        F.lit("Search.aspx?ID="),
                        F.col("payload.search_id").cast("string"),
                    )
                )
                .alias("url"),
                "host",
                "county",
                "county_ord",
                F.lit(2).alias("depth"),
                F.lit(2).alias("prio"),
                F.lit(-1).alias("date_ord"),
                F.lit(-1).alias("jo_ord"),
                F.lit(-1).alias("link_ord"),
                F.lit(None).cast("date").alias("case_date"),
            )
        )

        # search page -> dates x officers results URLs (scraper:571-588)
        jo_schema = "search_id INT, jo_list ARRAY<STRUCT<name STRING, id INT>>"
        search = (
            base.filter(F.col("depth") == 2)
            .join(F.broadcast(c), "county")
            .withColumn("payload", F.from_json("payload_json", jo_schema))
            .select(
                "host",
                "county",
                "county_ord",
                "portal",
                F.col("payload.search_id").alias("sid"),
                F.posexplode("payload.jo_list").alias("jo_ord", "jo"),
            )
            .crossJoin(F.broadcast(dates_df))
            .select(
                F.concat(
                    "portal",
                    F.lit("Search.aspx?ID="),
                    F.col("sid").cast("string"),
                    F.lit("&DateFiled="),
                    "date_str",
                    F.lit("&JudicialOfficer="),
                    F.col("jo.id").cast("string"),
                ).alias("url"),
                "host",
                "county",
                "county_ord",
                F.lit(3).alias("depth"),
                F.lit(3).alias("prio"),
                "date_ord",
                "jo_ord",
                F.lit(-1).alias("link_ord"),
                F.to_date("date_str", "MM/dd/yyyy").alias("case_date"),
            )
        )

        # results page -> case links (DOM order), absolutize+canonicalize
        results = (
            base.filter(F.col("depth") == 3)
            .join(F.broadcast(c), "county")
            .withColumn(
                "payload", F.from_json("payload_json", "case_links ARRAY<STRING>")
            )
            .select(
                "host",
                "county",
                "county_ord",
                "portal",
                "date_ord",
                "jo_ord",
                "case_date",
                F.posexplode("payload.case_links").alias("link_ord", "href"),
            )
            .select(
                # absolutize, not blind concat: real portals emit some
                # absolute hrefs (scraper/__init__.py:438-441 semantics)
                absolutize(F.col("portal"), F.col("href")).alias("url"),
                "host",
                "county",
                "county_ord",
                F.lit(4).alias("depth"),
                F.lit(3).alias("prio"),  # shares class 3 with results (O5)
                "date_ord",
                "jo_ord",
                "link_ord",
                "case_date",
            )
        )

        cand = main.unionByName(search).unionByName(results)
        cand = cand.withColumn("canonical_url", self._canon(F.col("url")))
        # host := the URL's own authority — an ABSOLUTE href may point
        # off the parent page's host (e.g. a mirror); politeness,
        # robots and the per-host dims must attribute such candidates
        # to the host that will actually serve them.  Relative hrefs
        # (the reference world) resolve to the parent host: unchanged.
        url_host = F.regexp_extract(F.col("canonical_url"), "^[a-z]+://([^/]+)", 1)
        cand = cand.withColumn(
            "host", F.when(url_host != "", url_host).otherwise(F.col("host"))
        )
        cand = self._apply_hygiene(cand)
        return cand.withColumn("status", F.lit("pending")).withColumn(
            "wave", F.lit(wave + 1)
        )

    def _apply_hygiene(self, cand: DataFrame) -> DataFrame:
        """Optional DUST alias collapse + trap-template blocklist on
        expanded candidates (never on seeds); see __init__.  Both are
        broadcast joins over per-host dims — map-side, no shuffle."""
        if self._dust_dim is not None or self._alias_dim is not None:
            # fetch target := the pre-collapse canonical (served by
            # the origin; tracking params/fragments already removed);
            # dedup key := the collapsed canonical built below
            cand = cand.withColumn("url", F.col("canonical_url"))
        if self._dust_dim is not None:
            from ..operators.dust import strip_params_col

            cand = (
                cand.join(F.broadcast(self._dust_dim), "host", "left")
                .withColumn(
                    "canonical_url",
                    strip_params_col(F.col("canonical_url"), F.col("irr_keys")),
                )
                .drop("irr_keys")
            )
        if self._alias_dim is not None:
            # rekey the canonical URL onto the canonical host (dedup
            # only; 'host'/'url' keep the discovered host for fetch +
            # politeness)
            scheme = F.regexp_extract(F.col("canonical_url"), "^([a-z]+://)", 1)
            rest = F.regexp_replace(
                F.col("canonical_url"), "^[a-z]+://[^/]*", ""
            )
            cand = (
                cand.join(F.broadcast(self._alias_dim), "host", "left")
                .withColumn(
                    "canonical_url",
                    F.when(
                        F.col("canonical_host").isNotNull(),
                        F.concat(scheme, F.col("canonical_host"), rest),
                    ).otherwise(F.col("canonical_url")),
                )
                .drop("canonical_host")
            )
        if self._trap_dim is not None:
            from ..operators.dust import template_col

            cand = (
                cand.withColumn(
                    "path_template", template_col(F.col("canonical_url"))
                )
                .join(
                    F.broadcast(self._trap_dim),
                    ["host", "path_template"],
                    "left_anti",
                )
                .drop("path_template")
            )
        return cand

    def _robots_filter(self, df: DataFrame) -> DataFrame:
        """robots.txt filter on the URL path (C3), per host: full RFC
        9309 rule evaluation when raw texts were provided
        (``robots_texts=``), else the conservative deny-prefix dim."""
        path = F.regexp_replace("canonical_url", "^[a-z]+://[^/]*", "")
        if self._rfc_rules_df is not None:
            from ..functions.robots import robots_allowed_col

            return (
                df.join(F.broadcast(self._rfc_rules_df), "host", "left")
                .withColumn("__path", path)
                .filter(robots_allowed_col(F.col("__path"), F.col("rules")))
                .drop("rules", "__path")
            )
        return (
            df.join(F.broadcast(self.robots_df), "host", "left")
            .withColumn("__path", path)
            .filter(
                F.col("deny").isNull()
                | ~F.exists("deny", lambda p: F.col("__path").startswith(p))
            )
            .drop("deny", "__path")
        )

    def _dedup(self, candidates: DataFrame) -> DataFrame:
        """Within-batch first-discovery dedup + robots + bloom seen."""
        w = Window.partitionBy("canonical_url").orderBy(
            "county_ord", "prio", "date_ord", "jo_ord", "link_ord"
        )
        cand = (
            candidates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        cand = self._robots_filter(cand)
        seen = self.seen_t.read()
        if seen is None:
            return cand
        # Adaptive seen-filter: below the threshold a plain exact
        # anti-join is cheaper than building+probing blooms (3 extra
        # exchanges); above it — the 10^10-URL regime — the partitioned
        # bloom pre-filter keeps the anti-join shuffle to bloom
        # positives only (true dups + fp rate).
        if self._seen_count <= self.bloom_threshold:
            return cand.join(seen, "canonical_url", "left_anti")
        if self.seen_filter == "cuckoo":
            from . import cuckoo

            return cuckoo.filter_new(
                cand,
                seen,
                "canonical_url",
                self.n_buckets,
                n_keys_hint=max(self._seen_count, 1),
            )
        # probe the PERSISTED bloom state (maintained incrementally per
        # wave) — no O(seen) filter rebuild inside the wave's plan
        state = self.bloom_t.read()
        if state is None:  # e.g. filter switched on mid-crawl
            return bloom.filter_new(
                cand, seen, "canonical_url", self.n_buckets, self.bloom_bits
            )
        return bloom.filter_new_with_state(
            cand, seen, state, "canonical_url", self.n_buckets, self.bloom_bits
        )

    # ------------------------------------------------------------------
    def run(self, max_waves: int = 200, verbose: bool = False) -> list[WaveStats]:
        # the writer pool (lineage + docs + removes overlap) lives for
        # one run() and is shut down on exit (leaked pools pin threads)
        with ThreadPoolExecutor(max_workers=3) as pool:
            self._pool = pool
            return self._run(max_waves, verbose)

    def _run(self, max_waves: int, verbose: bool) -> list[WaveStats]:
        stats: list[WaveStats] = []
        t_last = time.time()

        def mark(label: str) -> None:
            nonlocal t_last
            if verbose:
                now = time.time()
                print(f"    [{label}] {now - t_last:.2f}s", flush=True)
                t_last = now
        self._rollback_uncommitted()
        last_gc = self._last_committed_wave()
        if last_gc is not None:
            # snapshots older than the newest committed base are
            # unreachable after rollback — reclaim them
            self.frontier_t.gc(last_gc)
        frontier = self.frontier_t.read()
        if frontier is None:
            # one Spark action: the seed write; the seen set is the
            # seeds' canonical_urls, copied from the written base files
            # driver-side (same derivation as the per-wave path)
            base_snap = self.frontier_t.write_base(
                bloom.with_bucket_and_hashes(
                    self.seeds(), "canonical_url", self.n_buckets
                ).coalesce(1),
                {"wave": -1, "event": "seed"},
            )
            self._append_seen_from_adds(base_snap, -1)
            self._update_bloom_state(base_snap, -1)
            self._commit_wave(-1)
            frontier = self.frontier_t.read()
        # resume numbering: after the rollback above every surviving
        # snapshot (and therefore every pending row's wave tag) is ≤
        # the last committed wave, so last_committed+1 is BOTH the
        # collision-free floor and the exact next wave — no Spark agg
        # over the frontier needed.  (Fresh seed commits wave -1 ->
        # first wave is 0.)
        last = self._last_committed_wave()
        wave = (last if last is not None else -1) + 1
        # politeness clocks: in-memory during the run, checkpointed per
        # wave, reloaded on resume (skip the collect entirely on a
        # fresh crawl — no snapshot, no job)
        self._clocks = {}
        if self.host_state_t.latest() is not None:
            self._clocks = {
                r["host"]: r["clock_ms"]
                for r in self.host_state_t.read().collect()
                if r["host"] != "__none__"
            }
        self._seen_count = self.seen_t.rowcount()  # footer metadata, no job
        if self.adaptive_politeness:
            self._aimd_replay()  # deterministic from the fetch log
        # pending cardinality is tracked driver-side across waves
        # (n_pending += new - fetched - failed), initialized from
        # parquet footer metadata — no Spark job
        n_pending = self.frontier_t.live_rowcount()
        # max_waves bounds waves run in THIS call (an absolute bound
        # would make a crawl resumed past it permanently stall)
        end_wave = wave + max_waves
        while wave < end_wave and n_pending > 0:
            # merge-on-read: base ∪ delta-adds, anti-join delta-removes
            # — the table holds pending rows only
            pending = self.frontier_t.read()
            mark("read")
            eligible = self._eligible(pending).cache()
            fetched = self._fetch(eligible, wave).cache()
            try:
                # ONE action materializes the cache and yields wave stats,
                # per-host clocks, AND per-partition lineage (hosts and
                # partitions are bounded, so the driver-side merge is fine
                # even at 10^5 hosts)
                summary = (
                    fetched.groupBy(
                        "status",
                        (F.col("depth") == 4).alias("is_case"),
                        "host",
                        "partition_id",
                    )
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.max("fetch_ts_ms").alias("clock"),
                        F.sum("attempts").alias("attempts"),
                    )
                    .collect()
                )
                n_fetched = sum(r["n"] for r in summary if r["status"] == "fetched")
                n_failed = sum(r["n"] for r in summary if r["status"] == "failed")
                n_docs = sum(
                    r["n"] for r in summary if r["status"] == "fetched" and r["is_case"]
                )
                clocks: dict[str, int] = {}
                for r in summary:
                    clocks[r["host"]] = max(clocks.get(r["host"], 0), r["clock"])
                if self._aimd is not None:
                    per_host: dict[str, tuple[int, int, int]] = {}
                    for r in summary:
                        n0, a0, f0 = per_host.get(r["host"], (0, 0, 0))
                        per_host[r["host"]] = (
                            n0 + r["n"],
                            a0 + r["attempts"],
                            f0 + (r["n"] if r["status"] == "failed" else 0),
                        )
                    self._aimd_update(per_host)
                mark("fetch")
                lineage_future = self._pool.submit(
                    _lineage_writer(self, wave, fetched, summary)
                )

                # documents append (S6 sink) overlaps the expand/dedup/
                # delta chain in the writer pool (thread-safe concurrent
                # Spark jobs; both read the cached `fetched`)
                docs_future = None
                if n_docs:
                    docs = (
                        fetched.filter(
                            (F.col("depth") == 4) & (F.col("status") == "fetched")
                        )
                        .select(
                            F.regexp_extract(
                                "canonical_url", "CaseID=(\\d+)", 1
                            ).alias("doc_id"),
                            "county",
                            F.from_json(
                                "spans_json",
                                "ARRAY<STRUCT<kind STRING, text STRING,"
                                " media_ref STRING, offset INT>>",
                            ).alias("spans"),
                        )
                        .coalesce(self.n_buckets)
                    )
                    docs_future = self._pool.submit(
                        self.documents_t.write, docs, {"wave": wave}
                    )

                candidates = self._expand(fetched, wave)
                new_pending = self._dedup(candidates)
                mark("expand+dedup plan")

                # frontier state transition as an O(wave) delta: the
                # wave's eligible keys are retired (every eligible row
                # came back fetched or failed) and the deduped
                # discoveries are appended — the full pending set is
                # never rewritten (VERDICT r1 item 3).  The write IS the
                # materialization: n_new comes from the written parquet
                # footers (driver metadata read), not a separate count
                # job over a cached plan.
                froncols = [f.name for f in schemas.FRONTIER.fields]
                n_removed = n_fetched + n_failed
                # adds carry (bucket, h1, h2) as extra parquet columns —
                # free JVM exprs inside the write job; the driver-side
                # bloom update then needs no hashing and no Spark job
                adds_hashed = bloom.with_bucket_and_hashes(
                    new_pending.select(*froncols), "canonical_url", self.n_buckets
                )
                delta_snap = self.frontier_t.write_delta(
                    adds=adds_hashed.coalesce(self.n_buckets),
                    removes=eligible.select("canonical_url").coalesce(1),
                    meta={"wave": wave},
                    n_removes=n_removed,
                    pool=self._pool,
                )
                n_new = self.frontier_t.adds_rowcount(delta_snap)
                # amortized compaction: fold deltas into a new base once
                # dead rows outnumber live ones, so merge-on-read cost
                # stays bounded while per-wave write cost stays O(wave)
                n_after = n_pending + n_new - n_removed
                if self.frontier_t.removes_outstanding() > max(n_after, 256):
                    self.frontier_t.compact({"wave": wave, "event": "compact"})
                mark("frontier write")
                bloom_future = None
                if n_new:
                    self._append_seen_from_adds(delta_snap, wave)
                    self._seen_count += n_new
                    # bloom maintenance is O(wave) and overlaps the
                    # tail of the wave in the writer pool; joined
                    # before the commit marker
                    bloom_future = self._pool.submit(
                        self._update_bloom_state, delta_snap, wave
                    )

                # host clocks carry politeness budget across waves
                # (merged driver-side from the wave summary collect);
                # the table is O(#hosts) — pyarrow local write, no job
                for h, c in clocks.items():
                    self._clocks[h] = max(self._clocks.get(h, 0), c)
                self._write_host_state_local(wave)
                mark("seen+host_state")

                stats.append(WaveStats(wave, n_fetched, n_failed, n_new, n_docs))
                lineage_future.result()
                if docs_future is not None:
                    docs_future.result()
                if bloom_future is not None:
                    bloom_future.result()
                mark("log+metrics+docs join")
                self._commit_wave(wave)
            finally:
                eligible.unpersist()
                fetched.unpersist()
            n_pending += n_new - n_fetched - n_failed
            wave += 1
        return stats

    # ------------------------------------------------------------------
    def refresh(
        self, generation: int, case_filter: DataFrame | None = None
    ) -> DataFrame:
        """Distributed analog of the reference's updater refresh flow
        (updater/__init__.py:69-129 re-runs known cases through scrape
        -> clean -> hash-skip/version upsert): re-fetch every KNOWN
        case-detail page at ``generation`` and append the new
        snapshots, committed as one wave.  Returns the refreshed
        documents (doc_id, county, spans) for the parse -> publish
        chain — publish's content-hash anti-join then skips unchanged
        pages and versions changed ones, exactly the updater's
        semantics, set-based.

        ``case_filter`` (a DataFrame with a ``doc_id`` column, e.g.
        the staleness-ranked seeds from
        operators/freshness.recrawl_priority) restricts the refetch to
        those cases — the rate-proportional refresh policy (Cho &
        Garcia-Molina) instead of the reference's refetch-everything
        default; applied as a broadcast semi-join on the seed scan, so
        the politeness budget is spent only on the selected pages.

        What a refresh deliberately does NOT touch: frontier, seen,
        bloom — it discovers nothing (case pages expand to nothing;
        re-listing a known URL is not a discovery).  Politeness clocks
        carry on from the crawl via host_state, so the refresh fetch
        is paced like any wave.  Scale shape: the seed set is the
        fetch_log's case rows (one partition-pruned scan at 10^10
        URLs when the log is an Iceberg table partitioned by depth),
        and the fetch is the same per-host ``applyInPandas`` group as
        the crawl — O(known cases) work, zero frontier rewrites."""
        self._rollback_uncommitted()
        last = self._last_committed_wave()
        wave = (last if last is not None else -1) + 1
        if not getattr(self, "_clocks", None):
            self._clocks = {}
            if self.host_state_t.latest() is not None:
                self._clocks = {
                    r["host"]: r["clock_ms"]
                    for r in self.host_state_t.read().collect()
                    if r["host"] != "__none__"
                }
        seeds = (
            self.log_t.read()
            .filter((F.col("depth") == 4) & (F.col("status") == "fetched"))
            .select(
                "canonical_url",
                "host",
                "county",
                "county_ord",
                "depth",
                "prio",
                "date_ord",
                "jo_ord",
                "link_ord",
            )
            .distinct()
            .select(
                F.col("canonical_url").alias("url"),
                "canonical_url",
                "host",
                "county",
                "county_ord",
                "depth",
                "prio",
                "date_ord",
                "jo_ord",
                "link_ord",
                F.lit(None).cast("date").alias("case_date"),
                F.lit("pending").alias("status"),
                F.lit(wave).alias("wave"),
            )
        )
        if case_filter is not None:
            wanted = case_filter.select(
                F.col("doc_id").cast("string").alias("__want_id")
            ).distinct()
            seeds = seeds.join(
                F.broadcast(wanted),
                F.regexp_extract("canonical_url", "CaseID=(\\d+)", 1)
                == F.col("__want_id"),
                "left_semi",
            )
        fetched = self._fetch(seeds, wave, generation).cache()
        try:
            summary = (
                fetched.groupBy("status", "host", "partition_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.max("fetch_ts_ms").alias("clock"),
                    F.sum("attempts").alias("attempts"),
                )
                .collect()
            )
            _lineage_writer(self, wave, fetched, summary)()
            docs = (
                fetched.filter(
                    (F.col("depth") == 4) & (F.col("status") == "fetched")
                )
                .select(
                    F.regexp_extract("canonical_url", "CaseID=(\\d+)", 1).alias(
                        "doc_id"
                    ),
                    "county",
                    F.from_json(
                        "spans_json",
                        "ARRAY<STRUCT<kind STRING, text STRING,"
                        " media_ref STRING, offset INT>>",
                    ).alias("spans"),
                )
                .coalesce(self.n_buckets)
                # one materialization feeds the table write AND the
                # caller's parse -> publish chain (pin-shared-subplans)
                .localCheckpoint(eager=True)
            )
            self.documents_t.write(docs, {"wave": wave, "generation": generation})
            for r in summary:
                self._clocks[r["host"]] = max(
                    self._clocks.get(r["host"], 0), r["clock"]
                )
            self._write_host_state_local(wave)
            self._commit_wave(wave)
        finally:
            fetched.unpersist()
        return docs

    # ------------------------------------------------------------------
    # equality-check accessors
    def fetch_log(self) -> DataFrame:
        return self.log_t.read_or_empty()

    def priority_sorted_log(self) -> list[tuple[str, str]]:
        """[(host, canonical_url)] in the reference's logical order."""
        rows = (
            self.fetch_log()
            .orderBy("county_ord", "prio", "date_ord", "jo_ord", "link_ord")
            .select("host", "canonical_url")
            .collect()
        )
        return [(r["host"], r["canonical_url"]) for r in rows]

    def wallclock_host_sequences(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for r in self.fetch_log().orderBy("fetch_ts_ms").collect():
            out.setdefault(r["host"], []).append(r["canonical_url"])
        return out

    def seen_urls(self) -> set[str]:
        return {
            r["canonical_url"]
            for r in self.seen_t.read_or_empty().distinct().collect()
        }

    def documents(self) -> DataFrame:
        return self.documents_t.read_or_empty()


def _paced_fetch_partition(
    politeness_ms: int,
    fetch_only: bool,
    crawl_delay_ms: dict[int, int] | None = None,
):
    """Wall-clock politeness fetch over a partition holding MANY host
    streams: round-robin interleaving via an earliest-deadline heap.

    The engine's wave loop uses a *virtual* clock (the ordering/budget
    semantics, reproducible in tests); this is the deployment-mode
    pacing where each host's requests are really spaced
    ``politeness_ms`` apart in wall time.  One task serves all its
    hosts concurrently: while host A waits out its interval the worker
    fetches B, C, ... — so a task sustains ``hosts_in_task * (1000 /
    politeness_ms)`` req/s as long as per-request CPU fits inside the
    interval (synthetic fetch: ~0.3 ms vs the 200 ms interval, so one
    core paces hundreds of hosts).  With every host owning a stream
    somewhere, cluster throughput pins to the POLITENESS CEILING
    ``n_hosts * 1000/politeness_ms`` regardless of cores — measured in
    BENCH/BASELINE.md (job `politeness`), which is the production
    scaling regime: you add executors for more hosts, not for more
    speed per host (helpers.py:93 is the reference's per-request
    sleep analog).

    ``fetch_only`` skips span extraction: politeness governs the HTTP
    GET; parsing is downstream compute that overlaps other hosts'
    waits (and is benched separately in fetchparse).

    ``crawl_delay_ms`` gives per-host robots ``Crawl-delay`` overrides
    (host_i -> ms); hosts absent from the map pace at
    ``politeness_ms``.  ``t_mono`` in the output is the worker's
    monotonic clock at each GET, so tests assert REAL per-host spacing
    rather than trusting the heap."""

    delays = crawl_delay_ms or {}

    def run(batches):
        import heapq

        rows: dict[int, list[str]] = {}
        for pdf in batches:
            for h, u in zip(pdf["host_i"], pdf["url"]):
                rows.setdefault(int(h), []).append(u)
        iv = {
            h: delays.get(h, politeness_ms) / 1000.0 for h in rows
        }
        now = time.monotonic()
        # deadline heap: (next_allowed, host); lists consumed in order
        heap = [(now, h) for h in sorted(rows)]
        heapq.heapify(heap)
        idx = {h: 0 for h in rows}
        out_host, out_url, out_ok, out_t = [], [], [], []
        while heap:
            nxt, h = heapq.heappop(heap)
            wait = nxt - time.monotonic()
            if wait > 0:
                time.sleep(wait)
            url = rows[h][idx[h]]
            t_fetch = time.monotonic()
            page = synth.fetch(url, 1)
            ok = page.get("status") == 200
            if ok and not fetch_only:
                html = page.get("html")
                if html is not None:
                    synth.extract_spans(html)
            out_host.append(h)
            out_url.append(url)
            out_ok.append(bool(ok))
            out_t.append(t_fetch)
            idx[h] += 1
            if idx[h] < len(rows[h]):
                heapq.heappush(heap, (t_fetch + iv[h], h))
        yield pd.DataFrame(
            {
                "host_i": out_host,
                "url": out_url,
                "ok": out_ok,
                "t_mono": out_t,
            }
        )

    return run


def bench_politeness_throughput(
    spark: SparkSession,
    n_hosts: int = 254,
    urls_per_host: int = 250,
    politeness_ms: int = 200,
    fetch_only: bool = True,
    crawl_delay_ms: dict[int, int] | None = None,
) -> dict:
    """Measured politeness-ceiling bench: fetch ``n_hosts *
    urls_per_host`` URLs with real wall-clock spacing.  Pacing floor =
    ``urls_per_host * politeness_ms`` ms; ceiling = ``n_hosts *
    1000/politeness_ms`` URLs/s.

    With ``crawl_delay_ms`` (host_i -> robots Crawl-delay override)
    the ceiling is the SUM of per-host rates, ``sum_h 1000 /
    interval_h`` — each host stream paces independently, so a slow
    host subtracts only its own rate, never the cluster's."""
    import pyspark.sql.functions as F

    delays = crawl_delay_ms or {}

    if delays:
        # rate-proportional quotas so every host stream shares the SAME
        # pacing floor (urls_per_host * politeness_ms): a 2x-slower host
        # carries half the URLs — otherwise the slow host's tail would
        # dominate wall and misstate the steady-state mixed ceiling
        floor_ms = urls_per_host * politeness_ms
        quota = {
            h: max(1, floor_ms // delays.get(h, politeness_ms))
            for h in range(n_hosts)
        }
        n_urls = sum(quota.values())
        urls = spark.createDataFrame(
            pd.DataFrame(
                {
                    "host_i": [
                        h for h in range(n_hosts) for _ in range(quota[h])
                    ],
                    "url": [
                        f"http://portal-{h}.example/CaseDetail.aspx"
                        f"?CaseID={(h + 1) * 100000 + i}"
                        for h in range(n_hosts)
                        for i in range(quota[h])
                    ],
                }
            ),
            "host_i int, url string",
        )
    else:
        n_urls = n_hosts * urls_per_host
        urls = spark.range(n_urls).select(
            (F.col("id") % n_hosts).cast("int").alias("host_i"),
            F.concat(
                F.lit("http://portal-"),
                (F.col("id") % n_hosts).cast("string"),
                F.lit(".example/CaseDetail.aspx?CaseID="),
                ((F.col("id") % n_hosts + 1) * 100000 + F.col("id") / n_hosts)
                .cast("long")
                .cast("string"),
            ).alias("url"),
        )
    # one partition per core, hosts hash-spread across them: every
    # host has a live stream, so pacing (not cores) sets throughput
    cores = spark.sparkContext.defaultParallelism
    urls = urls.repartition(min(cores, n_hosts), "host_i")
    out = urls.mapInPandas(
        _paced_fetch_partition(politeness_ms, fetch_only, delays),
        "host_i int, url string, ok boolean, t_mono double",
    )
    t0 = time.monotonic()
    n_ok = out.filter("ok").count()
    wall = time.monotonic() - t0
    ceiling = sum(
        1000.0 / delays.get(h, politeness_ms) for h in range(n_hosts)
    )
    return {
        "urls": n_urls,
        "ok": n_ok,
        "wall": round(wall, 1),
        "tput": round(n_urls / wall, 1),
        "ceiling": round(ceiling, 1),
    }


def bench_crawl_throughput(
    spark: SparkSession,
    n_counties: int = 96,
    n_days: int = 8,
    base_dir: str | None = None,
) -> float:
    """Fetched+parsed URLs/sec on the synthetic frontier (the
    BASELINE.json headline metric), full wave fan-out."""
    import shutil
    import tempfile

    from ..operators.parse import parse_documents

    d = base_dir or tempfile.mkdtemp(prefix="ids-crawl-bench-")
    try:
        eng = CrawlEngine(
            spark,
            d,
            synth.make_registry(n_counties, n_scrape=n_counties),
            date(2024, 7, 1),
            n_days,
        )
        t0 = time.time()
        stats = eng.run()
        docs = eng.documents()
        parsed = parse_documents(docs)
        n_parsed = parsed.filter("parse_error IS NULL").count()
        elapsed = time.time() - t0
        n_fetched = sum(s.fetched + s.failed for s in stats)
        return (n_fetched + n_parsed) / elapsed
    finally:
        if base_dir is None:
            shutil.rmtree(d, ignore_errors=True)
