"""Pluggable county-registry source via Spark 4's Python Data Source
API — the reference's ``texas_county_data.csv`` scan (SURVEY.md §2
S1/S2) as a FIRST-CLASS format instead of an ad-hoc createDataFrame:

    spark.dataSource.register(OdysseyRegistrySource)
    spark.read.format("odyssey_registry").option("n_counties", 254).load()

Why this matters at scale: the Data Source API is how the engine
ingests anything that is not already a file — a registry service, a
seed-list endpoint, a queue.  The reader declares PARTITIONS (county
ranges here), so Spark schedules one task per range and the source
parallelizes like any file scan instead of funneling through the
driver; ``n_counties=10^5`` portals would still land as bounded
per-task generator work.  Rows come from the same deterministic
``synth.make_registry`` grammar the crawl tests use, so
``format("odyssey_registry")`` output == the seed dim the frontier
consumes (pytest-pinned).

This is an Arrow-batched Python boundary by construction (the API
yields rows/batches from Python workers) — acceptable here because a
registry is dim-sized; the fact tables stay on native file sources.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

REGISTRY_SCHEMA = (
    "county STRING, population INT, website STRING, portal STRING,"
    " type STRING, version STRING, search_disabled STRING,"
    " site_down STRING, captcha STRING, must_pay STRING,"
    " must_register STRING, notes STRING, scrape STRING"
)
_N_PARTS = 4


class _RegistryReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_counties = int(options.get("n_counties", "8"))
        n_scrape = options.get("n_scrape")
        self.n_scrape = None if n_scrape is None else int(n_scrape)

    def partitions(self):
        # contiguous county ranges -> one task each; ranges, not
        # modulo, so a range maps to a portal shard in production
        step = max(1, -(-self.n_counties // _N_PARTS))
        return [
            InputPartition((lo, min(lo + step, self.n_counties)))
            for lo in range(0, self.n_counties, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for row in make_registry_slice(lo, hi, self.n_scrape):
            yield tuple(row[k] for k in _COLS)


_COLS = [c.split()[0] for c in REGISTRY_SCHEMA.split(",")]


def make_registry_slice(lo: int, hi: int, n_scrape):
    """Rows [lo, hi) of the deterministic registry grammar — identical
    to ``synth.make_registry(n, n_scrape)[lo:hi]`` for any n >= hi,
    because row i depends only on (i, n_scrape).  Imported inside the
    task: this code runs on executors."""
    from indigent_defense_stats_spark import synth

    return synth.make_registry(hi, n_scrape)[lo:]


class OdysseyRegistrySource(DataSource):
    """format("odyssey_registry"): options n_counties, n_scrape."""

    @classmethod
    def name(cls) -> str:
        return "odyssey_registry"

    def schema(self) -> str:
        return REGISTRY_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _RegistryReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(OdysseyRegistrySource)
