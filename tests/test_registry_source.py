"""Python Data Source API registry (sources/registry_source.py):
format-read equality with the synth grammar + task-parallel layout."""

from __future__ import annotations

from indigent_defense_stats_spark import synth
from indigent_defense_stats_spark.sources import registry_source


def _read(spark, n, n_scrape=None):
    registry_source.register(spark)
    r = spark.read.format("odyssey_registry").option("n_counties", n)
    if n_scrape is not None:
        r = r.option("n_scrape", n_scrape)
    return r.load()


def test_format_read_equals_synth_grammar(spark):
    df = _read(spark, 13, n_scrape=5)
    expect = synth.make_registry(13, 5)
    got = sorted((r["county"], tuple(r)) for r in df.collect())
    want = sorted(
        (row["county"], tuple(row[c] for c in registry_source._COLS))
        for row in expect
    )
    assert got == want
    assert df.filter("scrape = 'yes'").count() == 5


def test_source_parallelizes_across_tasks(spark):
    """The reader declares county-range partitions — the source must
    scan as multiple tasks, not a single driver-side funnel."""
    df = _read(spark, 10)
    assert df.rdd.getNumPartitions() == 4
    # ranges are contiguous and complete
    assert df.count() == 10
    assert df.select("county").distinct().count() == 10


def test_seed_dim_matches_frontier_input(spark):
    """The format output is exactly the dim the frontier consumes:
    column set and the one-dominant-county population skew hold."""
    df = _read(spark, 8)
    assert [f.name for f in df.schema.fields] == registry_source._COLS
    pops = {r["county"]: r["population"] for r in df.collect()}
    assert pops["county0"] == 250_000  # the Hays-skew head county
    assert all(p <= 60_000 for c, p in pops.items() if c != "county0")
