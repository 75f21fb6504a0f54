"""Registry hygiene gate: the graded 50-prefix is a committed manifest.

CORRECTNESS_r{N} evaluates exactly the first 50 entries of
``__spark_entry__.queries()`` in insertion order, so registry order is
part of the graded surface.  This gate makes prefix drift structurally
impossible: an accidental import-order change, a module re-shuffle, or
a new query landing ahead of the prefix fails HERE, in pytest, instead
of silently swapping a graded row.

It also audits the tail contract: every ``_TAIL`` name must exist in
the registry (a stale tail name would silently promote an unintended
query into the prefix), and every registered query must carry either a
DuckDB oracle or a rows-only justification (the three crawl queries
whose ground truth is the sequential-oracle pytest parity suite).
"""

from __future__ import annotations

import __spark_entry__ as entrymod

# Round-5 third rotation: avi_frame_stats (REAL MJPEG-AVI demux +
# sampled-frame JPEG decode) and audio_fingerprint_neardup (real PCM
# -> delta-sign fingerprint -> banded Hamming verify) promoted so the
# two new media modalities carry hard driver rows; demoted:
# stream_event_window_counts (streaming family keeps
# stream_click_attribution + session_windows graded; r04 green at #47)
# and asof_attribution (temporal family keeps range_attribution
# graded; r04 green at #11).
#
# Round-5 second rotation: jpeg_decode_stats (the REAL baseline-JPEG
# decode surface, functions/jpeg.py — new this round) promoted next to
# its png sibling; pack_sequences demoted (pack_interleaved keeps the
# packing family's graded row; two rounds of driver-green history).
#
# The committed round-5 manifest: six round-4 families promoted
# (winnow_matches, click_hits, click_components, collocation_topk,
# jl_project_audit, png_decode_stats — the round-4 verdict's #1 item),
# six demoted to the tail with pin comments (zorder_cells,
# sitemap_frontier, hll_distinct, balanced_shards,
# crawl_budget_waterfill, dust_rules — each keeps a pytest pin or a
# green local-oracle sibling, and the last three carry one round of
# driver-green history from CORRECTNESS_r04).
# Changing the prefix is allowed — but only by editing THIS manifest in
# the same commit, which makes the rotation an explicit reviewed act.
PREFIX_MANIFEST = [
    "variant_props_rollup",
    "stats_orders",
    "region_revenue",
    "customers_without_big_orders",
    "event_sequence",
    "top_charge_argmin_analog",
    "denormalize_order_lines",
    "priority_severity_rollup",
    "doc_motion_flags",
    "user_events_reversed",
    "range_attribution",
    "funnel_stages",
    "click_pagerank",
    "click_reachability",
    "click_hits",
    "click_components",
    "cms_heavy_hitters",
    "gopher_quality_filters",
    "pii_scrub_docs",
    "unigram_lm_score",
    "ccnet_buckets",
    "collocation_topk",
    "bpe_merge_ranks",
    "winnow_matches",
    "bm25_search",
    "benchmark_contamination",
    "line_dedup",
    "exact_substr_cut",
    "clean_corpus",
    "minhash_lsh_neardup",
    "neardup_components",
    "interleaved_spans",
    "media_caption_pairs",
    "pack_interleaved",
    "embedding_neardup_lsh",
    "ann_topk_ivf_indexed",
    "semantic_dedup",
    "jl_project_audit",
    "mixture_sample",
    "money_parse_total",
    "cleaned_cases",
    "publish_versions",
    "media_features",
    "png_decode_stats",
    "jpeg_decode_stats",
    "avi_frame_stats",
    "audio_fingerprint_neardup",
    "stream_click_attribution",
    "session_windows",
    "sql_q1_pricing_summary",
]

# Queries with no SQL oracle by design: the driver records a weaker
# rows-only check; their ground truth is the sequential-oracle crawl
# parity suite (tests/test_frontier.py).
ROWS_ONLY = {
    "crawl_fetch_log",
    "crawl_doc_spans",
    "crawl_wave_metrics",
    "crawl_media_decode_stats",
}


def test_prefix_is_exactly_the_committed_manifest():
    got = list(entrymod.queries().keys())[:50]
    assert len(PREFIX_MANIFEST) == 50
    assert got == PREFIX_MANIFEST, (
        "graded 50-prefix drifted from the committed manifest; "
        "first divergence at position "
        f"{next(i for i, (a, b) in enumerate(zip(got, PREFIX_MANIFEST)) if a != b) + 1}"
    )


def test_prefix_entries_are_all_oracle_eligible():
    osql = entrymod.oracle_sql()
    missing = [q for q in PREFIX_MANIFEST if q not in osql]
    assert not missing, f"prefix rows without a DuckDB oracle: {missing}"


def test_tail_names_all_exist_in_registry():
    # queries() silently drops _TAIL names absent from the module
    # registries; a typo there would promote an unintended query into
    # the graded prefix — fail loudly instead.
    qs = entrymod.queries()
    stale = [t for t in entrymod._TAIL if t not in qs]
    assert not stale, f"_TAIL names not present in any module registry: {stale}"


def test_tail_is_disjoint_from_prefix_and_covers_the_rest():
    qs = list(entrymod.queries().keys())
    tail = set(entrymod._TAIL)
    assert tail.isdisjoint(PREFIX_MANIFEST)
    assert set(qs) == set(PREFIX_MANIFEST) | tail


def test_every_query_has_oracle_or_rows_only_justification():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    unjustified = [q for q in qs if q not in osql and q not in ROWS_ONLY]
    assert not unjustified, (
        "queries with neither a DuckDB oracle nor a rows-only "
        f"justification: {unjustified}"
    )
    # and the rows-only set is exact: an oracle landing for one of
    # these should remove it from ROWS_ONLY (strengthening the gate)
    now_oracled = [q for q in ROWS_ONLY if q in osql]
    assert not now_oracled, f"rows-only queries that now have oracles: {now_oracled}"
