"""Fixed StructType schemas for every engine table.

The reference is schema-on-read (one JSON/HTML file per case); the
engine inverts that into columnar tables with schemas declared up
front (SURVEY.md §1.3).  Field provenance is cited per reference file.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# documents — interleaved span sequences (BASELINE.json input_hint).
# One row per fetched case-detail page; spans carry the page's text
# nodes interleaved with media refs (mugshots / document images, see
# /root/reference/resources/test_files/test_123456.html:24-26) in
# document order.  `offset` makes HTML order explicit because Spark
# DataFrames have no implicit row/element order and the reference's
# parse semantics depend on it (/root/reference/src/parser/hays.py:224-226).
# ---------------------------------------------------------------------------
SPAN = StructType(
    [
        StructField("kind", StringType(), False),  # 'text' | 'media'
        StructField("text", StringType(), False),  # '' for media spans
        StructField("media_ref", StringType(), False),  # '' for text spans
        StructField("offset", IntegerType(), False),  # 0-based doc order
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),  # case id (URL CaseID)
        StructField("county", StringType(), False),
        StructField("spans", ArrayType(SPAN, False), False),
    ]
)

# ---------------------------------------------------------------------------
# counties — crawl registry
# (/root/reference/resources/texas_county_data.csv header row).
# ---------------------------------------------------------------------------
COUNTIES = StructType(
    [
        StructField("county", StringType(), False),
        StructField("population", IntegerType(), True),
        StructField("website", StringType(), True),
        StructField("portal", StringType(), True),
        StructField("type", StringType(), True),
        StructField("version", StringType(), True),
        StructField("search_disabled", StringType(), True),
        StructField("site_down", StringType(), True),
        StructField("captcha", StringType(), True),
        StructField("must_pay", StringType(), True),
        StructField("must_register", StringType(), True),
        StructField("notes", StringType(), True),
        StructField("scrape", StringType(), True),  # 'yes'/'no'
    ]
)

# ---------------------------------------------------------------------------
# frontier — URL frontier state, checkpointed per wave (engine-internal;
# derived from the implicit loop state of
# /root/reference/src/scraper/__init__.py:568-588).
# ---------------------------------------------------------------------------
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),  # as discovered
        StructField("canonical_url", StringType(), False),  # dedup/fetch key
        StructField("host", StringType(), False),
        StructField("county", StringType(), False),
        StructField("county_ord", IntegerType(), False),
        # depth: 0 login, 1 main, 2 search, 3 results, 4 case-detail
        StructField("depth", IntegerType(), False),
        # prio class: 0 login, 1 main, 2 search, 3 results+case (results
        # carry link_ord=-1 so a page's cases sort between it and the
        # next results page — the reference's DFS order, O5)
        StructField("prio", IntegerType(), False),
        StructField("date_ord", IntegerType(), False),
        StructField("jo_ord", IntegerType(), False),
        StructField("link_ord", IntegerType(), False),
        StructField("case_date", DateType(), True),  # north_star recency prio
        StructField("status", StringType(), False),  # pending|fetched|failed
        StructField("wave", IntegerType(), False),  # wave enqueued
    ]
)

# ---------------------------------------------------------------------------
# case_records — parsed case, gold copy of the reference's parsed JSON
# (/root/reference/resources/test_files/test_123456.json;
# src/parser/Data Structure of Parsed JSON.md).
# ---------------------------------------------------------------------------
CHARGE = StructType(
    [
        StructField("charges", StringType(), True),
        StructField("statute", StringType(), True),
        StructField("level", StringType(), True),
        StructField("date", StringType(), True),
    ]
)

DISPOSITION_DETAIL = StructType(
    [
        StructField("charge", StringType(), True),
        StructField("outcome", StringType(), True),
        StructField("additional_info", ArrayType(StringType(), True), True),
    ]
)

DISPOSITION = StructType(
    [
        StructField("date", StringType(), True),
        StructField("event", StringType(), True),
        StructField("judicial_officer", StringType(), True),
        StructField("details", ArrayType(DISPOSITION_DETAIL, True), True),
    ]
)

CASE_RECORDS = StructType(
    [
        StructField("odyssey_id", StringType(), False),
        StructField("code", StringType(), True),  # cause number
        StructField("county", StringType(), False),
        StructField("name", StringType(), True),
        StructField("case_type", StringType(), True),
        StructField("date_filed", StringType(), True),
        StructField("location", StringType(), True),
        StructField("related_cases", ArrayType(StringType(), True), True),
        StructField(
            "defendant",
            StructType(
                [
                    StructField("defendant", StringType(), True),
                    StructField("sex", StringType(), True),
                    StructField("race", StringType(), True),
                    StructField("date_of_birth", StringType(), True),
                    StructField("height", StringType(), True),
                    StructField("weight", StringType(), True),
                    StructField("defense_attorney", StringType(), True),
                    StructField("appointed_or_retained", StringType(), True),
                    StructField("defense_attorney_phone_number", StringType(), True),
                    StructField("defendant_address", StringType(), True),
                    StructField("sid", StringType(), True),
                ]
            ),
            True,
        ),
        StructField(
            "state",
            StructType(
                [
                    StructField("prosecuting_attorney", StringType(), True),
                    StructField(
                        "prosecuting_attorney_phone_number", StringType(), True
                    ),
                ]
            ),
            True,
        ),
        StructField("charges", ArrayType(CHARGE, True), True),
        StructField("dispositions", ArrayType(DISPOSITION, True), True),
        StructField(
            "top_charge",
            StructType(
                [
                    StructField("charge_name", StringType(), True),
                    StructField("charge_level", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("dismissed_charges_count", IntegerType(), True),
        StructField(
            "other_events", ArrayType(ArrayType(StringType(), True), True), True
        ),
        # 'financial information' (print_stats.py:56-60): money values
        # stay strings in the record — parsing to double happens at
        # stats time via functions.money.parse_money, like the
        # reference's float(... .replace(',', ''))
        StructField(
            "financial",
            StructType(
                [
                    StructField("total_financial_assessment", StringType(), True),
                    StructField("balance", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("html_hash", StringType(), True),  # xxh64 hex
    ]
)

# ---------------------------------------------------------------------------
# charge_dim — UMich UCCS dimension
# (/root/reference/resources/umich-uccs-database.json, joined at
# /root/reference/src/cleaner/__init__.py:124-127).
# ---------------------------------------------------------------------------
CHARGE_DIM = StructType(
    [
        StructField("charge_name", StringType(), False),
        StructField("uccs_code", StringType(), True),
        StructField("charge_desc", StringType(), True),
        StructField("offense_category_desc", StringType(), True),
        StructField("offense_type_desc", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# case_records_clean — redacted/enriched case
# (/root/reference/resources/test_files/cleaned_test_json/test_123456.json;
# src/cleaner/__init__.py:190-232).  'orignal_charge' [sic] reproduces
# the reference's field name (cleaner/__init__.py:106).
# ---------------------------------------------------------------------------
CLEAN_CHARGE = StructType(
    [
        StructField("charge_id", IntegerType(), True),
        StructField("charge_level", StringType(), True),
        StructField("orignal_charge", StringType(), True),
        StructField("statute", StringType(), True),
        StructField("is_primary_charge", BooleanType(), True),
        StructField("charge_date", StringType(), True),
        StructField("charge_name", StringType(), True),
        StructField("uccs_code", StringType(), True),
        StructField("charge_desc", StringType(), True),
        StructField("offense_category_desc", StringType(), True),
        StructField("offense_type_desc", StringType(), True),
    ]
)

CLEAN_DISPOSITION = StructType(
    [
        StructField("date", StringType(), True),
        StructField("event", StringType(), True),
        StructField(
            "details",
            ArrayType(
                StructType(
                    [
                        StructField("charge", StringType(), True),
                        StructField("outcome", StringType(), True),
                    ]
                ),
                True,
            ),
            True,
        ),
    ]
)

CASE_RECORDS_CLEAN = StructType(
    [
        StructField("case_number", StringType(), False),
        StructField("parsing_date", StringType(), True),
        StructField("html_hash", StringType(), True),
        StructField("county", StringType(), True),
        StructField("appointed_or_retained", StringType(), True),
        StructField("defense_attorney_hash", StringType(), True),
        StructField("charges", ArrayType(CLEAN_CHARGE, True), True),
        StructField("earliest_charge_date", StringType(), True),
        StructField("has_evidence_of_representation", BooleanType(), True),
        StructField("dispositions", ArrayType(CLEAN_DISPOSITION, True), True),
        StructField("good_motions", ArrayType(StringType(), True), True),
        StructField("cause_number_redacted", StringType(), True),
    ]
)
