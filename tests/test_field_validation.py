"""Schema/nullability/min-length assertions driven by the reference's
field-validation corpus (SURVEY §5(d)).

The reference validates parsed output against
resources/test_files/field_validation_list.json — per-field name,
logical level (top / party / charge), type, estimated_min_length and
importance (src/tester/README.md "Parser Tests").  Here the same
corpus (read from the read-only reference checkout; skipped when
absent) drives assertions over the engine's parsed records for a
synthetic world: every 'necessary'/'high' field present, non-null,
and at least the estimated minimum length.
"""

from __future__ import annotations

import json
import os
from datetime import date

import pytest

from indigent_defense_stats_spark import oracle, schemas, synth
from indigent_defense_stats_spark.operators import parse as parse_mod

CORPUS = "/root/reference/resources/test_files/field_validation_list.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not present"
)

# reference field name -> engine record path
TOP_MAP = {
    "code": "code",
    "odyssey id": "odyssey_id",
    "county": "county",
    "name": "name",
    "case type": "case_type",
    "date filed": "date_filed",
    "location": "location",
}
PARTY_MAP = {
    "defendant": "defendant",
    "sex": "sex",
    "race": "race",
    "date of birth": "date_of_birth",
    "height": "height",
    "weight": "weight",
    "defense attorney": "defense_attorney",
    "appointed or retained": "appointed_or_retained",
    "defense attorney phone number": "defense_attorney_phone_number",
    "defendant address": "defendant_address",
    "SID": "sid",
}
CHARGE_MAP = {"charges": "charges", "level": "level", "date": "date"}

CHECK_IMPORTANCE = {"necessary", "high"}


@pytest.fixture(scope="module")
def records(spark):
    log = oracle.crawl(synth.make_registry(4, n_scrape=3), date(2024, 7, 1), 2)
    rows = [
        (
            cid,
            county,
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans],
        )
        for cid, (county, spans) in sorted(log.documents.items())
    ]
    docs = spark.createDataFrame(rows, schema=schemas.DOCUMENTS)
    parsed = parse_mod.parse_documents(docs)
    out = [r.asDict(recursive=True) for r in parsed.collect()]
    assert out
    return out


@pytest.fixture(scope="module")
def corpus():
    with open(CORPUS) as f:
        return json.load(f)


def _check(value, spec, ctx):
    assert value is not None, ctx
    if spec["type"] == "string":
        assert isinstance(value, str) and len(value) >= spec[
            "estimated_min_length"
        ], (ctx, value)
    else:
        assert len(value) >= spec["estimated_min_length"], (ctx, value)


def test_necessary_and_high_fields_validate(records, corpus):
    for spec in corpus:
        if spec["importance"] not in CHECK_IMPORTANCE:
            continue
        name, level = spec["name"], spec["logical_level"]
        for rec in records:
            assert rec["parse_error"] is None
            if level == "top" and name in TOP_MAP:
                _check(rec[TOP_MAP[name]], spec, (name, rec["odyssey_id"]))
            elif level == "top" and name == "party information":
                assert rec["defendant"] is not None, rec["odyssey_id"]
            elif level == "top" and name == "charge information":
                assert rec["charges"], rec["odyssey_id"]
            elif level == "party" and name in PARTY_MAP:
                _check(
                    rec["defendant"][PARTY_MAP[name]],
                    spec,
                    (name, rec["odyssey_id"]),
                )
            elif level == "charge" and name in CHARGE_MAP:
                for ch in rec["charges"] or []:
                    _check(ch[CHARGE_MAP[name]], spec, (name, rec["odyssey_id"]))


def test_medium_low_fields_exist_in_schema(corpus):
    """Lower-importance party fields the synthetic world doesn't carry
    (bondsman, prosecutor address) are schema-level only in the
    reference too; assert the engine schema has every field the corpus
    names at party level that the reference parser extracts."""
    party_fields = {f.name for f in schemas.CASE_RECORDS["defendant"].dataType.fields}
    for ref_name, eng_name in PARTY_MAP.items():
        assert eng_name in party_fields, ref_name
