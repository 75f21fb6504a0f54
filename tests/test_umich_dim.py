"""Real UMich charge dimension (VERDICT r1 item 8): load the
reference's actual 7,621-row resources/umich-uccs-database.json
through the engine's loader and the clean stage, pinning join behavior
against real charge-name strings (duplicates, case, punctuation).
"""

from __future__ import annotations

import json
import os

import pytest

import pyspark.sql.functions as F

from indigent_defense_stats_spark.sources.umich import UMICH_PATH, load_umich_dim

pytestmark = pytest.mark.skipif(
    not os.path.exists(UMICH_PATH), reason="reference UMich file not present"
)


@pytest.fixture(scope="module")
def raw():
    with open(UMICH_PATH, encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def dim(spark):
    return load_umich_dim(spark).cache()


def test_row_counts_match_dict_semantics(raw, dim):
    body = [r for r in raw if r["charge_name"] != "charge_name"]
    distinct = len({r["charge_name"] for r in body})
    assert len(raw) == 7621  # the file the reference ships
    assert dim.count() == distinct  # one row per name — no join fanout
    assert dim.select("charge_name").distinct().count() == distinct


def test_last_occurrence_wins(raw, dim):
    """Reference builds {name: item} — later duplicates overwrite
    (cleaner/__init__.py:81)."""
    body = [r for r in raw if r["charge_name"] != "charge_name"]
    last = {}
    for r in body:
        last[r["charge_name"]] = r
    # pick a few duplicated names and check the kept uccs_code
    from collections import Counter

    dups = [n for n, c in Counter(r["charge_name"] for r in body).items() if c > 1]
    assert dups  # the file really has duplicates
    sample = dups[:5]
    got = {
        r["charge_name"]: r["uccs_code"]
        for r in dim.filter(F.col("charge_name").isin(sample)).collect()
    }
    for n in sample:
        assert got[n] == last[n]["uccs_code"], n


def test_clean_records_joins_real_names(spark, dim, raw):
    """clean_records against the real dimension: a real charge name
    maps (with the file's attributes); an invented one drops."""
    from indigent_defense_stats_spark.operators.clean import clean_records

    body = [r for r in raw if r["charge_name"] != "charge_name"]
    last = {}
    for r in body:
        last[r["charge_name"]] = r
    real_name = "AGGRAVATED ASSAULT WITH A DEADLY WEAPON"
    if real_name not in last:  # fall back to any name
        real_name = body[0]["charge_name"]
    rec = {
        "odyssey_id": "t1",
        "county": "hays",
        "code": "CR-1",
        "html_hash": "h",
        "defendant": None,
        "other_events": [["01/01/2020", "Status Hearing"]],
        "dispositions": None,
        "charges": [
            {"charges": real_name, "statute": "22.02", "level": "F2",
             "date": "01/05/2016"},
            {"charges": "NOT A REAL UMICH CHARGE XYZZY", "statute": "0",
             "level": "F3", "date": "01/06/2016"},
        ],
    }
    records = spark.createDataFrame(
        [rec],
        "odyssey_id string, county string, code string, html_hash string,"
        " defendant struct<defendant:string,sex:string,race:string,"
        "date_of_birth:string,height:string,weight:string,"
        "defense_attorney:string,appointed_or_retained:string,"
        "defense_attorney_phone_number:string,defendant_address:string,"
        "sid:string>,"
        " other_events array<array<string>>,"
        " dispositions array<struct<date:string,event:string,"
        "judicial_officer:string,details:array<struct<charge:string,"
        "outcome:string,additional_info:array<string>>>>>,"
        " charges array<struct<charges:string,statute:string,level:string,"
        "date:string>>",
    )
    out = clean_records(records, dim, "2026-01-01").collect()
    assert len(out) == 1
    row = out[0].asDict(recursive=True)
    charges = row["charges"]
    assert len(charges) == 1  # unmapped charge dropped by the inner join
    c = charges[0]
    assert c["charge_name"] == real_name
    assert c["uccs_code"] == last[real_name]["uccs_code"]
    assert c["offense_type_desc"] == last[real_name]["offense_type_desc"]
    # both charges' parse-valid dates count toward earliest
    assert row["earliest_charge_date"] == "2016-01-05"
