"""Parse stage: interleaved span documents -> typed case records.

Spark-first design: parsing is per-document-local, so the entire
stage is ONE ``mapInPandas`` pass — zero shuffle, embarrassingly
parallel, linear at 100 TB (the alternative — explode spans + window
for section assignment + re-aggregate — would shuffle the exploded
span table, a multi-PB shuffle at target scale).  Inside each Arrow
batch the work is pandas/numpy column ops over the *span-level* frame
(explode, cumsum section ids, str ops), not per-row Python loops.

Semantics mirror the reference parser exactly
(/root/reference/src/parser/hays.py; quirks reproduced and cited
inline) and are tested row-for-row against the sequential oracle.

Outputs carry a ``parse_error`` column: NULL for good rows, message
for quarantined ones (reference writes an error log that keeps only
the *last* failure — parser/__init__.py:167-182 opens mode 'w'; that
bug is deliberately not reproduced: we keep every error).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from .. import schemas
from ..functions.hashing import xxh64_hexdigest
from ..synth import SECTION_STARTERS

PARSE_OUTPUT = StructType(
    schemas.CASE_RECORDS.fields + [StructField("parse_error", StringType(), True)]
)

_DISPO_ROUTE = ("Disposition", "Disposition:", "Amended Disposition")
_DISPO_APPEND = (
    "disposition",
    "amended disposition",
    "deferred adjudication",
    "punishment hearing",
)
_SEVERITY = {
    "First Degree Felony": 1,
    "Second Degree Felony": 2,
    "Third Degree Felony": 3,
    "State Jail Felony": 4,
    "Misdemeanor A": 5,
    "Misdemeanor B": 6,
}


def _append_reverse_order(n: int) -> list[int]:
    """Final positions after the reference's reverse-after-each-append
    quirk (hays.py:265): returns the order in which appended items
    [0..n-1] end up."""
    order: list[int] = []
    for k in range(n):
        order.append(k)
        order.reverse()
    return order


def _severity(level: str) -> float:
    for name, sev in _SEVERITY.items():
        if name in level:
            return sev
    return float("inf")


def _clean_extract(cell: str) -> str:
    # extract_rows cell cleanup (hays.py:22): strip, drop NBSP and Â
    return cell.strip().replace("\xa0", "").replace("Â", "")


def _rows_extract(texts: list[str]) -> list[list[str]]:
    rows = []
    for t in texts:
        row = [_clean_extract(c) for c in t.split("\t") if c.strip()]
        if row:
            rows.append(row)
    return rows


def _rows_events(texts: list[str]) -> list[list[str]]:
    # format_events cleanup (hays.py:196-209): nbsp->space + ws collapse
    rows = []
    for t in texts:
        row = [
            " ".join(c.strip().replace("\xa0", " ").split())
            for c in t.split("\t")
            if c.strip()
        ]
        if row:
            rows.append(row)
    return rows


def _parse_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized batch parse: span-level frame -> one record per doc."""
    # ---- explode to span level (pandas-vectorized) -------------------
    sp = batch[["doc_id", "county", "spans"]].explode("spans", ignore_index=True)
    spans = pd.json_normalize(sp["spans"])
    sp = pd.concat([sp[["doc_id", "county"]], spans], axis=1)
    is_text = sp["kind"].values == "text"
    # section segmentation: starter spans begin sections (synth grammar)
    starter = is_text & sp["text"].isin(SECTION_STARTERS).values
    sp["sec"] = np.cumsum(starter)
    sp["sec_name"] = np.where(starter, sp["text"], None)
    sp["sec_name"] = sp.groupby(["doc_id", "sec"])["sec_name"].transform("first")

    out_rows: list[dict] = []
    for (doc_id, county), g in sp.groupby(["doc_id", "county"], sort=False):
        try:
            out_rows.append(_assemble(doc_id, county, g))
        except Exception as ex:  # quarantine row (S9, fixed semantics)
            out_rows.append(
                {
                    "odyssey_id": doc_id,
                    "county": county,
                    "parse_error": f"{type(ex).__name__}: {ex}",
                }
            )
    cols = [f.name for f in PARSE_OUTPUT.fields]
    res = pd.DataFrame(out_rows)
    for c in cols:
        if c not in res.columns:
            res[c] = None
    return res[cols]


def _sections(g: pd.DataFrame) -> list[tuple[str, pd.DataFrame]]:
    return [
        (sec_g["sec_name"].iloc[0], sec_g)
        for _, sec_g in g.groupby("sec", sort=True)
    ]


def _assemble(doc_id: str, county: str, g: pd.DataFrame) -> dict:
    """Build one case record from its span frame (document order)."""
    g = g.sort_values("offset")
    rec: dict = {
        "odyssey_id": doc_id,
        "county": county,
        "code": "Unknown",
        "name": None,
        "case_type": None,
        "date_filed": None,
        "location": None,
        "related_cases": None,
        "defendant": None,
        "state": None,
        "charges": None,
        "dispositions": None,
        "top_charge": None,
        "dismissed_charges_count": None,
        "other_events": None,
        "parse_error": None,
    }
    secs = _sections(g)
    # metadata region (sec 0): first text span = cause number (hays.py:91)
    meta = secs[0][1] if secs and secs[0][0] is None else None
    if meta is not None:
        mt = meta[meta["kind"] == "text"]
        if len(mt):
            rec["code"] = mt["text"].iloc[0]

    for sec_name, sec_g in secs:
        if sec_name is None:
            continue
        texts = sec_g[sec_g["kind"] == "text"]["text"]
        sec_text = "\n".join(texts)
        body = sec_g.iloc[1:]
        body_texts = body[body["kind"] == "text"]["text"]
        # dispatch in the reference's if/elif order (hays.py:282-309)
        if "Case Type:" in sec_text and "Date Filed:" in sec_text:
            vals = [t for t in body_texts if not t.endswith(":")]
            vals = (vals + ["Unknown"] * 4)[:4]
            rec["name"], rec["case_type"], rec["date_filed"], rec["location"] = vals
        elif "Related Case Information" in sec_text:
            rec["related_cases"] = [
                t.strip().replace("\xa0", " ") for t in body_texts
            ]
        elif "Party Information" in sec_text:
            rows = _rows_extract(list(body_texts))
            rec["defendant"] = {
                "defendant": rows[1][1],
                "sex": rows[1][2].split(" ")[0],
                "race": rows[1][2].split(" ")[1],
                "date_of_birth": rows[1][3],
                "height": rows[1][4].split(" ")[0],
                "weight": rows[1][4].split(" ")[1],
                "defense_attorney": rows[1][5],
                "appointed_or_retained": rows[1][6],
                "defense_attorney_phone_number": rows[1][7],
                "defendant_address": rows[2][0] + " " + rows[2][1],
                "sid": rows[2][3],
            }
            rec["state"] = {
                "prosecuting_attorney": rows[3][2],
                "prosecuting_attorney_phone_number": rows[3][3],
            }
        elif "Charge Information" in sec_text:
            # flat text-node list incl. the section header, stride-5
            # chunks, first cell of each chunk skipped (hays.py:178-187)
            cells = [
                t.strip().replace("\xa0", " ")
                for t in sec_g[sec_g["kind"] == "text"]["text"]
                if t.strip()
            ]
            keys = ["charges", "statute", "level", "date"]
            rec["charges"] = [
                {
                    **{k: None for k in keys},
                    **dict(zip(keys, cells[i + 1 : i + 5])),
                }
                for i in range(5, len(cells), 5)
            ]
        elif "Events & Orders of the Court" in sec_text:
            rows = _rows_events(list(body_texts))
            routed = [r for r in rows if len(r) >= 2]
            dispo_rows = [r for r in routed if r[1] in _DISPO_ROUTE][::-1]
            other_rows = [r for r in routed if r[1] not in _DISPO_ROUTE][::-1]
            appended = []
            for row in dispo_rows:
                if len(row) >= 5 and row[1].lower() in _DISPO_APPEND:
                    jo = ""
                    if len(row[2]) > 18 and row[2].startswith("(Judicial Officer:"):
                        jo = row[2][18:-1].strip()
                    appended.append(
                        {
                            "date": row[0],
                            "event": row[1],
                            "judicial_officer": jo,
                            "details": [
                                {
                                    "charge": row[3],
                                    "outcome": row[4],
                                    "additional_info": row[5:] if len(row) > 5 else None,
                                }
                            ],
                        }
                    )
            order = _append_reverse_order(len(appended))
            dispositions = [appended[k] for k in order]
            # key set iff the routing loop ran (hays.py:303-304): empty
            # list when rows routed but none passed the append filter
            rec["dispositions"] = dispositions if dispo_rows else None
            if rec["dispositions"]:
                rec["top_charge"] = _top_charge(dispositions, rec["charges"] or [])
                rec["dismissed_charges_count"] = sum(
                    1
                    for d in dispositions
                    for det in d["details"]
                    if (det["outcome"] or "").lower() == "dismissed"
                )
            rec["other_events"] = other_rows
    rec["html_hash"] = _html_hash(g)
    return rec


def _top_charge(dispositions: list[dict], charges: list[dict]) -> dict:
    charge_map = {c.get("charges"): c.get("level") for c in charges}
    top = None
    min_sev = float("inf")
    for d in dispositions:
        for det in d["details"]:
            name = (
                (det.get("charge") or "")
                .strip()
                .split(" >=")[0]
                .strip()
                .lstrip("0123456789. ")
                .strip()
            )
            level = charge_map.get(name, "Unknown")
            sev = _severity(level or "")
            if sev < min_sev:
                min_sev = sev
                top = {"charge_name": name, "charge_level": level}
    return top


def _html_hash(g: pd.DataFrame) -> str:
    """xxh64 hex over the span serialization, excluding a trailing
    'Balance Due' section (parser/__init__.py:241-254)."""
    last_sec = g["sec"].max()
    last = g[g["sec"] == last_sec]
    drop_last = "Balance Due" in "\n".join(
        last[last["kind"] == "text"]["text"]
    ) and last_sec > 0
    keep = g[g["sec"] < last_sec] if drop_last else g
    payload = "\n".join(
        np.where(keep["kind"] == "text", keep["text"], keep["media_ref"])
    )
    return xxh64_hexdigest(payload)


def parse_documents(documents: DataFrame) -> DataFrame:
    """documents (doc_id, county, spans) -> case_records (+parse_error).

    One mapInPandas pass; no shuffle.  Downstream: filter
    ``parse_error IS NULL`` for the good table, inverse for quarantine.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield _parse_batch(batch)

    return documents.mapInPandas(run, schema=PARSE_OUTPUT)


def quarantine(parsed: DataFrame) -> DataFrame:
    return parsed.filter("parse_error IS NOT NULL").select(
        "odyssey_id", "county", "parse_error"
    )


def good_records(parsed: DataFrame) -> DataFrame:
    return parsed.filter("parse_error IS NULL").drop("parse_error")
