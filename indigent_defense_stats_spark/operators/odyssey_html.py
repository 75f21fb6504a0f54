"""Real Odyssey-markup case parser (stdlib ``html.parser``, no bs4).

The synthetic pipeline (synth.py) exercises the parse *semantics* over
the engine's span wire format; this module parses the reference's real
portal markup — the actual fixture
``/root/reference/resources/test_files/test_123456.html`` — into the
reference's golden JSON shape
(``resources/test_files/test_123456.json``), mirroring
``/root/reference/src/parser/hays.py:87-314`` selector-for-selector:

- ``div[class="ssCaseDetailCaseNbr"] > span`` (hays.py:91)
- ``body>table`` dispatch by contained text (hays.py:276-309)
- per-``tr`` text-node rows with NBSP cleanup (hays.py:18-30)
- first-4-``<b>`` case details (hays.py:103-120)
- stride-5 charge chunks over the flat text-node list (hays.py:178-187)
- ``th``-bearing rows for Events & Orders, the reverse quirks, the
  judicial-officer slice ``row[2][18:-1]`` (hays.py:204-267)

The container has no bs4, so a ~100-line stack DOM built on stdlib
``HTMLParser`` stands in for BeautifulSoup.  It reproduces the bs4
behaviors the reference parser depends on: document-order descendant
traversal, ``find_all(text=True)`` string lists, ``.text``
concatenation, entity decoding (``&nbsp;`` -> ``\\xa0``), and
tolerance of self-closed ``<td/>`` / void elements.

Spark surface: :func:`parse_odyssey_pages` — one ``mapInPandas`` pass
over (doc_id, county, html), no shuffle, same JSON-hop pattern as
``parse.parse_documents`` (per-document branchy logic stays in plain
Python inside Arrow batches; the nested record returns to the JVM as
one JSON string).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

# elements that never take content (HTMLParser emits bare starttags)
_VOID = {
    "br", "col", "img", "link", "input", "hr", "meta", "area", "base",
    "embed", "source", "track", "wbr",
}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # _Node or str (text node)
        self.parent = parent

    # -- bs4-equivalent accessors ------------------------------------
    def descendants(self):
        """Document-order descendant nodes and strings (like bs4)."""
        for c in self.children:
            yield c
            if isinstance(c, _Node):
                yield from c.descendants()

    def find_all(self, tag: str) -> list["_Node"]:
        return [c for c in self.descendants()
                if isinstance(c, _Node) and c.tag == tag]

    def find(self, tag: str) -> "_Node | None":
        hits = self.find_all(tag)
        return hits[0] if hits else None

    def strings(self) -> list[str]:
        """``find_all(text=True)`` — every text node, document order."""
        return [c for c in self.descendants() if isinstance(c, str)]

    @property
    def text(self) -> str:
        """bs4 ``.text``: concatenation of all descendant strings."""
        return "".join(self.strings())

    def children_tagged(self, tag: str) -> list["_Node"]:
        """CSS child combinator (``parent > tag``)."""
        return [c for c in self.children
                if isinstance(c, _Node) and c.tag == tag]


class _Dom(HTMLParser):
    """Stack DOM builder; unmatched end tags are dropped, mismatched
    ones pop to the nearest matching open tag (bs4 html.parser-builder
    behavior for this markup family)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), parent=self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(
            _Node(tag, dict(attrs), parent=self._stack[-1])
        )

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break  # unmatched end tag: ignored

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)

    # processing instructions (<?xml ...?> inline in body) and comments
    # carry no case data — dropped, matching the reference's effective
    # behavior (no comments exist in the body of real pages)
    def handle_pi(self, data):
        pass

    def handle_comment(self, data):
        pass


def build_dom(html: str) -> _Node:
    p = _Dom()
    p.feed(html)
    p.close()
    return p.root


# ---------------------------------------------------------------------------
# hays.py parity helpers — each cites the mirrored reference lines
# ---------------------------------------------------------------------------

CHARGE_SEVERITY = {  # hays.py:4-11
    "First Degree Felony": 1,
    "Second Degree Felony": 2,
    "Third Degree Felony": 3,
    "State Jail Felony": 4,
    "Misdemeanor A": 5,
    "Misdemeanor B": 6,
}

_DISPO_ROUTE = ("Disposition", "Disposition:", "Amended Disposition")
_DISPO_APPEND = (
    "disposition", "amended disposition", "deferred adjudication",
    "punishment hearing",
)


def _extract_rows(table: _Node) -> list[list[str]]:
    """hays.py:18-30 — per-tr stripped text cells, NBSP/Â dropped."""
    rows = [
        [t.strip().replace("\xa0", "").replace("Â", "")
         for t in tr.strings() if t.strip()]
        for tr in table.find_all("tr")
    ]
    return [r for r in rows if r]


def _severity(level: str) -> float:
    for name, sev in CHARGE_SEVERITY.items():  # hays.py:33-40
        if name in level:
            return sev
    return float("inf")


def _case_metadata(county: str, case_number: str, root: _Node) -> dict:
    """hays.py:88-102: div[class="ssCaseDetailCaseNbr"] > span."""
    code = "Unknown"
    for div in root.find_all("div"):
        if div.attrs.get("class") == "ssCaseDetailCaseNbr":
            spans = div.children_tagged("span")
            if spans:
                code = spans[0].text
                break
    return {"code": code, "odyssey id": case_number, "county": county}


def _case_details(table: _Node) -> dict:
    """hays.py:103-120: first four <b> texts."""
    b = table.find_all("b")
    try:
        return {
            "name": b[0].text,
            "case type": b[1].text,
            "date filed": b[2].text,
            "location": b[3].text,
        }
    except IndexError:
        return {k: "Unknown" for k in
                ("name", "case type", "date filed", "location")}


def _defendant_rows(rows: list[list[str]]) -> dict:
    """hays.py:122-151 (index pattern incl. the sex/race and
    height/weight single-space splits)."""
    try:
        return {
            "defendant": rows[1][1],
            "sex": rows[1][2].split(" ")[0],
            "race": rows[1][2].split(" ")[1],
            "date of birth": rows[1][3],
            "height": rows[1][4].split(" ")[0],
            "weight": rows[1][4].split(" ")[1],
            "defense attorney": rows[1][5],
            "appointed or retained": rows[1][6],
            "defense attorney phone number": rows[1][7],
            "defendant address": rows[2][0] + " " + rows[2][1],
            "SID": rows[2][3],
        }
    except IndexError:
        return {k: "Unknown" for k in (
            "defendant", "sex", "race", "date of birth", "height",
            "weight", "defense attorney", "appointed or retained",
            "defense attorney phone number", "defendant address", "SID")}


def _state_rows(rows: list[list[str]]) -> dict:
    """hays.py:153-166."""
    try:
        return {
            "prosecuting attorney": rows[3][2],
            "prosectuing attorney phone number": rows[3][3],
        }
    except IndexError:
        return {
            "prosecuting attorney": "Unknown",
            "prosectuing attorney phone number": "Unknown",
        }


def _charge_information(table: _Node) -> list[dict]:
    """hays.py:168-190: flat text-node list, stride-5 from i=5, first
    cell of each chunk (the charge ordinal) skipped."""
    cells = [t.strip().replace("\xa0", " ") for t in table.strings()
             if t.strip()]
    return [
        dict(zip(["charges", "statute", "level", "date"],
                 cells[i + 1: i + 5]))
        for i in range(5, len(cells), 5)
    ]


def _events_rows(table: _Node) -> tuple[list[list[str]], list[list[str]]]:
    """hays.py:192-232: th-bearing rows, NBSP->space + ws collapse,
    route on row[1], reverse both lists."""
    raw = [
        [t.strip().replace("\xa0", " ") for t in tr.strings() if t.strip()]
        for tr in table.find_all("tr")
        if tr.find_all("th")
    ]
    rows = [[" ".join(w.strip() for w in text.split()) for text in r]
            for r in raw if r]
    dispo = [r for r in rows if len(r) >= 2 and r[1] in _DISPO_ROUTE]
    other = [r for r in rows if len(r) >= 2 and r[1] not in _DISPO_ROUTE]
    return dispo[::-1], other[::-1]


def _disposition(row: list[str], dispositions: list[dict]) -> list[dict]:
    """hays.py:234-272 incl. the reverse-after-each-append quirk and
    the judicial-officer slice that eats the closing paren's char."""
    if len(row) >= 5:
        jo = ""
        if len(row[2]) > 18 and row[2].startswith("(Judicial Officer:"):
            jo = row[2][18:-1].strip()
        if row[1].lower() in _DISPO_APPEND:
            details = {"charge": row[3], "outcome": row[4]}
            if len(row) > 5:
                details["additional_info"] = row[5:]
            dispositions.append({
                "date": row[0],
                "event": row[1],
                "judicial officer": jo,
                "details": [details],
            })
            dispositions.reverse()  # hays.py:265 — runs per append
    return dispositions


def _top_charge(dispositions: list[dict], charge_info: list[dict]) -> dict | None:
    """hays.py:53-86."""
    charge_map = {c.get("charges"): c.get("level") for c in charge_info}
    top, min_sev = None, float("inf")
    for d in dispositions:
        for det in d.get("details", []):
            name = (det.get("charge", "").strip().split(" >=")[0]
                    .strip().lstrip("0123456789. ").strip())
            level = charge_map.get(name, "Unknown")
            sev = _severity(level)
            if sev < min_sev:
                min_sev = sev
                top = {"charge name": name, "charge level": level}
    return top


def parse_odyssey_case(county: str, case_number: str, html: str) -> dict:
    """Real-markup equivalent of ``ParserHays.parser_hays``
    (hays.py:274-314): dispatch over ``body>table`` in document order,
    if/elif on contained text, later matches overwrite earlier keys
    exactly as the reference's loop does."""
    root = build_dom(html)
    body = root.find("body") or root
    case_data: dict = {
        "Case Metadata": _case_metadata(county, case_number, root)
    }
    for table in body.children_tagged("table"):
        text = table.text
        if "Case Type:" in text and "Date Filed:" in text:
            case_data["Case Details"] = _case_details(table)
        elif "Related Case Information" in text:
            case_data["Related Cases"] = [
                td.text.strip().replace("\xa0", " ")
                for td in table.find_all("td")
            ]
        elif "Party Information" in text:
            rows = _extract_rows(table)
            case_data["Defendent Information"] = _defendant_rows(rows)
            case_data["State Information"] = _state_rows(rows)
        elif "Charge Information" in text:
            case_data["Charge Information"] = _charge_information(table)
        elif "Events & Orders of the Court" in text:
            dispo_rows, other_rows = _events_rows(table)
            dispositions: list[dict] = []
            for row in dispo_rows:
                case_data["Disposition Information"] = _disposition(
                    row, dispositions
                )
            if case_data.get("Disposition Information"):
                case_data["Top Charge"] = _top_charge(
                    dispositions, case_data.get("Charge Information", [])
                )
                case_data["Dismissed Charges Count"] = sum(
                    1 for d in case_data["Disposition Information"]
                    for det in d.get("details", [])
                    if det.get("outcome", "").lower() == "dismissed"
                )
            case_data["Other Events and Hearings"] = other_rows
    return case_data


def body_hash(html: str) -> str:
    """Content-version hash of the page body with the balance table
    dropped (parser/__init__.py:240-254: balance changes as costs are
    paid, so it is excluded from change detection).

    The reference hashes bs4's ``str(body)`` re-serialization; without
    bs4 we hash the body's *text-node* serialization after removing a
    trailing 'Balance Due' table — same change-detection semantics
    (any case-content edit flips the hash, balance-due edits don't),
    different constant."""
    from ..functions.hashing import xxh64_hexdigest

    root = build_dom(html)
    body = root.find("body") or root
    tables = body.find_all("table")
    skip = None
    if tables and "Balance Due" in tables[-1].text:
        skip = tables[-1]

    def walk(node: _Node, out: list[str]) -> None:
        for c in node.children:
            if c is skip:
                continue
            if isinstance(c, str):
                out.append(c)
            else:
                walk(c, out)

    strs: list[str] = []
    walk(body, strs)
    payload = "\n".join(t.strip() for t in strs if t.strip())
    return xxh64_hexdigest(payload)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def parse_odyssey_pages(pages):
    """(doc_id, county, html) -> one reference-shaped JSON record per
    page.  Single ``mapInPandas`` pass — per-document-local, zero
    shuffle, linear at 100 TB; Arrow batches amortize dispatch and the
    nested record rides back to the JVM as a JSON string (same measured
    rationale as parse.parse_documents).

    Output: doc_id, county, code, case_json (full reference-shape
    record), parse_error (NULL for good rows — same quarantine contract
    as the span parser).
    """
    import json

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            out = {"doc_id": [], "county": [], "code": [],
                   "case_json": [], "parse_error": []}
            for doc_id, county, html in zip(
                batch["doc_id"], batch["county"], batch["html"]
            ):
                try:
                    rec = parse_odyssey_case(county, doc_id, html)
                    rec["html_hash"] = body_hash(html)
                    out["code"].append(
                        rec["Case Metadata"].get("code", "Unknown"))
                    out["case_json"].append(
                        json.dumps(rec, allow_nan=False))
                    out["parse_error"].append(None)
                except Exception as ex:
                    out["code"].append(None)
                    out["case_json"].append(None)
                    out["parse_error"].append(f"{type(ex).__name__}: {ex}")
                out["doc_id"].append(doc_id)
                out["county"].append(county)
            yield pd.DataFrame(out)

    return pages.mapInPandas(
        run,
        schema="doc_id string, county string, code string, "
               "case_json string, parse_error string",
    )
