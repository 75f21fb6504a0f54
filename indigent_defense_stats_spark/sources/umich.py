"""UMich UCCS charge-dimension loader.

The reference ships a 7,621-row JSON charge database
(resources/umich-uccs-database.json; first row is a header-shaped
dummy) and builds ``{charge_name: item}``
(src/cleaner/__init__.py:72-84) — a dict comprehension, so for the
251 duplicated charge_names the LAST occurrence silently wins.  A
naive DataFrame load would instead FAN OUT the cleaner's inner join
on those names; this loader reproduces the dict semantics exactly:
keep the last occurrence per charge_name (file order), drop the
header row.

The dimension is small (~7.4k rows) — broadcast at the join site
(operators/clean.py), never shuffled.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import schemas

UMICH_PATH = "/root/reference/resources/umich-uccs-database.json"

_COLS = [f.name for f in schemas.CHARGE_DIM.fields]


def load_umich_dim(spark: SparkSession, path: str = UMICH_PATH) -> DataFrame:
    """JSON file -> CHARGE_DIM DataFrame with dict-overwrite dedup.

    Driver-side read + Arrow local relation: the file is a bounded
    dimension (list-of-dicts JSON, not JSONL — spark.read.json would
    need multiLine and still misread the header row), and the
    last-wins dedup needs file order, which a distributed read does
    not guarantee.
    """
    with open(path, encoding="utf-8") as f:
        rows = json.load(f)
    out: dict[str, dict] = {}
    for item in rows:
        name = item.get("charge_name")
        if name == "charge_name":  # header-shaped dummy first row
            continue
        out[name] = item  # later duplicates overwrite (cleaner:81)
    pdf = pd.DataFrame(
        [[v.get(c) for c in _COLS] for v in out.values()], columns=_COLS
    )
    return spark.createDataFrame(pdf, schemas.CHARGE_DIM)
