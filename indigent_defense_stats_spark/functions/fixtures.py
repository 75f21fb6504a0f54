"""Shared helpers for arithmetic fixture universes (the media-query
convention: derive every synthetic attribute from an integer id so
the DuckDB oracle can replay the construction verbatim).

Centralized because four operator modules grew private copies with
subtly different SQL-literal escaping — a fixture string containing
an apostrophe would have produced broken oracle SQL in the copies
that did not escape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def pick_lit(arr: list[str], idx: Column) -> Column:
    """1-based pick from a literal string array by an integer column
    (callers pass the 0-based mix; +1 happens here)."""
    return F.element_at(F.array(*[F.lit(x) for x in arr]), idx.cast("int") + 1)


def sql_list_lit(arr: list[str]) -> str:
    """DuckDB list literal with single-quote escaping."""
    return "[" + ",".join("'" + x.replace("'", "''") + "'" for x in arr) + "]"
