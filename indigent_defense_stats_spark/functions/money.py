"""F10 money parsing (reference: src/tools/print_stats.py:54-60 —
``float(case["financial information"]["total financial assessment"]
.replace(",", ""))`` with a 0.0 default when the section is absent).

Pure JVM column expressions — no UDF, stays inside whole-stage
codegen, vectorized over the parquet scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def parse_money(col) -> Column:
    """'1,234.56' / '$1,234.56' -> 1234.56 (double).

    Strips currency symbols and thousands separators, then casts.
    Unparseable strings -> NULL (the cast's behavior), which callers
    default with ``coalesce`` — Spark-native quarantine instead of the
    reference's crash-on-bad-string ``float()``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[$,]", "").cast("double")


def money_or_zero(col) -> Column:
    """The reference's ``else 0.0`` default for cases with no
    financial section (print_stats.py:59)."""
    return F.coalesce(parse_money(col), F.lit(0.0))
