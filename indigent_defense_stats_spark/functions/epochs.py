"""Timezone-free epoch arithmetic for TIMESTAMP_NTZ columns.

The test tables carry wall-clock TIMESTAMP_NTZ timestamps, and the
DuckDB oracles compute ``epoch_us(ts) // 1e6`` on the same naive
values — a timezone-free integer.  The obvious Spark spelling,
``cast(ts as timestamp).cast("long")``, is NOT timezone-free: the
NTZ→TIMESTAMP cast interprets the wall clock in the SESSION zone
(verified: epoch shifts by the zone offset under
``spark.sql.session.timeZone=America/Chicago``), and a driver-owned
session picks that zone, not the engine.  ``date_trunc`` has the same
trap (it returns a session-zone TIMESTAMP even for NTZ input), and
near DST transitions the mapping additionally warps differences.

:func:`epoch_floor_s` computes the same integer via pure FIELD
extraction — date diff plus hour/minute/floor(second) — which never
consults the session zone, equals ``epoch_us // 1e6`` for any
post-1970 timestamp, and costs four cheap JVM field reads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def epoch_floor_s(ts) -> Column:
    """Whole-second epoch of a TIMESTAMP_NTZ, timezone-independent."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (
        F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast(
            "bigint"
        )
        * 86400
        + F.hour(c).cast("bigint") * 3600
        + F.minute(c).cast("bigint") * 60
        + F.floor(F.extract(F.lit("SECOND"), c)).cast("bigint")
    )
