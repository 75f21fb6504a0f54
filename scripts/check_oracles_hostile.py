#!/usr/bin/env python
"""Oracle sweep under a HOSTILE host session — the config-independence
gate.

The grading driver (and any host application) hands the engine ITS
SparkSession; none of the engine's session tuning applies.  Merely
pre-creating a session is NOT enough to simulate that, because
``SparkSession.builder.getOrCreate()`` silently re-applies builder
confs to an existing session — so this script wraps ``get_spark`` and
overrides the runtime confs AFTER it returns:

- ``spark.sql.session.timeZone`` — a non-UTC zone (flushes out any
  NTZ→TIMESTAMP cast on a value path; caught 7 queries live)
- ``spark.sql.shuffle.partitions=7`` — different parallelism (flushes
  out partition-order-dependent float accumulation)
- ``spark.sql.ansi.enabled=false`` — the non-default dialect
- ``spark.sql.adaptive.enabled=false`` — no runtime re-planning
- ``spark.sql.autoBroadcastJoinThreshold=-1`` — every non-hinted join
  degrades to sort-merge (different join strategy, same values)

Green here means query VALUES are independent of plan shape, join
strategy, partition count, ANSI dialect, and session zone.

Usage (same args as check_oracles.py):
    TZ=Asia/Kolkata python scripts/check_oracles_hostile.py [query ...]
    HOSTILE_TZ=America/Chicago python scripts/check_oracles_hostile.py
"""

from __future__ import annotations

import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import indigent_defense_stats_spark.session as _sess  # noqa: E402

_real_get_spark = _sess.get_spark

HOSTILE_CONFS = {
    "spark.sql.session.timeZone": os.environ.get("HOSTILE_TZ", "Asia/Kolkata"),
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _hostile_get_spark(*args, **kwargs):
    spark = _real_get_spark(*args, **kwargs)
    for k, v in HOSTILE_CONFS.items():
        spark.conf.set(k, v)
    return spark


_sess.get_spark = _hostile_get_spark

runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_oracles.py"),
    run_name="__main__",
)
