"""Explicit skew handling (north rule: partitioning/shuffle/skew
handled explicitly; SURVEY §4.3.1).

The engine's skew sources and their treatments:

1. **Host-key skew in the frontier** (one dominant county — Hays in
   the reference registry).  The per-host politeness group cannot be
   split (fetch order within a host is sequential by contract), so the
   treatment is architectural: everything downstream of fetch re-keys
   by ``doc_id``/``canonical_url`` hash, so a hot *host* never becomes
   a hot *processing* partition (frontier.py).
2. **Hot join keys** — :func:`replicated_skew_join` below: salt the
   big side N ways, replicate the small side N ways, join on
   (key, salt).  Unlike ``broadcast`` it works when the small side is
   too big to broadcast but small enough to replicate N-fold across
   the shuffle; unlike AQE skew-join splitting it also covers
   first-shuffle skew (AQE only splits sort-merge partitions it can
   observe).
3. **Hot group keys with non-algebraic aggregates** —
   :func:`salted_two_phase_agg`: algebraic aggregates (sum/count/min/
   max) already combine map-side, but ``collect_list``/``collect_set``
   ship every row of a hot group to one reducer; the salted first
   phase spreads that, the second phase merges the N partials.

AQE (enabled in session.py) remains the first line of defense for
*observed* sort-merge skew; these utilities are for the shapes AQE
cannot fix.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
    salt_from: Column | None = None,
) -> DataFrame:
    """Join *big* to *small* on column ``on`` with N-way salting.

    ``salt_from`` is the expression that spreads the big side
    (default: a deterministic per-row hash of all big columns, no
    rand()); the small side is replicated ``n_salt`` times.
    Result equals ``big.join(small, on, how)`` exactly for the
    supported join types.  Right/full outer are rejected: an unmatched
    small-side row would surface once per salt replica.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"replicated_skew_join supports {sorted(allowed)}; {how!r} would"
            " duplicate unmatched small-side rows n_salt times"
        )
    salt = F.pmod(
        salt_from if salt_from is not None else F.xxhash64(*[F.col(c) for c in big.columns]),
        F.lit(n_salt),
    ).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    agg_partial: Callable[[], list[Column]],
    agg_final: Callable[[], list[Column]],
    n_salt: int = 8,
) -> DataFrame:
    """Two-phase aggregation for hot keys with non-algebraic aggregates:
    phase 1 groups by (key, salt) computing partials, phase 2 merges
    the ≤ n_salt partials per key.

    ``agg_partial()`` returns the phase-1 aggregate columns,
    ``agg_final()`` the phase-2 merge over phase-1 names.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt)).cast(
        "int"
    )
    p1 = df.withColumn("__salt", salt).groupBy(key, "__salt").agg(*agg_partial())
    return p1.groupBy(key).agg(*agg_final())


def collect_list_salted(df: DataFrame, key: str, col: str, n_salt: int = 8) -> DataFrame:
    """Skew-safe ``collect_list`` (order-insensitive: result sorted).

    The vanilla ``groupBy(key).agg(collect_list(col))`` ships every
    row of a hot key through one reducer; here each reducer handles at
    most 1/n_salt of a hot key's rows and the final merge concatenates
    n_salt small arrays."""
    out = salted_two_phase_agg(
        df.select(key, col),
        key,
        lambda: [F.collect_list(col).alias("__part")],
        lambda: [
            F.sort_array(F.flatten(F.collect_list("__part"))).alias(f"{col}s")
        ],
        n_salt=n_salt,
    )
    return out


def salted_range_partition(
    df: DataFrame, n: int, cluster_col: str, salt_col: str
) -> DataFrame:
    """Salted range partitioning for skew-proof clustered sinks
    (north rule: span tables "salted and range-partitioned to defuse
    the heavy skew from large counties").

    Ranges over ``(cluster_col, xxhash64(salt_col))``: output files
    stay clustered by ``cluster_col`` (a downstream county predicate
    touches a contiguous range of files), while a hot cluster — one
    county holding most of the corpus — spans MANY consecutive ranges
    because the hashed secondary spreads its rows uniformly across
    its share of the boundaries.  Plain ``repartition(cluster_col)``
    would hash the hot county into ONE writer task; plain
    ``repartitionByRange(cluster_col)`` would bound it to adjacent
    boundaries but still sample only cluster values.  The salt column
    should be a high-cardinality stable key (``doc_id``), never
    ``rand()`` — reruns must produce the same layout.

    Cost: one range-boundary sampling pass over ``df`` (cheap when
    the input is cached, as the wave sink's is)."""
    return df.repartitionByRange(
        n, F.col(cluster_col), F.xxhash64(F.col(salt_col))
    )
