"""Skew mitigation for large-large joins and hot-key aggregations.

AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on by default in
session.py) already handles most skew at runtime by splitting oversized
shuffle partitions.  These operators cover the cases AQE can't:

* a *single key* so hot that even one partition of it blows an executor
  (AQE splits partitions, not keys) → :func:`salted_join` spreads one key
  across ``n_salts`` reducers by replicating the other side;
* hot-key ``groupBy`` where the partial aggregate per map task is already
  huge → :func:`salted_agg` does a two-stage (salted partial → final) agg.

Both are pure DataFrame compositions — the salt column is engine-side
``rand``/``pmod``, no Python, and the plans stay shuffle-minimal: salting
adds exactly one narrow projection to the big side and an ``explode`` of
``n_salts`` literals to the small(er) side.

The reference has no join surface at all (SURVEY §2.4 — joins only via raw
SQL, reference pandasdb/connection.py:168-189); this is beyond-parity scale
machinery.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(skewed: DataFrame, other: DataFrame, on: Sequence[str],
                how: str = "inner", n_salts: int = 16) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: ``skewed`` rows get a random
    salt in [0, n_salts); ``other`` is replicated once per salt value; the
    join key becomes (key..., salt), so one hot key now occupies ``n_salts``
    reducers instead of one.

    Cost model: the replicated side shuffles ``n_salts`` × its size — use
    this when ``other`` is too big to broadcast but much smaller than the
    skewed fact side (the classic fact × mid-size dim with a power-law key).
    Supported ``how``: inner / left (semantics preserved because every
    skewed row keeps exactly its original key match set)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    left = skewed.withColumn(
        _SALT, F.pmod(F.floor(F.rand(seed=7) * n_salts), F.lit(n_salts))
                .cast("int"))
    right = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return left.join(right, on + [_SALT], how).drop(_SALT)


# final-stage merge function per partial aggregate: partial counts are
# summed, not re-counted; min/max are idempotent under re-application.
_AGG_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: Sequence[tuple[str, str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: partial-aggregate by
    (keys..., salt) — spreading each hot key over ``n_salts`` reducers —
    then merge by keys alone.  ``aggs`` is a list of
    ``(column, fn, alias)`` with ``fn`` ∈ sum/count/min/max (decomposable
    aggregates; express avg as sum + count and divide afterwards).

    Note Spark's hash aggregate already does map-side partial aggregation,
    which absorbs most groupBy skew; this helps when per-key partial state
    is too large (e.g. collect_set on a hot key) or AQE is disabled."""
    keys = list(keys)
    for _, fn, _ in aggs:
        if fn not in _AGG_MERGE:
            raise ValueError(
                f"fn={fn!r} is not decomposable (allowed: {sorted(_AGG_MERGE)})")
    salted = df.withColumn(
        _SALT, F.pmod(F.floor(F.rand(seed=7) * n_salts), F.lit(n_salts))
                .cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[getattr(F, fn)(c).alias(alias) for c, fn, alias in aggs])
    return partial.groupBy(*keys).agg(
        *[getattr(F, _AGG_MERGE[fn])(alias).alias(alias)
          for _, fn, alias in aggs])
