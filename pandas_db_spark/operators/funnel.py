"""Event-sequence analytics: funnel depth and cohort retention.

The ``events`` table's behavioral queries.  Both operators are
single-keyed-shuffle plans with integer outputs, so they hash-check
against exact SQL oracles.

Funnel semantics: for an ordered stage list (e.g. view → click →
purchase), a user's depth is the length of the longest prefix matched
GREEDILY over that user's events sorted by ``(ts, event_type)`` —
advance to stage i+1 at the first event after the stage-i match whose
type equals stage i+1.  Greedy-earliest matching is optimal for
subsequence containment, so this equals "does an ordered subsequence
exist", and it is exactly reproducible in SQL as a cascade of
lexicographic-tuple minima (the oracle's form): match_{i+1} = min (ts,
type) among stage-(i+1) events with (ts, type) > match_i.

Scale notes:
* ``funnel_depth`` shuffles once on the user key and scans each user's
  sorted event list with a JVM ``aggregate`` HOF.  ``collect_list``
  bounds memory by the busiest user's event count — fine for human-scale
  activity (≤10⁶ events ≈ tens of MB); for adversarial keys, pre-filter
  to the funnel's event types first (done internally: only stage types
  are collected, so off-funnel traffic never enters the list).
* ``cohort_retention`` is two keyed shuffles ((user, week) distinct →
  user min-week join → (cohort, offset) count), all integer epoch-week
  arithmetic — no timezone/calendar dependence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_WEEK_US = 7 * 86400 * 1_000_000


def funnel_depth(events: DataFrame, stages: Sequence[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Per-user greedy funnel depth over the ordered ``stages`` list.

    Returns ``(user, funnel_depth)`` for every user with at least one
    event of any type (depth 0 = never reached stage 1)."""
    stages = list(stages)
    if not stages:
        raise ValueError("funnel_depth: stages must be non-empty")
    stage_arr = F.array(*[F.lit(s) for s in stages])
    # Only funnel-relevant events enter the per-user list (skew guard).
    ev = events.where(F.col(type_col).isin(stages) |
                      F.lit(False))  # isin alone; explicit for readability
    relevant = (ev.groupBy(user_col)
                .agg(F.array_sort(
                    F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                            F.col(type_col).alias("t"))))
                    .alias("__evs")))
    depth = F.aggregate(
        F.col("__evs"), F.lit(0),
        lambda acc, e: F.when(
            (acc < len(stages)) & (e["t"] == F.element_at(stage_arr,
                                                          acc + 1)),
            acc + 1).otherwise(acc))
    depths = relevant.select(F.col(user_col),
                             depth.cast("int").alias("funnel_depth"))
    # users with events but none in the funnel: depth 0
    all_users = events.select(user_col).distinct()
    return (all_users.join(depths, user_col, "left")
            .select(user_col,
                    F.coalesce("funnel_depth", F.lit(0)).alias(
                        "funnel_depth")))


def sessionize(events: DataFrame, gap_minutes: int = 15,
               user_col: str = "user_id", ts_col: str = "ts",
               order_cols: Sequence[str] = ("event_id",)) -> DataFrame:
    """Per-event session labeling: adds ``session_idx`` (0-based, per
    user, in time order) — a new session starts when the gap since the
    user's previous event exceeds ``gap_minutes``.

    The per-row sibling of the session-window AGGREGATE
    (streaming/windows.session): that one answers "how many sessions and
    how big", this one tags every event so downstream joins can group by
    (user, session).  Plan: one keyed shuffle; lag + running sum over
    the same (user, ts, tiebreak) window — two window functions, one
    sort, no self-join.  ``order_cols`` break same-timestamp ties so the
    labeling is deterministic."""
    from pyspark.sql import Window
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.unix_micros(prev.cast("timestamp"))
    new_sess = F.when(prev.isNull(), F.lit(0)).when(
        ts_us - prev_us > gap_us, F.lit(1)).otherwise(F.lit(0))
    return events.withColumn(
        "session_idx",
        (F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0))).cast("long"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: ``(cohort_week, week_offset, n_users)``
    — users whose FIRST activity fell in epoch-week ``cohort_week`` and
    who were also active ``week_offset`` weeks later.  Integer epoch
    weeks (``unix_micros div week``), engine-neutral."""
    # exact integral division: subtract the modulo first so the double
    # division is exact (never a float-truncation boundary flip).
    # The cast handles TIMESTAMP_NTZ sources (the nanos parquet path) —
    # an identity on the stored micros under the session's pinned-UTC
    # timezone (session.py).
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    wk = ((us - us % _WEEK_US) / _WEEK_US).cast("long")
    active = (events.select(F.col(user_col).alias("u"), wk.alias("week"))
              .distinct())
    first = active.groupBy("u").agg(F.min("week").alias("cohort_week"))
    return (active.join(first, "u")
            .select("cohort_week",
                    (F.col("week") - F.col("cohort_week"))
                    .alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


def transition_counts(events: DataFrame, gap_minutes: int = 15,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      order_cols: Sequence[str] = ("event_id",)
                      ) -> DataFrame:
    """First-order Markov transition counts over sessionized event
    streams: ``(from_type, to_type, n, n_from)`` for every consecutive
    in-session event pair, where ``n_from`` is the total transitions
    leaving ``from_type`` — the transition PROBABILITY is ``n / n_from``,
    left as a division for the caller so the surface stays exact
    integers (the TVD discipline).

    The behavioral-analytics sibling of :func:`funnel_depth`: the funnel
    checks ONE prescribed path, the transition matrix surfaces every
    observed path edge (where users actually go next, loop intensity,
    drop points).  Plan: :func:`sessionize`'s single keyed window + one
    ``lead`` over the same (user, ts, tiebreak) ordering — Catalyst
    folds both into ONE sort/shuffle — then a map-side-combined
    ``groupBy(from, to)`` with per-from totals as a window over the
    already-aggregated (|types|², tiny) edge table.
    Session boundaries (and the last event of each session) emit no
    pair; NULL users or types are excluded up front."""
    e = events.where(F.col(user_col).isNotNull()
                     & F.col(type_col).isNotNull())
    s = sessionize(e, gap_minutes, user_col, ts_col, order_cols)
    from pyspark.sql import Window
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    # lead over the USER window — the same (user, ts, tiebreak) sort
    # sessionize already established, so no second Exchange (a
    # (user, session_idx) window would re-partition: HashPartitioning
    # on user does not satisfy it even though sessions nest in users).
    # Cross-session successors are dropped by the session-idx equality.
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (s.select(F.col(type_col).alias("from_type"),
                      F.lead(F.col(type_col)).over(w).alias("to_type"),
                      F.col("session_idx"),
                      F.lead(F.col("session_idx")).over(w)
                      .alias("__next_sess"))
             .where(F.col("to_type").isNotNull()
                    & (F.col("__next_sess") == F.col("session_idx"))))
    n = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n"))
    # per-from totals as a window over the ALREADY-AGGREGATED edge
    # table (|types|^2 rows) — a groupBy-and-join-back would plan the
    # whole pair subtree twice (measured: the broadcast side re-ran
    # scan -> windows -> count)
    tw = Window.partitionBy("from_type")
    return n.select("from_type", "to_type", "n",
                    F.sum("n").over(tw).cast("long").alias("n_from"))
