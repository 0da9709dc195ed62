"""Funnel depth + cohort retention (operators/funnel.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandas_db_spark.operators import funnel as FU


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string")


def test_funnel_hand_cases(spark):
    ev = _ev(spark, [
        # user 1: full funnel in order
        (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "purchase"),
        # user 2: purchase BEFORE view/click → depth 2
        (2, 1, 1, "purchase"), (2, 1, 2, "view"), (2, 1, 3, "click"),
        # user 3: only off-funnel traffic → depth 0
        (3, 1, 1, "error"),
        # user 4: view only → depth 1
        (4, 1, 1, "view"),
    ])
    got = {r["user_id"]: r["funnel_depth"] for r in
           FU.funnel_depth(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 1}


def test_funnel_same_timestamp_tiebreak(spark):
    # click and view at the SAME instant: 'click' < 'view' sorts the
    # click first, so it cannot serve as the post-view click (depth 1);
    # purchase at the same instant as a click sorts after ('p' > 'c'),
    # so it does count (depth 3 for user 2).
    ev = _ev(spark, [
        (1, 1, 1, "view"), (1, 1, 1, "click"),
        (2, 1, 1, "view"), (2, 1, 2, "click"), (2, 1, 2, "purchase"),
    ])
    got = {r["user_id"]: r["funnel_depth"] for r in
           FU.funnel_depth(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 1, 2: 3}


def test_funnel_repeated_stages(spark):
    # multiple views then a late click: greedy uses the EARLIEST view,
    # any later click completes stage 2
    ev = _ev(spark, [(1, 1, h, "view") for h in range(1, 5)]
             + [(1, 2, 1, "click")])
    got = FU.funnel_depth(ev, ["view", "click"]).collect()
    assert got[0]["funnel_depth"] == 2


def test_funnel_empty_stages_raises(spark, db):
    with pytest.raises(ValueError, match="non-empty"):
        FU.funnel_depth(db.events.df, [])


def test_cohort_retention_hand_case(spark):
    # weeks are epoch-aligned; use two consecutive Thursdays (epoch week
    # boundary) — just assert structural properties instead of absolute
    # week ids: offset 0 row contains every user of the cohort.
    ev = _ev(spark, [
        (1, 1, 1, "view"), (1, 10, 1, "view"),   # active 2 weeks
        (2, 1, 1, "view"),                        # week 1 only
    ])
    rows = FU.cohort_retention(ev).collect()
    by_off = {(r["cohort_week"], r["week_offset"]): r["n_users"]
              for r in rows}
    offs = sorted(k[1] for k in by_off)
    assert offs[0] == 0 and by_off[min(by_off)] == 2  # both users at offset 0
    assert sum(1 for k in by_off if k[1] > 0) == 1    # one retained row


def test_funnel_matches_oracle_sf(spark, db, duck):
    got = {r["user_id"]: r["funnel_depth"] for r in
           FU.funnel_depth(db.events.df,
                           ["view", "click", "purchase"]).collect()}
    want = {u: d for u, d in duck.execute("""
        WITH t1 AS (SELECT user_id, min(ts) ts1 FROM events
                    WHERE event_type='view' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(e.ts) ts2 FROM events e
               JOIN t1 ON e.user_id=t1.user_id
               WHERE e.event_type='click' AND e.ts > t1.ts1
               GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, min(e.ts) ts3 FROM events e
               JOIN t2 ON e.user_id=t2.user_id
               WHERE e.event_type='purchase' AND e.ts >= t2.ts2
               GROUP BY e.user_id)
        SELECT u.user_id, CASE WHEN ts3 IS NOT NULL THEN 3
               WHEN ts2 IS NOT NULL THEN 2 WHEN ts1 IS NOT NULL THEN 1
               ELSE 0 END FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN t1 ON u.user_id=t1.user_id
        LEFT JOIN t2 ON u.user_id=t2.user_id
        LEFT JOIN t3 ON u.user_id=t3.user_id""").fetchall()}
    assert got == want


def test_sessionize_hand_case(spark):
    ev = _ev(spark, [
        (1, 1, 1, "view"), (1, 1, 2, "view"),   # 1h gap > 15min → new
        (2, 1, 1, "view"),
    ])
    got = {(r["user_id"], r["ts"].hour): r["session_idx"]
           for r in FU.sessionize(ev, gap_minutes=15,
                                  order_cols=()).collect()}
    assert got == {(1, 1): 0, (1, 2): 1, (2, 1): 0}


def test_sessionize_gap_boundary(spark):
    import datetime as dtm
    rows = [(1, dtm.datetime(2024, 1, 1, 0, 0, 0), "a"),
            (1, dtm.datetime(2024, 1, 1, 0, 15, 0), "b"),   # == gap: same
            (1, dtm.datetime(2024, 1, 1, 0, 30, 1), "c")]   # > gap: new
    ev = spark.createDataFrame(
        [(u, t, ty) for u, t, ty in rows],
        "user_id long, ts timestamp, event_type string") \
        .withColumn("event_id", F.monotonically_increasing_id())
    got = [r["session_idx"] for r in
           FU.sessionize(ev, gap_minutes=15).orderBy("ts").collect()]
    assert got == [0, 0, 1]


def test_sessionize_counts_match_session_windows(spark, db):
    """#sessions per user from per-event labels == the session-window
    aggregate's count (same 15-min gap rule)."""
    from pandas_db_spark.streaming import windows as W
    lab = (FU.sessionize(db.events.df, gap_minutes=15)
           .groupBy("user_id")
           .agg((F.max("session_idx") + 1).alias("n")))
    agg = (W.session(db.events.df, gap="15 minutes", keys=("user_id",))
           .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, lab.collect())) == \
        sorted(map(tuple, agg.collect()))


# ---------------------------------------------------------------------
# transition_counts — Markov edges over sessionized streams
# ---------------------------------------------------------------------

def test_transition_counts_hand_computed(spark):
    """One user, two sessions (40-min gap splits), one NULL-type event
    excluded: pairs never cross the session boundary, the last event of
    each session emits nothing, and n_from sums the from-side."""
    from datetime import datetime as dt
    from pandas_db_spark.operators.funnel import transition_counts

    rows = [
        (1, dt(2024, 1, 1, 10, 0), 7, "view"),
        (2, dt(2024, 1, 1, 10, 5), 7, "click"),
        (3, dt(2024, 1, 1, 10, 8), 7, "view"),
        # 40-minute gap -> new session: (view->buy) NOT (view)->(buy)
        (4, dt(2024, 1, 1, 10, 48), 7, "view"),
        (5, dt(2024, 1, 1, 10, 50), 7, "buy"),
        (6, dt(2024, 1, 1, 10, 52), 7, None),      # excluded
        (7, dt(2024, 1, 1, 10, 53), None, "view"),  # excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got = {(r["from_type"], r["to_type"]): (r["n"], r["n_from"])
           for r in transition_counts(df, gap_minutes=15).collect()}
    assert got == {
        ("view", "click"): (1, 2),
        ("click", "view"): (1, 1),
        ("view", "buy"): (1, 2),
    }


def test_transition_counts_same_ts_tiebreak_deterministic(spark):
    """Equal timestamps order by event_id, so the pair direction is
    pinned."""
    from datetime import datetime as dt
    from pandas_db_spark.operators.funnel import transition_counts

    t = dt(2024, 1, 1, 12, 0)
    df = spark.createDataFrame(
        [(10, t, 1, "a"), (11, t, 1, "b"), (12, t, 1, "c")],
        "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r["from_type"], r["to_type"]) for r in
           transition_counts(df).collect()}
    assert got == {("a", "b"), ("b", "c")}
