"""Temporal joins: as-of and range join must equal brute-force references
computed driver-side at sf0.001, honor tolerance semantics, and keep
cartesian-free shuffle-minimal plans."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pandas_db_spark.operators import temporal as T
from pandas_db_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def sides(db):
    e = db.events.df
    left = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts", "event_id"))
    right = (e.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id")))
    return left, right


def _brute_asof(left_rows, right_rows):
    by_user: dict[int, list] = {}
    for r in right_rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r["ts"])
    out = {}
    for l in left_rows:
        best = None
        for r in by_user.get(l["user_id"], []):
            if r["ts"] <= l["ts"]:
                best = r
            else:
                break
        out[l["event_id"]] = (best["ts"], best["click_id"]) if best else (None, None)
    return out


def test_asof_join_matches_brute_force(sides):
    left, right = sides
    got = {r["event_id"]: (r["ts_r"], r["click_id_r"])
           for r in T.asof_join(left, right, ["user_id"]).collect()}
    want = _brute_asof(left.collect(), right.collect())
    assert got == want
    assert len(got) == left.count()  # left join: every purchase kept


def test_asof_tolerance_nulls_stale_matches(sides):
    left, right = sides
    tol = 600  # 10 minutes
    got = {r["event_id"]: (r["ts_r"], r["click_id_r"])
           for r in T.asof_join(left, right, ["user_id"],
                                tolerance_s=tol).collect()}
    want = _brute_asof(left.collect(), right.collect())
    lts = {r["event_id"]: r["ts"] for r in left.collect()}
    for eid, (rts, cid) in want.items():
        if rts is not None and (lts[eid] - rts).total_seconds() > tol:
            assert got[eid] == (None, None)
        else:
            assert got[eid] == (rts, cid)


def test_asof_plan_one_shuffle_no_join(db):
    # raw sides (no upstream agg) so the plan shows the operator's own cost
    e = db.events.df
    left = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts", "event_id"))
    right = (e.filter(F.col("event_type") == "click")
              .select("user_id", "ts",
                      F.col("event_id").alias("click_id")))
    plan = formatted_plan(T.asof_join(left, right, ["user_id"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # union + one keyed window: a single full-data exchange on the by keys
    # (formatted plans print each node twice: tree line + "(n) Node" detail)
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_range_join_matches_brute_force(db):
    e = db.events.df
    v = (e.filter(F.col("event_type") == "view")
          .select("user_id", "ts", "event_id"))
    s = (e.filter(F.col("event_type") == "signup")
          .select("user_id", F.col("ts").alias("lo"),
                  (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("hi"),
                  F.col("event_id").alias("signup_id")))
    got = {(r["event_id"], r["signup_id"])
           for r in T.range_join(v, s, by=["user_id"]).collect()}
    views, sign = v.collect(), s.collect()
    want = {(a["event_id"], b["signup_id"])
            for a in views for b in sign
            if a["user_id"] == b["user_id"] and b["lo"] <= a["ts"] <= b["hi"]}
    assert got == want
    assert len(got) > 0
    plan = formatted_plan(T.range_join(v, s, by=["user_id"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- property: asof_join vs pandas merge_asof on random data ---------------

from hypothesis import HealthCheck, given, settings, strategies as st

_EVENTS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),      # key
              st.integers(min_value=0, max_value=1000)),  # epoch seconds
    min_size=1, max_size=25)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(lrows=_EVENTS, rrows=_EVENTS)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    import pandas as pd

    # dedupe right on (key, ts) for a deterministic match (documented
    # contract); give each right row a payload to carry
    rmap = {}
    for i, (k, ts) in enumerate(rrows):
        rmap[(k, ts)] = i
    lpdf = pd.DataFrame(
        [(k, pd.Timestamp(ts, unit="s"), i)
         for i, (k, ts) in enumerate(lrows)],
        columns=["k", "ts", "lid"])
    rpdf = pd.DataFrame(
        [(k, pd.Timestamp(ts, unit="s"), v) for (k, ts), v in rmap.items()],
        columns=["k", "ts", "rid"])

    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = {r["lid"]: r["rid_r"]
           for r in T.asof_join(left, right, ["k"]).collect()}

    want_df = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]), rpdf.sort_values("ts"),
        on="ts", by="k", direction="backward", suffixes=("", "_r"))
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in want_df.itertuples()}
    assert got == want


# -- struct-packed payload: matched row is ONE right row -------------------

def test_asof_null_payload_survives(spark):
    """A right row whose payload column is legitimately NULL must not be
    back-filled from an older right row: the whole matched payload comes
    from a single right row (struct-packed last, not per-column last)."""
    import datetime as dt

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame([(1, t(10), 100)], "k int, ts timestamp, lid int")
    right = spark.createDataFrame(
        [(1, t(5), 1, 2), (1, t(8), None, 9)],
        "k int, ts timestamp, a int, b int")
    for chunk in (None, 4):
        rows = T.asof_join(left, right, ["k"], chunk_s=chunk).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["ts_r"] == t(8)
        assert r["a_r"] is None, f"chunk_s={chunk}: NULL back-filled from older row"
        assert r["b_r"] == 9


def test_asof_chunked_equals_plain(sides):
    """chunk_s is a physical-plan lever only: results must be identical to
    the single-window path (including chunks with no right rows, where the
    boundary carry-in supplies the match)."""
    left, right = sides
    plain = {r["event_id"]: (r["ts_r"], r["click_id_r"])
             for r in T.asof_join(left, right, ["user_id"]).collect()}
    chunked = {r["event_id"]: (r["ts_r"], r["click_id_r"])
               for r in T.asof_join(left, right, ["user_id"],
                                    chunk_s=6 * 3600).collect()}
    assert chunked == plain


def test_asof_hot_key_spreads_over_chunks(spark):
    """90% of rows on one key: with chunk_s the window partitions on
    (key, chunk), so the hot key is processed by many tasks — assert the
    hot key actually lands in >1 window partition, and the result still
    matches brute force."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    lrows = [(7, base + dt.timedelta(seconds=13 * i), i) for i in range(900)]
    lrows += [(i % 9, base + dt.timedelta(seconds=60 * i), 900 + i)
              for i in range(100)]
    rrows = [(7, base + dt.timedelta(seconds=37 * i), i) for i in range(300)]
    left = spark.createDataFrame(lrows, "k int, ts timestamp, lid int")
    right = spark.createDataFrame(rrows, "k int, ts timestamp, rid int")

    chunk_s = 600
    out = T.asof_join(left, right, ["k"], chunk_s=chunk_s)
    got = {r["lid"]: r["rid_r"] for r in out.collect()}

    # brute force
    rs = sorted([r for r in rrows if r[0] == 7], key=lambda r: r[1])
    for lid in range(900):
        lts = lrows[lid][1]
        best = None
        for k, ts, rid in rs:
            if ts <= lts:
                best = rid
            else:
                break
        assert got[lid] == best
    # the hot key's rows span >1 (key, chunk) window partition
    n_chunks = (left.filter(F.col("k") == 7)
                    .select((F.unix_timestamp("ts") / chunk_s)
                            .cast("long").alias("c"))
                    .distinct().count())
    assert n_chunks > 1


# ---------------------------------------------------------------------
# interval_join (interval x interval overlap) — r12 part 4
# ---------------------------------------------------------------------

def _iv(spark, rows, prefix):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [(i, base + dt.timedelta(minutes=lo), base + dt.timedelta(minutes=hi))
            for i, (lo, hi) in enumerate(rows)]
    return spark.createDataFrame(
        data, f"{prefix}id long, {prefix}lo timestamp, {prefix}hi timestamp")


def test_interval_join_matches_brute_force(spark):
    """Random minute-scale intervals vs a small bucket (600 s), so many
    pairs span several buckets: chunked join == the O(n^2) predicate."""
    import random

    from pandas_db_spark.operators.temporal import interval_join

    rng = random.Random(5)
    L = [(a, a + rng.randrange(0, 90)) for a in
         (rng.randrange(0, 600) for _ in range(40))]
    R = [(a, a + rng.randrange(0, 90)) for a in
         (rng.randrange(0, 600) for _ in range(40))]
    lt, rt = _iv(spark, L, "l"), _iv(spark, R, "r")
    got = {(r["lid"], r["rid"]) for r in interval_join(
        lt, rt, "llo", "lhi", "rlo", "rhi", bucket_s=600).collect()}
    want = {(i, j) for i, (a, b) in enumerate(L)
            for j, (c, d) in enumerate(R) if a <= d and c <= b}
    assert got == want and len(want) > 0


def test_interval_join_anchor_dedup_no_distinct(spark):
    """An 5-hour interval overlapping a 5-hour interval shares 5+ hourly
    buckets; the anchor rule must emit the pair exactly ONCE — and
    genuine duplicate input rows must emit once EACH (no distinct)."""
    from pandas_db_spark.operators.temporal import interval_join

    lt = _iv(spark, [(0, 300), (0, 300)], "l")  # two identical rows
    rt = _iv(spark, [(30, 330)], "r")
    out = interval_join(lt, rt, "llo", "lhi", "rlo", "rhi",
                        bucket_s=3600).collect()
    assert len(out) == 2  # one per duplicate left row, not 2 x buckets


def test_interval_join_by_keys_touching_and_disjoint(spark):
    import datetime as dt

    from pandas_db_spark.operators.temporal import interval_join

    base = dt.datetime(2024, 1, 1)
    m = lambda x: base + dt.timedelta(minutes=x)  # noqa: E731
    lt = spark.createDataFrame(
        [("k1", 1, m(0), m(60)), ("k2", 2, m(0), m(60))],
        "k string, lid long, llo timestamp, lhi timestamp")
    rt = spark.createDataFrame(
        [("k1", 10, m(60), m(90)),    # touches at the closed endpoint
         ("k1", 11, m(61), m(90)),    # disjoint by one minute
         ("k2", 12, m(59), m(90))],   # overlaps but only under k2
        "k string, rid long, rlo timestamp, rhi timestamp")
    got = {(r["lid"], r["rid"]) for r in interval_join(
        lt, rt, "llo", "lhi", "rlo", "rhi", by=["k"]).collect()}
    assert got == {(1, 10), (2, 12)}


def test_interval_join_validation(spark):
    import pytest as _pt

    from pandas_db_spark.operators.temporal import interval_join

    lt = _iv(spark, [(0, 10)], "l")
    with _pt.raises(ValueError, match="both sides"):
        interval_join(lt, lt, "llo", "lhi", "llo", "lhi")
    rt = _iv(spark, [(0, 10)], "r")
    with _pt.raises(ValueError, match="bucket_s"):
        interval_join(lt, rt, "llo", "lhi", "rlo", "rhi", bucket_s=0)


# ---------------------------------------------------------------------
# merge_intervals (gaps-and-islands) — r12 part 4
# ---------------------------------------------------------------------

def test_merge_intervals_absorbs_contained_and_touching(spark):
    """[0,60] absorbs [10,20]; [60,70] touches the closed endpoint and
    merges; [80,90] is its own island — the running-max (not lag)
    semantics, plus counts."""
    from pandas_db_spark.operators.temporal import merge_intervals

    iv = _iv(spark, [(0, 60), (10, 20), (60, 70), (80, 90),
                     (5, 15)], "l")
    iv = iv.withColumn("k", F.lit("u"))
    got = [(r["island_idx"], r["llo"].minute, r["lhi"].minute,
            r["n_intervals"])
           for r in merge_intervals(iv, ["k"], "llo", "lhi")
           .orderBy("island_idx").collect()]
    assert got == [(0, 0, 10, 4), (1, 20, 30, 1)]


def test_merge_intervals_gap_tolerance_and_keys(spark):
    from pandas_db_spark.operators.temporal import merge_intervals

    a = _iv(spark, [(0, 10), (12, 20)], "l").withColumn("k", F.lit("a"))
    b = _iv(spark, [(0, 10), (12, 20)], "l").withColumn("k", F.lit("b"))
    both = a.union(b)
    strict = merge_intervals(both, ["k"], "llo", "lhi")
    assert strict.count() == 4  # 2-minute gap splits per key
    loose = merge_intervals(both, ["k"], "llo", "lhi", gap_s=180)
    got = {(r["k"], r["island_idx"]): r["n_intervals"]
           for r in loose.collect()}
    assert got == {("a", 0): 2, ("b", 0): 2}


def test_merge_intervals_matches_python_replay(spark):
    import random

    from pandas_db_spark.operators.temporal import merge_intervals

    rng = random.Random(31)
    rows = []
    for _ in range(80):
        a = rng.randrange(0, 500)
        rows.append((a, a + rng.randrange(0, 40)))
    iv = _iv(spark, rows, "l").withColumn("k", F.lit("u"))
    got = sorted((r["island_idx"], r["llo"], r["lhi"], r["n_intervals"])
                 for r in merge_intervals(iv, ["k"], "llo", "lhi")
                 .collect())
    # replay: sort, sweep with running max
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    ivs = sorted((base + dt.timedelta(minutes=a),
                  base + dt.timedelta(minutes=b)) for a, b in rows)
    islands, cur = [], None
    for lo, hi in ivs:
        if cur is None or lo > cur[1]:
            cur = [lo, hi, 1]
            islands.append(cur)
        else:
            cur[1] = max(cur[1], hi)
            cur[2] += 1
    want = sorted((i, lo, hi, n)
                  for i, (lo, hi, n) in enumerate(islands))
    assert got == want


def test_merge_intervals_drops_null_and_inverted(spark):
    import datetime as dt

    from pandas_db_spark.operators.temporal import merge_intervals

    base = dt.datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [("u", base, base + dt.timedelta(minutes=5)),
         ("u", None, base),
         ("u", base + dt.timedelta(minutes=3), base)],  # inverted
        "k string, llo timestamp, lhi timestamp")
    out = merge_intervals(iv, ["k"], "llo", "lhi").collect()
    assert len(out) == 1 and out[0]["n_intervals"] == 1
    import pytest as _pt
    with _pt.raises(ValueError, match="gap_s"):
        merge_intervals(iv, ["k"], "llo", "lhi", gap_s=-1)


# ---------------------------------------------------------------------
# concurrency_profile (sweep line) — r12 part 4
# ---------------------------------------------------------------------

def test_concurrency_profile_global_matches_python_sweep(spark):
    import datetime as dt
    import random

    from pandas_db_spark.operators.temporal import concurrency_profile

    rng = random.Random(9)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for _ in range(60):
        a = rng.randrange(0, 500)
        rows.append((base + dt.timedelta(minutes=a),
                     base + dt.timedelta(minutes=a + rng.randrange(0, 40))))
    iv = spark.createDataFrame(rows, "lo timestamp, hi timestamp")
    got = sorted((r["ts_us"], r["n_active"])
                 for r in concurrency_profile(iv).collect())
    # python sweep in micros
    us = lambda t: int(t.timestamp() * 1_000_000)  # noqa: E731
    deltas = {}
    for lo, hi in rows:
        deltas[us(lo)] = deltas.get(us(lo), 0) + 1
        deltas[us(hi) + 1] = deltas.get(us(hi) + 1, 0) - 1
    want, run = [], 0
    for t in sorted(deltas):
        run += deltas[t]
        want.append((t, run))
    assert got == want
    # peak sanity: ends at zero
    assert got[-1][1] == 0


def test_concurrency_profile_touching_endpoints_no_dip(spark):
    import datetime as dt

    from pandas_db_spark.operators.temporal import concurrency_profile

    base = dt.datetime(2024, 1, 1)
    m = lambda x: base + dt.timedelta(minutes=x)  # noqa: E731
    # [0,10] and [10,20]: at minute 10 BOTH are active (closed), so the
    # profile is 1,2,1,0 — a half-open reading would dip to 1-1-1
    iv = spark.createDataFrame([(m(0), m(10)), (m(10), m(20))],
                               "lo timestamp, hi timestamp")
    prof = [r["n_active"] for r in concurrency_profile(iv)
            .orderBy("ts_us").collect()]
    assert prof == [1, 2, 1, 0]


def test_concurrency_profile_keyed(spark):
    import datetime as dt

    from pandas_db_spark.operators.temporal import concurrency_profile

    base = dt.datetime(2024, 1, 1)
    m = lambda x: base + dt.timedelta(minutes=x)  # noqa: E731
    iv = spark.createDataFrame(
        [("a", m(0), m(10)), ("a", m(5), m(15)), ("b", m(0), m(1))],
        "k string, lo timestamp, hi timestamp")
    got = {(r["k"], r["ts_us"]): r["n_active"]
           for r in concurrency_profile(iv, by=["k"]).collect()}
    peaks = {}
    for (k, _), n in got.items():
        peaks[k] = max(peaks.get(k, 0), n)
    assert peaks == {"a": 2, "b": 1}
