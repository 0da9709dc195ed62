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
