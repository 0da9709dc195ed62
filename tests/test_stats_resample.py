"""Exact-moment statistics (operators/stats.py) and the new temporal
operators (resample_ffill, history_intervals)."""

import math

import pytest
from pyspark.sql import functions as F

from pandas_db_spark.operators import stats as ST
from pandas_db_spark.operators.temporal import history_intervals, resample_ffill
from pandas_db_spark.plans.explain import exchange_count


# ------------------------------------------------------------------ stats

def test_corr_matches_numpy(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    x = np.round(rng.uniform(0, 100, 500), 2)
    y = np.round(2 * x + rng.normal(0, 5, 500), 2)
    z = np.round(rng.uniform(0, 10, 500), 2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in ST.corr_matrix(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-9)
    assert out[("x", "z")] == pytest.approx(np.corrcoef(x, z)[0, 1], abs=1e-9)
    assert out[("y", "z")] == pytest.approx(np.corrcoef(y, z)[0, 1], abs=1e-9)
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}


def test_corr_partition_invariant_bit_exact(db):
    """The whole point: exact decimal moments make the result identical
    under repartitioning, where native corr() drifts in the low bits."""
    li = db.lineitem.df.select("l_quantity", "l_extendedprice")
    a = ST.corr_matrix(li, ["l_quantity", "l_extendedprice"]).collect()[0]["corr"]
    b = ST.corr_matrix(li.repartition(17), ["l_quantity", "l_extendedprice"]
                       ).collect()[0]["corr"]
    assert a == b  # bitwise, no tolerance


def test_cov_matches_numpy(spark):
    import numpy as np
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = np.array([2.0, 4.0, 8.0, 10.0])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double")
    out = ST.cov_matrix(df, ["x", "y"]).collect()[0]
    assert out["cov"] == pytest.approx(np.cov(x, y, bias=True)[0, 1], abs=1e-12)


def test_stats_single_scan_and_validation(db):
    li = db.lineitem.df
    out = ST.corr_matrix(li, ["l_quantity", "l_tax", "l_discount"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1          # one pass for all 3 pairs
    assert exchange_count(out) <= 1
    with pytest.raises(ValueError, match="two columns"):
        ST.corr_matrix(li, ["l_quantity"])
    with pytest.raises(ValueError, match="duplicate"):
        ST.cov_matrix(li, ["l_quantity", "l_quantity"])


# --------------------------------------------------------------- resample

def test_resample_ffill_hand_case(spark):
    rows = [(1, 30, 10.0), (1, 650, 20.0), (1, 1900, 30.0),
            (2, 0, 5.0)]
    obs = (spark.createDataFrame(rows, "k long, sec long, v double")
           .select("k", F.timestamp_seconds("sec").alias("ts"), "v"))
    out = {(r["k"], r["grid_sec"]): r["v_r"]
           for r in resample_ffill(obs, ["k"], "ts", step_s=600).collect()}
    # key 1: span [30, 1900] -> grid 600, 1200, 1800
    assert out == {(1, 600): 10.0, (1, 1200): 20.0, (1, 1800): 20.0,
                   (2, 0): 5.0}


def test_resample_tolerance_gaps(spark):
    rows = [(1, 0, 1.0), (1, 3000, 2.0)]
    obs = (spark.createDataFrame(rows, "k long, sec long, v double")
           .select("k", F.timestamp_seconds("sec").alias("ts"), "v"))
    out = {r["grid_sec"]: r["v_r"]
           for r in resample_ffill(obs, ["k"], "ts", step_s=600,
                                   tolerance_s=700).collect()}
    # fills older than 700 s are nulled: 1200/1800/2400 are gaps
    assert out[0] == 1.0 and out[600] == 1.0
    assert out[1200] is None and out[1800] is None and out[2400] is None
    assert out[3000] == 2.0


def test_resample_validates(spark):
    obs = spark.createDataFrame([(1, 0, 1.0)], "k long, sec long, v double"
                                ).select("k", F.timestamp_seconds("sec")
                                         .alias("ts"), "v")
    with pytest.raises(ValueError, match="positive"):
        resample_ffill(obs, ["k"], "ts", step_s=0)


# ------------------------------------------------------------------- scd2

def test_history_intervals_hand_case(spark):
    rows = [(1, 100, "A"), (1, 200, "A"), (1, 300, "B"), (1, 400, "A"),
            (2, 100, "C")]
    chg = (spark.createDataFrame(rows, "k long, sec long, s string")
           .select("k", F.timestamp_seconds("sec").alias("ts"), "s"))
    out = sorted(
        ((r["k"], r["s"], r["valid_from"].timestamp(),
          None if r["valid_to"] is None else r["valid_to"].timestamp())
         for r in history_intervals(chg, ["k"], "ts", ["s"]).collect()))
    # the no-op A@200 collapses; intervals chain without gaps
    assert out == [(1, "A", 100.0, 300.0), (1, "A", 400.0, None),
                   (1, "B", 300.0, 400.0), (2, "C", 100.0, None)]


def test_history_intervals_no_collapse_and_nullsafe(spark):
    rows = [(1, 100, None), (1, 200, None), (1, 300, "B")]
    chg = (spark.createDataFrame(rows, "k long, sec long, s string")
           .select("k", F.timestamp_seconds("sec").alias("ts"), "s"))
    collapsed = history_intervals(chg, ["k"], "ts", ["s"]).collect()
    assert len(collapsed) == 2  # NULL==NULL is "unchanged" (null-safe)
    kept = history_intervals(chg, ["k"], "ts", ["s"],
                             collapse_unchanged=False).collect()
    assert len(kept) == 3
    with pytest.raises(ValueError, match="attr_cols"):
        history_intervals(chg, ["k"], "ts", [])


def test_history_intervals_one_exchange(db):
    e = db.events.df.select("user_id", "ts", "event_type")
    out = history_intervals(e, ["user_id"], "ts", ["event_type"])
    # collapse-filter lag + valid_to lead share one keyed sort
    assert exchange_count(out) == 1


def test_corr_by_groups_and_degenerate(spark, db):
    import numpy as np

    li = db.lineitem.df
    out = {r["l_returnflag"]: r["corr"] for r in
           ST.corr_by(li, ["l_returnflag"],
                      ["l_quantity", "l_extendedprice"]).collect()}
    pdf = li.select("l_returnflag", "l_quantity",
                    "l_extendedprice").toPandas()
    for flag, g in pdf.groupby("l_returnflag"):
        exp = np.corrcoef(g["l_quantity"], g["l_extendedprice"])[0, 1]
        assert out[flag] == pytest.approx(exp, abs=1e-9)
    # degenerate group (constant column) -> NULL, not NaN/garbage
    d = spark.createDataFrame([(1, 5.0, 1.0), (1, 5.0, 2.0)],
                              "g long, x double, y double")
    row = ST.corr_by(d, ["g"], ["x", "y"]).collect()[0]
    assert row["corr"] is None
    with pytest.raises(ValueError, match="empty group_cols"):
        ST.corr_by(li, [], ["l_quantity", "l_tax"])


# ---------------------------------------------------------------------
# mad_summary (robust outliers) — r12 part 4
# ---------------------------------------------------------------------

def test_mad_summary_hand_computed(spark):
    from pandas_db_spark.operators.stats import mad_summary

    df = spark.createDataFrame(
        [(float(x),) for x in [1, 2, 3, 4, 5, 100]] + [(None,)],
        "v double")
    r = mad_summary(df, "v", k=3.0).collect()[0]
    # median of [1..5,100] = 3.5; deviations [2.5,1.5,.5,.5,1.5,96.5]
    # -> mad 1.5; threshold 4.5 -> only 100 is out
    assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == (6, 3.5, 1.5, 1)


def test_mad_summary_degenerate_and_empty(spark):
    from pandas_db_spark.operators.stats import mad_summary

    same = spark.createDataFrame([(2.0,), (2.0,), (2.0,), (9.0,)],
                                 "v double")
    r = mad_summary(same, "v", k=3.0).collect()[0]
    # mad = 0: every value != median flags (documented MAD behavior)
    assert (r["med"], r["mad"], r["n_outliers"]) == (2.0, 0.0, 1)
    empty = spark.createDataFrame([(None,)], "v double")
    e = mad_summary(empty, "v").collect()[0]
    assert (e["n"], e["med"], e["mad"], e["n_outliers"]) == (0, None, None, 0)
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        mad_summary(same, "v", k=-1)


def test_exact_median_matches_f_median(spark):
    """The r14 histogram-bisection selection must be bit-identical to
    F.median on every distribution shape it will meet: odd/even n,
    heavy ties, negatives, ints, constant columns, and a collect-path
    bin (n small enough that the first bin probe collects)."""
    import random

    from pyspark.sql import functions as F

    from pandas_db_spark.operators.stats import _exact_median

    rng = random.Random(14)
    cases = [
        [1.0, 2.0, 3.0],                              # odd
        [1.0, 2.0, 3.0, 4.0],                         # even, interp
        [5.0] * 9,                                    # constant
        [-3.5, -1.25, 0.0, 2.0, 2.0, 2.0, 7.5, 9.0],  # ties + negatives
        [rng.gauss(0, 1e6) for _ in range(10001)],    # wide doubles, odd
        [rng.gauss(0, 1e-6) for _ in range(10000)],   # tiny range, even
        [float(rng.randint(0, 50)) for _ in range(5000)],  # heavy ties
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        want = df.agg(F.median("v")).collect()[0][0]
        n, lo, hi = len(vals), min(vals), max(vals)
        got = _exact_median(df, "v", n, lo, hi)
        assert got == want, (len(vals), got, want)
    # int column: F.median interpolates in double — so must we
    idf = spark.createDataFrame([(i,) for i in range(10)], "v int")
    want = idf.agg(F.median("v")).collect()[0][0]
    assert _exact_median(idf, "v", 10, 0.0, 9.0) == want == 4.5


def test_exact_order_stats_matches_full_sort(spark):
    """Multi-rank selection must equal a full sort at every rank, on
    every path: the n<=cap one-collect shortcut, the histogram + batched
    bin-collect path, tied bins, and the oversized-bin recursion (cap
    monkeypatched tiny to force the latter two)."""
    import random

    from pandas_db_spark.operators import stats as ST

    rng = random.Random(141)
    cases = [
        [float(i) for i in range(1, 101)],                 # uniform ints
        [rng.gauss(0, 1e3) for _ in range(3000)],          # gaussian
        [5.0] * 500 + [7.0] * 499 + [1.0],                 # heavy ties
        [rng.expovariate(1.0) for _ in range(2500)],       # skewed
        [-1e12, -5.0, -5.0, 0.0, 3.25] * 200,              # dup blocks
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        n = len(vals)
        want = sorted(vals)
        ranks = sorted({1, n, n // 2, n // 3, max(1, n - 7),
                        max(1, 2 * n // 3)})
        lo, hi = min(vals), max(vals)
        # path 1: one-collect shortcut (n under the real cap)
        got = ST.exact_order_stats(df, "v", ranks, lo, hi, n)
        assert got == {r: want[r - 1] for r in ranks}
        # path 2/3: histogram + bin collects + recursion (tiny cap;
        # n=-1 disables the shortcut)
        old_cap = ST._MEDIAN_COLLECT_CAP
        ST._MEDIAN_COLLECT_CAP = 64
        try:
            got2 = ST.exact_order_stats(df, "v", ranks, lo, hi)
        finally:
            ST._MEDIAN_COLLECT_CAP = old_cap
        assert got2 == {r: want[r - 1] for r in ranks}
