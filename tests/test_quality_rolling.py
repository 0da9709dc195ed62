"""Data-quality expectations (operators/quality.py), rolling/cumulative
aggregates (operators/rolling.py), melt (reshape.melt) and
length-bucketed batching (packing.length_buckets)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_db_spark.operators import quality as Q
from pandas_db_spark.operators import rolling as RL
from pandas_db_spark.operators.packing import length_buckets
from pandas_db_spark.operators.reshape import melt
from pandas_db_spark.plans.explain import exchange_count


# ---------------------------------------------------------------- quality

@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # id, val, status
        (1, 10.0, "O"),
        (1, 55.0, "O"),       # duplicate id
        (2, None, "F"),       # null val
        (3, 999.0, "X"),      # bad status, out-of-range val
        (4, 50.0, "P"),
    ]
    return spark.createDataFrame(rows, "id long, val double, status string")


def test_expectation_counts_exact(dirty):
    out = Q.check_expectations(dirty, [
        Q.not_null("val"),
        Q.in_range("val", 0, 100),
        Q.in_set("status", ["O", "F", "P"]),
        Q.unique("id"),
    ]).collect()
    got = {r["rule"]: r["violations"] for r in out}
    assert got == {"not_null:val": 1,
                   "in_range:val": 2,     # the NULL and the 999
                   "in_set:status": 1,
                   "unique:id": 1}
    assert all(r["n_rows"] == 5 and r["ok"] is False for r in out)


def test_expectation_allow_null_and_clean_suite(dirty):
    out = Q.check_expectations(dirty, [
        Q.in_range("val", 0, 1000, allow_null=True),
    ]).collect()
    assert out[0]["violations"] == 0 and out[0]["ok"] is True


def test_expectation_order_and_validation(dirty):
    rules = [Q.unique("id"), Q.not_null("val")]
    names = [r["rule"] for r in Q.check_expectations(dirty, rules).collect()]
    assert names == ["unique:id", "not_null:val"]  # input order kept
    with pytest.raises(ValueError, match="empty rule"):
        Q.check_expectations(dirty, [])
    with pytest.raises(ValueError, match="duplicate"):
        Q.check_expectations(dirty, [Q.not_null("val"), Q.not_null("val")])
    with pytest.raises(ValueError, match="key column"):
        Q.unique()


def test_row_rules_are_one_exchange(db):
    """All row-level rules fold into ONE aggregate over one scan: the
    plan carries a single Exchange (the 1-row final agg), no join, no
    per-rule scan."""
    o = db.orders.df
    out = Q.check_expectations(o, [
        Q.not_null("o_custkey"),
        Q.in_range("o_totalprice", 0, 1e6),
        Q.in_set("o_orderstatus", ["O", "F", "P"]),
    ])
    assert exchange_count(out) <= 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


# ---------------------------------------------------------------- rolling

@pytest.fixture(scope="module")
def series_df(spark):
    rows = []
    for uid in (1, 2):
        for i in range(10):
            rows.append((uid * 100 + i, uid,
                         f"2024-01-01 00:{i:02d}:30", float(i) + 0.25))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, value double")
    return df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def test_rolling_rows_matches_pandas(series_df):
    out = (RL.rolling_rows(series_df, "user_id", "ts", "value", n=3,
                           tiebreak_cols=["event_id"])
           .select("event_id", "roll_sum", "roll_avg", "roll_n")
           .toPandas().set_index("event_id").sort_index())
    pdf = series_df.toPandas().sort_values(["user_id", "ts", "event_id"])
    g = pdf.groupby("user_id")["value"]
    exp_sum = g.rolling(3, min_periods=1).sum().reset_index(level=0, drop=True)
    exp_n = g.rolling(3, min_periods=1).count().reset_index(level=0, drop=True)
    for eid, s, n in zip(pdf["event_id"], exp_sum, exp_n):
        assert out.loc[eid, "roll_sum"] == pytest.approx(s, abs=1e-9)
        assert out.loc[eid, "roll_n"] == int(n)
        assert out.loc[eid, "roll_avg"] == pytest.approx(s / n, abs=1e-9)


def test_rolling_range_hand_case(spark):
    rows = [(1, 1, 0, 1.0), (2, 1, 1800, 2.0), (3, 1, 3600, 4.0),
            (4, 1, 7300, 8.0), (5, 2, 0, 16.0)]
    df = (spark.createDataFrame(
            rows, "event_id long, user_id long, sec long, value double")
          .withColumn("ts", F.col("sec").cast("timestamp")).drop("sec"))
    out = {r["event_id"]: (r["roll_sum"], r["roll_n"])
           for r in RL.rolling_range(df, "user_id", "ts", "value",
                                     window_s=3600).collect()}
    # frame = (t-3599, t]: event 3 at t=3600 sees 1800 and 3600, not 0.
    assert out == {1: (1.0, 1), 2: (3.0, 2), 3: (6.0, 2),
                   4: (8.0, 1), 5: (16.0, 1)}


def test_cumulative_matches_pandas(series_df):
    out = (RL.cumulative(series_df, "user_id", "ts", "value",
                         tiebreak_cols=["event_id"])
           .select("event_id", "cum_sum", "cum_n")
           .toPandas().set_index("event_id").sort_index())
    pdf = series_df.toPandas().sort_values(["user_id", "ts", "event_id"])
    exp = pdf.groupby("user_id")["value"].cumsum()
    for eid, s in zip(pdf["event_id"], exp):
        assert out.loc[eid, "cum_sum"] == pytest.approx(s, abs=1e-9)


def test_rolling_rejects_global_window(series_df):
    with pytest.raises(ValueError, match="ONE task"):
        RL.rolling_rows(series_df, [], "ts", "value", n=3)
    with pytest.raises(ValueError, match="positive"):
        RL.rolling_rows(series_df, "user_id", "ts", "value", n=0)
    with pytest.raises(ValueError, match="positive"):
        RL.rolling_range(series_df, "user_id", "ts", "value", window_s=0)


def test_rolling_is_one_keyed_exchange(series_df):
    out = RL.rolling_rows(series_df, "user_id", "ts", "value", n=3,
                          tiebreak_cols=["event_id"])
    assert exchange_count(out) == 1


# ---------------------------------------------------------------- melt

def test_melt_matches_manual_stack(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 0.5), (2, 20.0, 1.5)], "k long, a double, b double")
    out = melt(df, ["k"], ["a", "b"]).toPandas()
    out = out.sort_values(["k", "variable"]).reset_index(drop=True)
    exp = pd.DataFrame({
        "k": [1, 1, 2, 2],
        "variable": ["a", "b", "a", "b"],
        "value": [10.0, 0.5, 20.0, 1.5]})
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_melt_is_narrow_and_validates(spark, db):
    li = db.lineitem.df
    out = melt(li, ["l_orderkey"], ["l_quantity", "l_tax"])
    assert exchange_count(out) == 0  # Expand projection, zero shuffle
    with pytest.raises(ValueError, match="unknown columns"):
        melt(li, ["l_orderkey"], ["nope"])
    with pytest.raises(ValueError, match="value column"):
        melt(li, ["l_orderkey"], [])


# ---------------------------------------------------------------- buckets

def test_length_buckets_contract(db):
    out = length_buckets(db.documents.df, boundaries=[16, 64, 256],
                         batch_size=8, n_salts=4).toPandas()
    # bucket matches the boundary rule exactly
    import numpy as np
    exp_bucket = np.searchsorted([16, 64, 256], out["n_tokens"], side="left")
    assert (out["bucket"] == exp_bucket).all()
    assert (out["salt"] == out["doc_id"] % 4).all()
    # every (bucket, salt, batch) group holds <= batch_size docs, and all
    # non-final batches of a salt group are exactly full
    g = out.groupby(["bucket", "salt", "batch"]).size()
    assert (g <= 8).all()
    full = g.groupby(level=[0, 1]).apply(lambda s: (s.iloc[:-1] == 8).all())
    assert full.all()


def test_length_buckets_deterministic_and_validated(db, spark):
    d = db.documents.df
    a = length_buckets(d, [64], 8, n_salts=4).toPandas()
    b = length_buckets(d.repartition(13), [64], 8, n_salts=4).toPandas()
    key = ["doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    with pytest.raises(ValueError, match="ascending"):
        length_buckets(d, [64, 32], 8)
    with pytest.raises(ValueError, match="positive"):
        length_buckets(d, [64], 0)
    s = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(TypeError, match="numeric id_col"):
        length_buckets(s, [64], 8)


def test_expectations_by_group(dirty, spark):
    grouped = Q.check_expectations_by(dirty, ["status"], [
        Q.not_null("val"), Q.unique("id")])
    rows = {(r["status"], r["rule"]): (r["violations"], r["n_rows"])
            for r in grouped.collect()}
    assert rows[("O", "unique:id")] == (1, 2)       # both O rows share id 1
    assert rows[("F", "not_null:val")] == (1, 1)
    assert rows[("X", "not_null:val")] == (0, 1)
    assert len(rows) == 8                            # 4 groups x 2 rules
    with pytest.raises(ValueError, match="empty group_cols"):
        Q.check_expectations_by(dirty, [], [Q.not_null("val")])


def test_expectations_by_is_one_keyed_pass(db):
    out = Q.check_expectations_by(db.documents.df, ["source"],
                                  [Q.not_null("text"), Q.unique("doc_id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


# ------------------------------------------------------------- balancing

def test_balance_classes_ratios_and_determinism(db):
    from pandas_db_spark.operators.sampling import balance_classes

    d = db.documents.df
    before = {r[0]: r[1] for r in d.groupBy("lang").count().collect()}
    floor_n = min(before.values())
    out = balance_classes(d, "lang", "doc_id", max_ratio=1.0)
    after = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    # every class lands near the floor (Bernoulli: allow 40% slack both
    # ways), and the smallest class is untouched
    for lang, n in after.items():
        assert n <= before[lang]
        assert n >= 0.6 * min(floor_n, before[lang])
        assert n <= 1.4 * floor_n
    assert after[min(before, key=before.get)] == floor_n
    # deterministic across repartitioning
    a = sorted(r[0] for r in out.select("doc_id").collect())
    b = sorted(r[0] for r in balance_classes(
        d.repartition(7), "lang", "doc_id").select("doc_id").collect())
    assert a == b
    # ratio cap >1 keeps more of the majority
    cap3 = balance_classes(d, "lang", "doc_id", max_ratio=3.0).count()
    assert cap3 > out.count()
    with pytest.raises(ValueError, match=">= 1"):
        balance_classes(d, "lang", "doc_id", max_ratio=0.5)


def test_melt_rejects_lossy_cast_and_allows_string(db):
    d = db.documents.df
    with pytest.raises(TypeError, match="non-numeric"):
        melt(d, ["doc_id"], ["text", "n_chars"])
    out = melt(d, ["doc_id"], ["text", "lang"], value_type="string")
    assert out.count() == 2 * d.count()


def test_rolling_scale_validation(spark):
    """r8 (ADVICE r7): scale outside [0, 18] raises a clear ValueError
    instead of an analysis-time decimal failure; boundary scales pass."""
    import pytest
    from pandas_db_spark.operators import rolling as RO

    df = spark.createDataFrame([(1, 1, 1.0)], "k long, t long, v double")
    for bad in (-1, 19, 40):
        with pytest.raises(ValueError, match="scale"):
            RO.rolling_rows(df, "k", "t", "v", 2, scale=bad)
        with pytest.raises(ValueError, match="scale"):
            RO.rolling_range(df, "k", "t", "v", 10, scale=bad)
        with pytest.raises(ValueError, match="scale"):
            RO.cumulative(df, "k", "t", "v", scale=bad)
    assert RO.rolling_rows(df, "k", "t", "v", 2, scale=0).count() == 1
    assert RO.cumulative(df, "k", "t", "v", scale=18).count() == 1


# ---------------------------------------------------------------------
# references rule (referential integrity) — r12 part 4
# ---------------------------------------------------------------------

def test_references_rule_counts_orphans_not_nulls(spark):
    from pandas_db_spark.operators import quality as Q

    fact = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 99), (4, None), (5, 99)],
        "id long, fk long")
    dim = spark.createDataFrame([(10,), (11,), (None,)], "k long")
    out = {r["rule"]: (r["violations"], r["n_rows"], r["ok"])
           for r in Q.check_expectations(
               fact, [Q.references("fk", dim, "k"),
                      Q.not_null("fk")]).collect()}
    # two orphans (the 99s); the NULL fk is NOT a ref violation —
    # it is not_null's finding
    assert out["references:fk->k"] == (2, 5, False)
    assert out["not_null:fk"] == (1, 5, False)


def test_references_rule_clean_and_duplicate_dim_keys(spark):
    from pandas_db_spark.operators import quality as Q

    fact = spark.createDataFrame([(1, 10), (2, 10)], "id long, fk long")
    dim = spark.createDataFrame([(10,), (10,), (11,)], "k long")
    out = Q.check_expectations(
        fact, [Q.references("fk", dim, "k")]).collect()[0]
    # duplicate dim keys must not multiply fact rows: n_rows stays 2
    assert (out["violations"], out["n_rows"], out["ok"]) == (0, 2, True)


def test_references_rule_per_group(spark):
    from pandas_db_spark.operators import quality as Q

    fact = spark.createDataFrame(
        [("a", 10), ("a", 99), ("b", 10)], "src string, fk long")
    dim = spark.createDataFrame([(10,)], "k long")
    out = {(r["src"], r["rule"]): r["violations"]
           for r in Q.check_expectations_by(
               fact, ["src"], [Q.references("fk", dim, "k")]).collect()}
    assert out == {("a", "references:fk->k"): 1,
                   ("b", "references:fk->k"): 0}
