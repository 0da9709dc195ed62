"""Skew-salting operators and approximate sketches: salted plans must be
result-identical to their unsalted counterparts (salt is an execution
detail, never visible in results); sketches must land within their
documented error bounds of the exact answers."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pandas_db_spark.operators import skew as K


def _sorted_rows(df):
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple((v is None, v) for v in t))


def test_salted_inner_join_matches_plain(db):
    o = db.orders.df.select("o_orderkey", "o_custkey", "o_totalprice")
    c = db.customer.df.select(F.col("c_custkey").alias("o_custkey"),
                              "c_nationkey")
    plain = o.join(c, ["o_custkey"], "inner")
    salted = K.salted_join(o, c, ["o_custkey"], "inner", n_salts=4)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted.select(*sorted(salted.columns))) == \
        _sorted_rows(plain.select(*sorted(plain.columns)))


def test_salted_left_join_keeps_unmatched(db):
    o = db.orders.df.select("o_orderkey", "o_custkey")
    # dim missing most keys → unmatched left rows must survive with NULLs
    c = (db.customer.df.filter("c_custkey < 10")
         .select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"))
    plain = o.join(c, ["o_custkey"], "left")
    salted = K.salted_join(o, c, ["o_custkey"], "left", n_salts=4)
    assert _sorted_rows(salted.select(*sorted(salted.columns))) == \
        _sorted_rows(plain.select(*sorted(plain.columns)))


def test_salted_join_rejects_unsupported_how(db):
    with pytest.raises(ValueError):
        K.salted_join(db.orders.df, db.customer.df, ["o_custkey"], "full")


def test_salted_agg_matches_plain(db):
    e = db.events.df
    aggs = [("value", "sum", "s"), ("value", "count", "n"),
            ("value", "min", "mn"), ("value", "max", "mx")]
    salted = K.salted_agg(e, ["user_id"], aggs, n_salts=8)
    plain = e.groupBy("user_id").agg(
        F.sum("value").alias("s"), F.count("value").alias("n"),
        F.min("value").alias("mn"), F.max("value").alias("mx"))
    got = {r["user_id"]: r for r in salted.collect()}
    want = {r["user_id"]: r for r in plain.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["mn"] == want[k]["mn"]
        assert got[k]["mx"] == want[k]["mx"]
        # float sum differs only by accumulation order
        assert abs(got[k]["s"] - want[k]["s"]) < 1e-6 * max(1.0, abs(want[k]["s"]))


def test_salted_agg_rejects_non_decomposable(db):
    with pytest.raises(ValueError):
        K.salted_agg(db.events.df, ["user_id"], [("value", "avg", "a")])


def test_nunique_approx_within_rsd(db):
    c = db.orders.o_custkey
    exact = len(c.unique())
    approx = c.nunique_approx(rsd=0.05)
    assert abs(approx - exact) <= 4 * 0.05 * exact


def test_quantile_approx_brackets_median(db):
    c = db.orders.o_totalprice
    med = c.median()
    q50 = c.quantile_approx(0.5)
    # GK sketch at accuracy=10k on ~1.5k rows is exact up to rank ties
    lo, hi = c.quantile_approx([0.25, 0.75])
    assert lo <= q50 <= hi
    assert abs(q50 - med) <= 0.02 * med


def test_quantile_approx_requires_numeric(db):
    with pytest.raises(TypeError):
        db.customer.c_name.quantile_approx(0.5)
