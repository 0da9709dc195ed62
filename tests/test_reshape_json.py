"""Pivot / upsert (operators/reshape.py) and JSON extraction
(functions/json.py)."""

import pytest
from pyspark.sql import functions as F

from pandas_db_spark.operators import reshape as RS
from pandas_db_spark.functions import json as J


def test_pivot_counts_match_duckdb(spark, db, duck):
    got = {r["user_id"]: (r["click"], r["error"], r["purchase"],
                          r["signup"], r["view"])
           for r in RS.pivot_agg(
               db.events.df, ["user_id"], "event_type",
               ["click", "error", "purchase", "signup", "view"]).collect()}
    want = {u: tuple(t) for u, *t in map(tuple, duck.execute(
        "SELECT user_id, "
        "count(*) FILTER (event_type='click'), "
        "count(*) FILTER (event_type='error'), "
        "count(*) FILTER (event_type='purchase'), "
        "count(*) FILTER (event_type='signup'), "
        "count(*) FILTER (event_type='view') "
        "FROM events GROUP BY user_id").fetchall())}
    assert got == want


def test_pivot_requires_values(spark, db):
    with pytest.raises(ValueError, match="explicit"):
        RS.pivot_agg(db.events.df, ["user_id"], "event_type", [])


def test_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    updates = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k long, v string")
    got = sorted(map(tuple, RS.upsert(target, updates, "k").collect()))
    assert got == [(1, "a"), (2, "B"), (3, "c"), (4, "D")]


def test_upsert_column_mismatch(spark):
    t = spark.createDataFrame([(1, "a")], "k long, v string")
    u = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="column sets differ"):
        RS.upsert(t, u, "k")


def test_upsert_broadcasts_delta(spark):
    t = spark.createDataFrame([(i, "x") for i in range(100)],
                              "k long, v string")
    u = spark.createDataFrame([(1, "y")], "k long, v string")
    plan = RS.upsert(t, u, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_with_json_fields_single_parse(spark, db):
    out = J.with_json_fields(db.events.df, "props", {"k": "int"})
    assert dict(out.dtypes)["k"] == "int"
    # one from_json node, no get_json_object
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") >= 1 and "get_json_object" not in plan
    rows = out.select("props", "k").limit(5).collect()
    import json as pyjson
    for r in rows:
        assert r["k"] == pyjson.loads(r["props"])["k"]


def test_json_field_probe(spark, db):
    got = (db.events.df
           .select(J.json_field("props", "$.k").alias("k"))
           .where(F.col("k").isNotNull()).limit(3).collect())
    assert all(r["k"].isdigit() for r in got)


def test_infer_json_schema(spark, db):
    ddl = J.infer_json_schema(db.events.df, "props", sample_rows=20)
    assert "k" in ddl and "bigint" in ddl
    # inferred schema round-trips through with_json_fields
    name, typ = ddl.replace("`", "").split(" ", 1)
    out = J.with_json_fields(db.events.df, "props", {name: typ})
    assert out.where(F.col(name).isNotNull()).count() > 0


def test_infer_json_schema_invalid(spark):
    df = spark.createDataFrame([("not json",)], "j string")
    with pytest.raises(ValueError, match="not valid JSON"):
        J.infer_json_schema(df, "j")


def test_fixed_width_hist_exact(spark, db, duck):
    got = {r["bucket"]: (r["lo_cents"], r["n"]) for r in
           RS.fixed_width_hist(db.events.df, "value", 500).collect()}
    want = {b: (lo, n) for b, lo, n in duck.execute(
        "SELECT bucket, bucket*500, count(*) FROM ("
        "SELECT CAST(round(value*100) AS BIGINT) // 500 AS bucket "
        "FROM events) GROUP BY bucket").fetchall()}
    assert got == want
    assert sum(n for _, n in got.values()) == db.events.df.count()


def test_fixed_width_hist_bad_width(spark, db):
    with pytest.raises(ValueError, match="positive"):
        RS.fixed_width_hist(db.events.df, "value", 0)


def test_top_k_per_group_matches_duckdb(spark, db, duck):
    got = sorted(map(tuple,
                     RS.top_k_per_group(db.events.df, ["user_id"], "value",
                                        3, tiebreak_cols=["event_id"])
                     .select("user_id", "event_id", "rk").collect()))
    want = sorted(map(tuple, duck.execute(
        "SELECT user_id, event_id, rk FROM (SELECT user_id, event_id, "
        "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, "
        "event_id) rk FROM events) WHERE rk <= 3").fetchall()))
    assert got == want


def test_top_k_per_group_window_limit_plan(spark, db):
    plan = RS.top_k_per_group(db.events.df, ["user_id"], "value", 2,
                              tiebreak_cols=["event_id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_top_k_validation(spark, db):
    with pytest.raises(ValueError, match="positive"):
        RS.top_k_per_group(db.events.df, ["user_id"], "value", 0)


def test_winsorize_bounds_and_passthrough(spark, db):
    out = RS.winsorize(db.events.df, "value", 0.1, 0.9, out_col="w")
    lo, hi = db.events.df.agg(
        F.expr("percentile(value, array(0.1, 0.9))")).collect()[0][0]
    rows = out.select("value", "w").collect()
    for r in rows:
        if lo <= r["value"] <= hi:
            assert r["w"] == r["value"]
        else:
            assert r["w"] in (lo, hi)


def test_winsorize_validation(spark, db):
    with pytest.raises(ValueError, match="p_lo"):
        RS.winsorize(db.events.df, "value", 0.9, 0.1)


def test_quantile_buckets_properties(spark, db, duck):
    out = RS.quantile_buckets(db.events.df, "value", 4)
    rows = out.select("value", "bucket").collect()
    # monotone: higher value => bucket >= lower value's bucket
    srt = sorted(rows, key=lambda r: r["value"])
    assert all(a["bucket"] <= b["bucket"] for a, b in zip(srt, srt[1:]))
    assert {r["bucket"] for r in rows} <= {1, 2, 3, 4}
    # quartile counts near n/4 (exact split up to ties)
    from collections import Counter
    c = Counter(r["bucket"] for r in rows)
    n = len(rows)
    assert all(abs(c[b] - n / 4) <= n * 0.05 for b in (1, 2, 3, 4))


def test_quantile_buckets_validation(spark, db):
    with pytest.raises(ValueError, match=">= 2"):
        RS.quantile_buckets(db.events.df, "value", 1)


def test_profile_table_one_job_and_values(spark, db, duck):
    prof = RS.profile_table(db.documents.df, ["doc_id", "lang"])
    got = {r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
           for r in prof.collect()}
    n, nd_lang = duck.execute(
        "SELECT count(*), count(DISTINCT lang) FROM documents").fetchone()
    assert got["doc_id"] == (n, 0, n)
    assert got["lang"] == (n, 0, nd_lang)
    # one pass over the data: the multi-distinct rewrite adds shuffle
    # stages, but the table itself is scanned exactly once
    plan = prof._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # post-AQE print repeats
    assert (final.count("FileScan") + final.count("InMemoryTableScan")) == 1


def test_profile_table_validation(spark, db):
    with pytest.raises(ValueError, match="no columns"):
        RS.profile_table(db.documents.df, [])


def test_standardize_moments_and_nulls(spark, db):
    import math
    out = RS.standardize(db.events.df, "value")
    rows = out.select("value", "value_z").collect()
    zs = [r["value_z"] for r in rows]
    # standardized: mean ~0, std ~1 (decimal-rounded moments => tiny slack)
    m = sum(zs) / len(zs)
    sd = math.sqrt(sum((z - m) ** 2 for z in zs) / len(zs))
    assert abs(m) < 1e-2 and abs(sd - 1) < 1e-2
    const = db.events.df.withColumn("value", F.lit(5.0))
    assert RS.standardize(const, "value").where(
        F.col("value_z").isNotNull()).count() == 0
    import pytest as _pt
    # laziness moved the no-data check to execution time (raise_error in
    # the broadcast moment frame): constructing is free, acting raises.
    # (A literally EMPTY input short-circuits to empty output via
    # PropagateEmptyRelation, and a LITERAL null column null-propagates
    # the whole expression away — no rows touched, no error — so the
    # error case is rows whose value column is runtime-null.)
    allnull = db.events.df.withColumn(
        "value", F.when(F.col("value").isNull(), F.col("value")))
    lazy = RS.standardize(allnull, "value")
    with _pt.raises(Exception, match="no non-null"):
        lazy.collect()
    empty = db.events.df.where(F.lit(False))
    assert RS.standardize(empty, "value").count() == 0


def test_lazy_boundary_construction_runs_zero_jobs(spark, db):
    """r6 verdict #2: winsorize / standardize / quantile_buckets must not
    run any Spark job at plan-construction time — boundaries/moments ride
    the plan as broadcast one-row frames (scalar-subquery shape)."""
    def n_jobs():
        return spark._jsparkSession.sparkContext().statusStore() \
            .jobsList(None).size()

    e = db.events.df
    before = n_jobs()
    w = RS.winsorize(e, "value", 0.05, 0.95, out_col="w")
    z = RS.standardize(e, "value")
    q = RS.quantile_buckets(e, "value", 10)
    assert n_jobs() == before, "construction ran a Spark job"
    # the plans still execute correctly afterwards
    assert w.limit(1).count() == 1
    assert z.limit(1).count() == 1
    assert q.limit(1).count() == 1


def test_heavy_hitters_exact_and_plan(db):
    import pytest
    from pandas_db_spark.operators.reshape import heavy_hitters

    e = db.events.df
    out = heavy_hitters(e, "event_type", k=3).collect()
    exact = sorted(
        ((r[0], r[1]) for r in e.groupBy("event_type").count().collect()),
        key=lambda t: (-t[1], t[0]))[:3]
    assert [(r[0], r[1]) for r in out] == exact
    plan = (heavy_hitters(e, "user_id", k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan   # no global sort
    assert plan.count("HashAggregate") >= 2  # map-side partial present
    with pytest.raises(ValueError, match="positive"):
        heavy_hitters(e, "user_id", k=0)
