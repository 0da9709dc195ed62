"""Document chunking + snapshot diff (operators/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from pandas_db_spark.operators import chunking as CH


def test_chunk_rule_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x")], "doc_id long, text string")
    rows = sorted(map(tuple, CH.chunk_documents(
        docs, "text", "doc_id", max_tokens=4, overlap=2).collect()))
    # doc 1: n=7, stride=2 → starts 1,3,5,7
    assert rows == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "c d e f"),
        (1, 2, 3, "e f g"),
        (1, 3, 1, "g"),
        (2, 0, 1, "x"),
    ]


def test_chunk_covers_all_tokens(spark, db):
    out = CH.chunk_documents(db.documents.df, "text", "doc_id",
                             max_tokens=32, overlap=8)
    # first chunk starts at token 1; consecutive chunks advance by stride;
    # every token index is covered by some window
    agg = (out.groupBy("doc_id")
           .agg(F.max("chunk_id").alias("last"),
                F.sum("n_tokens").alias("sum_n")).collect())
    n_by_doc = {r["doc_id"]: r["n"] for r in
                db.documents.df.select(
                    "doc_id",
                    F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
                .collect()}
    for r in agg:
        n, stride = n_by_doc[r["doc_id"]], 32 - 8
        # windows start at 1 + k*stride for k = 0..last, last start <= n
        assert r["last"] == (n - 1) // stride
        # total window tokens >= n (full coverage with overlap)
        assert r["sum_n"] >= n


def test_chunk_no_shuffle(spark, db):
    plan = CH.chunk_documents(db.documents.df, "text", "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map: embarrassingly parallel


def test_chunk_param_validation(spark, db):
    with pytest.raises(ValueError, match="overlap"):
        CH.chunk_documents(db.documents.df, "text", "doc_id",
                           max_tokens=8, overlap=8)
    with pytest.raises(ValueError, match="positive"):
        CH.chunk_documents(db.documents.df, "text", "doc_id", max_tokens=0)


def test_snapshot_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "doc_id long, text string")
    got = {r["id"]: r["status"] for r in
           CH.snapshot_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_shuffles_digests_not_text(spark, db):
    out = CH.snapshot_diff(db.documents.df, db.documents.df,
                           "doc_id", "text")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # text never crosses the join: projections reduce to (id, sha2) before it
    join_pos = plan.index("Join")
    assert "sha2" in plan[join_pos:]
    assert out.where(F.col("status") != "unchanged").count() == 0
