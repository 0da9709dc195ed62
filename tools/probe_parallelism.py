"""One-off measurement probe (r14): quantify the single-task-scan effect.

Every sf test table is ONE parquet row group, so every scan stage runs as
ONE task and all pre-shuffle work (tokenize, explode, partial agg, Python
passes) is single-threaded.  This probe times representative first-stage
shapes with and without a scale-adaptive fan-out so the optimization is
measured before any code changes (guide §1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_db_spark.session import get_spark  # noqa: E402


def t(label, fn, n=3):
    best = min(timeit(fn) for _ in range(n))
    print(f"{label:55s} {best:7.3f} s")
    return best


def timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    li = spark.read.parquet(sf + "/lineitem.parquet")
    docs = spark.read.parquet(sf + "/documents.parquet")
    print("lineitem scan partitions:", li.rdd.getNumPartitions())

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm
    noop(li.groupBy("l_returnflag").count())
    noop(docs.select(F.explode(F.split(F.trim("text"), r"\s+"))).groupBy("col").count())

    # 1. plain groupBy agg over lineitem (single-task partial agg)
    t("lineitem groupBy(suppkey) agg raw", lambda: noop(
        li.groupBy("l_suppkey").agg(F.sum("l_extendedprice"), F.avg("l_quantity"))))
    t("lineitem groupBy(suppkey) agg repart32", lambda: noop(
        li.repartition(32).groupBy("l_suppkey").agg(F.sum("l_extendedprice"), F.avg("l_quantity"))))

    # 2. tokenize-heavy explode over documents
    tok = lambda d: d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("term")).groupBy("term").count()
    t("documents tokenize+count raw", lambda: noop(tok(docs)))
    t("documents tokenize+count repart32", lambda: noop(tok(docs.repartition(32))))

    # 3. mapInPandas python pass (gopher metrics)
    from pandas_db_spark.operators.repetition import gopher_repetition_flags
    t("gopher flags raw", lambda: noop(gopher_repetition_flags(docs.select("doc_id", "text"))))
    t("gopher flags repart32", lambda: noop(gopher_repetition_flags(docs.select("doc_id", "text").repartition(32))))

    # 4. dhash python pass
    from pandas_db_spark.operators import multimodal as M
    med = M.attach_media(docs.select("doc_id", "text"), "text", "doc_id")
    t("media_dhash raw", lambda: noop(M.media_dhash(med)))
    t("media_dhash repart32", lambda: noop(M.media_dhash(M.attach_media(
        docs.select("doc_id", "text").repartition(32), "text", "doc_id"))))

    # 5. localCheckpoint partitioning preservation probe
    sym = li.select(F.col("l_orderkey").alias("a"), F.col("l_partkey").alias("b")).repartition("b").localCheckpoint(eager=True)
    vals = li.groupBy(F.col("l_partkey").alias("b")).count().localCheckpoint(eager=True)
    plan = sym.join(vals, "b")._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange")
    print("join-after-checkpoint Exchange count (expect 1 if partitioning preserved):", n_ex)
    plan2 = li.select(F.col("l_orderkey").alias("a"), F.col("l_partkey").alias("b")).localCheckpoint(eager=True).join(vals, "b")._jdf.queryExecution().executedPlan().toString()
    print("join-no-prepartition Exchange count:", plan2.count("Exchange"))


if __name__ == "__main__":
    main()
