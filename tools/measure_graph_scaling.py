"""Scaling ladder for the r12 graph family: pagerank + triangle_counts
at sf0.1 vs a synthesized sf1 lineitem (the make_sf1 key-offset replica
convention — 10 structure-preserving copies with disjoint key spaces, so
per-edge densities match sf0.1 exactly while edge cardinality grows 10x).

Writes GRAPH_SCALING_r12.json: per-query best-of-N wall at each decade
plus the per-unit-data ratio (growth/10).  Run on an idle machine.

Usage: python tools/measure_graph_scaling.py [iters]
"""

from __future__ import annotations

import json
import sys
import time

OFF = 1_000_000_000
PART_OFF = 10_000_000


def edges_pagerank(spark, li):
    from pyspark.sql import functions as F
    fwd = li.select(F.col("l_suppkey").cast("long").alias("src"),
                    (F.col("l_partkey") + PART_OFF).cast("long")
                    .alias("dst"))
    return fwd.union(fwd.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))


def pairs_triangles(spark, li):
    from pyspark.sql import functions as F
    lp = (li.where(F.col("l_quantity") >= 35)
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("p")).distinct())
    a, b = lp.alias("a"), lp.alias("b")
    return (a.join(b, (F.col("a.ok") == F.col("b.ok"))
                   & (F.col("a.p") < F.col("b.p")))
            .select(F.col("a.p").alias("id_a"),
                    F.col("b.p").alias("id_b")))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.operators.graph import pagerank, triangle_counts
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    li01 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    # synthesized sf1: 10 key-offset replicas of sf0.1 (no disk write —
    # the union IS the dataset; localCheckpoint pins it so every
    # iteration reads the same materialized rows, like a parquet scan)
    reps = []
    for k in range(10):
        reps.append(li01.select(
            (F.col("l_orderkey") + k * OFF).alias("l_orderkey"),
            (F.col("l_partkey") + k * OFF).alias("l_partkey"),
            (F.col("l_suppkey") + k * OFF).alias("l_suppkey"),
            "l_quantity"))
    li1 = reps[0]
    for r in reps[1:]:
        li1 = li1.union(r)
    li01 = (li01.select("l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity").localCheckpoint(eager=True))
    li1 = li1.localCheckpoint(eager=True)

    out: dict = {"iters": iters, "queries": {}}
    cases = {
        "graph_pagerank": lambda li: pagerank(
            edges_pagerank(spark, li), iterations=6),
        "graph_triangles": lambda li: triangle_counts(
            pairs_triangles(spark, li)),
    }
    for name, fn in cases.items():
        row = {}
        for decade, li in (("sf0.1", li01), ("sf1", li1)):
            runs = []
            for _ in range(iters):
                t0 = time.time()
                n = fn(li).count()
                runs.append(round(time.time() - t0, 2))
            row[decade] = {"best": min(runs), "runs": runs, "rows": n}
        row["growth"] = round(row["sf1"]["best"]
                              / row["sf0.1"]["best"], 2)
        row["per_unit_data"] = round(row["growth"] / 10, 3)
        out["queries"][name] = row
        print(name, row, flush=True)
    with open("/root/repo/GRAPH_SCALING_r12.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote GRAPH_SCALING_r12.json")


if __name__ == "__main__":
    main()
