"""Scaling ladder for the r12 part-4 graph family: k-core, HITS, LPA,
BFS, and common-neighbor counts at sf0.1 vs the synthesized sf1 decade
(the make_sf1 key-offset replica convention — 10 structure-preserving
copies with disjoint key spaces, so per-edge densities match sf0.1
exactly while edge cardinality grows 10x; BFS seeds replicate per copy,
so frontier shape scales with the graph).

Writes GRAPH_SCALING_r12b.json.  Run on an idle machine.

Usage: python tools/measure_graph_scaling_p4.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = 1_000_000_000
PART_OFF = 10_000_000


def pairs_copurchase(li):
    from pyspark.sql import functions as F
    lp = (li.where(F.col("l_quantity") >= 35)
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("p")).distinct())
    a, b = lp.alias("a"), lp.alias("b")
    return (a.join(b, (F.col("a.ok") == F.col("b.ok"))
                   & (F.col("a.p") < F.col("b.p")))
            .select(F.col("a.p").alias("id_a"),
                    F.col("b.p").alias("id_b")))


def edges_directed(li):
    from pyspark.sql import functions as F
    return li.where(F.col("l_quantity") >= 35).select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + PART_OFF).cast("long").alias("dst"))


def edges_bfs(li):
    from pyspark.sql import functions as F
    fwd = (li.where(F.col("l_quantity") >= 49)
           .select(F.col("l_suppkey").cast("long").alias("src"),
                   (F.col("l_partkey") + PART_OFF).cast("long")
                   .alias("dst")))
    return fwd.union(fwd.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.operators.graph import (
        bfs_distances, common_neighbor_counts, core_numbers, hits,
        label_propagation)
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    li01 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
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

    def seeds_for(li):
        # every suppkey congruent to 3 mod 5 in its replica's key space
        return (li.select(F.col("l_suppkey").cast("long").alias("id"))
                .where((F.col("id") % OFF) % 5 == 3).distinct())

    out: dict = {"iters": iters, "queries": {}}
    cases = {
        "graph_kcore": lambda li: core_numbers(
            pairs_copurchase(li), max_rounds=24),
        "graph_hits": lambda li: hits(
            edges_directed(li), iterations=4),
        "graph_lpa": lambda li: label_propagation(
            pairs_copurchase(li), rounds=4),
        "graph_bfs": lambda li: bfs_distances(
            edges_bfs(li), seeds_for(li), max_hops=6),
        "graph_common_neighbors": lambda li: common_neighbor_counts(
            pairs_copurchase(li), min_common=3),
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
    with open("/root/repo/GRAPH_SCALING_r12b.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote GRAPH_SCALING_r12b.json")


if __name__ == "__main__":
    main()
