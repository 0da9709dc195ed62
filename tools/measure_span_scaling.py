"""Engine-growth ladder for the span-dedup family (VERDICT r9 #2).

strip_dup_spans shuffles one positional k-gram row per token — the
heaviest shuffle shape added in r9 — and its gram-group sizes grow with
corpus duplication density, the shape class that surprised
dedup_embedding at sf1 in r8.  This tool ladders the three span
operators across sf0.01 / sf0.1 / sf1 (synthesized decade,
tools/make_sf1.py) with the same HASH-SUM engine estimator the curation
ladder uses — agg(bit_xor(xxhash64(*cols))) forces every output column
to be computed without fetching rows (a plain count() lets Catalyst
prune the rebuilt-text column, i.e. the whole point of the query).

Rows measured:

* ``strip_dup_spans`` — the registry headline (every-position index);
* ``winnow_fp``       — the registry headline (sparse ~2/(w+1) index);
* ``span_incremental_fullstore`` — NOT the registry's bounded 450-doc
  probe (whose store is fixed by construction and cannot show growth):
  a fixed 50-doc batch probed against a store of the WHOLE documents
  table at each sf, so the row measures how probe cost grows with
  store size — the "probed, not scanned" claim for the span store.

Usage: python tools/measure_span_scaling.py [iters] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

SFS = [("sf0.01", "/root/testdata/sf0.01"),
       ("sf0.1", "/root/testdata/sf0.1"),
       ("sf1", "/root/repo/benchdata/sf1")]

REGISTRY_QUERIES = ["strip_dup_spans", "winnow_fp"]


def span_incremental_fullstore(spark, sf_dir):
    from pyspark.sql import functions as F
    from pandas_db_spark.queries import get_db
    from pandas_db_spark.operators.dedup import span_incremental

    d = get_db(spark, sf_dir).documents.df
    store = d.select("doc_id", "text")
    # fixed-size batch: 25 verbatim copies (must drop) + 25 novel
    # synthetic-token docs (must survive), independent of sf
    toks = F.split(F.trim(F.col("text")), r"\s+")
    cop = (d.where((F.col("doc_id") < 25) & (F.size(toks) >= 11))
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text"))
    nov = (d.where((F.col("doc_id") >= 450) & (F.col("doc_id") < 475))
            .select((F.col("doc_id") + 20_000_000).alias("doc_id"),
                    F.concat_ws(" ", F.transform(
                        F.sequence(F.lit(1), F.lit(20)),
                        lambda i: F.concat(
                            F.lit("n"), F.col("doc_id").cast("string"),
                            F.lit("w"), i.cast("string")))).alias("text")))
    return span_incremental(cop.unionByName(nov), store,
                            "text", "doc_id", k=8, w=4)


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fns = {n: REGISTRY[n][0] for n in REGISTRY_QUERIES}
    fns["span_incremental_fullstore"] = span_incremental_fullstore

    out = {"iters": iters, "loadavg_start": os.getloadavg()[0],
           "queries": {}}
    for name, fn in fns.items():
        row = {}
        for sf, d in SFS:
            if not os.path.exists(d):
                continue
            runs = []
            for _ in range(iters):
                t0 = time.time()
                q = fn(spark, d)
                q.agg(F.bit_xor(F.xxhash64(*q.columns))).collect()
                runs.append(round(time.time() - t0, 2))
            n = fn(spark, d).count()
            row[sf] = {"best_sec": min(runs), "runs": runs, "rows": n}
            print(name, sf, row[sf], flush=True)
        for lo, hi, key in (("sf0.01", "sf0.1", "growth_sf001_to_sf01"),
                            ("sf0.1", "sf1", "growth_sf01_to_sf1")):
            if lo in row and hi in row:
                row[key] = round(
                    row[hi]["best_sec"] / row[lo]["best_sec"], 2)
        out["queries"][name] = row
    out["loadavg_end"] = os.getloadavg()[0]
    blob = json.dumps(out)
    print(blob)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob)


if __name__ == "__main__":
    main()
