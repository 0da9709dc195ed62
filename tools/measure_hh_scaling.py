"""Ladder receipt for the bounded-memory heavy hitters (VERDICT r12
Next #6 done-criterion): fold the documents corpus at each SF through
the Misra-Gries store (capacity 4096) as two micro-batches and record

* summary store rows  — must stay <= capacity, FLAT as the corpus grows
* exact vocab size    — what the exact monitor's store would hold (the
  contrast line: it grows with the corpus)
* per-batch fold seconds, n_tokens, exact err_ub vs the N/(k+1) bound

Writes HH_SCALING_r13.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAP = 4096


def main() -> None:
    from pyspark.sql import functions as F

    from pandas_db_spark.session import get_spark
    from pandas_db_spark.streaming.monitor import (
        append_heavy_hitters_batch, heavy_hitters_meta,
        heavy_hitters_topk)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"capacity": CAP, "batches": 2, "ladder": []}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = [("0.001", "/root/testdata/sf0.001"),
            ("0.01", "/root/testdata/sf0.01"),
            ("0.1", "/root/testdata/sf0.1"),
            # one more decade when the synthesized bench corpus exists
            ("1", os.path.join(repo, "benchdata", "sf1"))]
    for sf, sf_dir in dirs:
        if not os.path.isdir(sf_dir):
            continue
        # Web-text-shaped stream: per row one HEAVY head token (100 hot
        # terms) + one near-unique rare-tail token, so the exact vocab
        # grows WITH the corpus (at 100 TB the vocab IS the data) while
        # the MG summary must stay <= capacity.  (The synthetic
        # documents table has a 31-term vocab — useless here.)
        docs = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.col("l_orderkey").alias("doc_id"),
            F.concat(F.lit("h"), (F.col("l_orderkey") % 100)
                     .cast("string"),
                     F.lit(" r"),
                     (F.col("l_orderkey") * 10
                      + F.col("l_linenumber")).cast("string"))
            .alias("text"))
        vocab = docs.select(F.explode(
            F.split(F.trim("text"), r"\s+")).alias("t")) \
            .agg(F.countDistinct("t")).collect()[0][0]
        store = tempfile.mkdtemp(prefix=f"pds_hh_sf{sf}_")
        try:
            secs = []
            for bi in range(2):
                t0 = time.perf_counter()
                append_heavy_hitters_batch(
                    docs.where(F.col("doc_id") % 2 == bi), bi, store,
                    capacity=CAP)
                secs.append(round(time.perf_counter() - t0, 3))
            n_summary = heavy_hitters_topk(spark, store, k=CAP).count()
            meta = heavy_hitters_meta(spark, store).collect()[-1]
        finally:
            shutil.rmtree(store, ignore_errors=True)
        row = {
            "sf": float(sf),
            "summary_rows": int(n_summary),
            "exact_vocab_rows": int(vocab),
            "batch_secs": secs,
            "n_tokens": int(meta["n_tokens"]),
            "err_ub": int(meta["err_ub"]),
            "err_ub_worst_case": int(meta["n_tokens"]) // (CAP + 1),
        }
        out["ladder"].append(row)
        print(row, file=sys.stderr)
    out["note"] = ("summary_rows is capped at capacity and flat across "
                   "the decade ladder while exact_vocab_rows (the exact "
                   "monitor's per-batch store width) grows with the "
                   "corpus; err_ub is the exact cumulative trim total, "
                   "<= the n_tokens/(capacity+1) Misra-Gries bound")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "HH_SCALING_r13.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
