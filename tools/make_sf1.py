"""Synthesize an sf1 bench corpus (~10x sf0.1) for the scaling rehearsal.

The driver provides sf0.001/0.01/0.1; the 100 TB argument rests on the
per-decade growth ratio, so this tool extends the ladder one decade by
writing 10 STRUCTURE-PRESERVING replicas of sf0.1 to
``/root/repo/benchdata/sf1`` (bench-only data — never used for
correctness oracles, and gitignored):

* fact tables (customer/supplier/part/orders/lineitem/events): replica k
  adds ``k * 10^9`` to every surrogate/foreign key, so join fan-outs and
  per-key densities match sf0.1 exactly while key cardinality grows 10x;
  nation/region keys are untouched (TPC-H keeps dims fixed) and copied
  as-is;
* documents: replica 0 is verbatim; replica k > 0 suffixes every word
  with ``q<k>`` — the replica stays INTERNALLY isomorphic to sf0.1
  (identical shingle structure, so near-dup clusters and LSH candidate
  volume scale exactly 10x) while replica vocabularies are disjoint, so
  no artificial cross-replica duplicates inflate candidate pairs
  quadratically;
* embeddings: replica 0 verbatim; replica k > 0 applies one random
  ORTHOGONAL rotation Q_k (seeded QR) to every vector — within-replica
  cosines are preserved bit-for-bit in structure (rotations are
  isometries), across replicas vectors decorrelate (expected cosine ~0),
  the same no-cross-replica-artifact property as the text suffixing.

Timestamps keep their original span: 10x events in the same window is
the densification a production topic sees, and keeps windowed-grid query
output sizes comparable per row of input.

Usage: python tools/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

OFF = 1_000_000_000
N_REPLICAS = 10
SRC = "/root/testdata/sf0.1"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
    os.makedirs(out, exist_ok=True)
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.sources.registry import read_parquet
    from pyspark.sql import functions as F

    spark = get_spark()

    def replicate(table: str, key_cols: list[str], extra=None):
        base = read_parquet(spark, f"{SRC}/{table}.parquet")
        parts = []
        for k in range(N_REPLICAS):
            df = base
            for c in key_cols:
                df = df.withColumn(c, (F.col(c) + F.lit(k * OFF)).cast("long"))
            if extra is not None:
                df = extra(df, k)
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(table, "rows:", spark.read.parquet(
            f"{out}/{table}.parquet").count())

    for t in ("region", "nation"):
        read_parquet(spark, f"{SRC}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{out}/{t}.parquet")

    replicate("customer", ["c_custkey"])
    replicate("supplier", ["s_suppkey"])
    replicate("part", ["p_partkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    replicate("events", ["event_id", "user_id"])

    def doc_extra(df, k):
        if k == 0:
            return df
        words = F.split(F.trim(F.col("text")), r"\s+")
        txt = F.array_join(
            F.transform(words, lambda w: F.concat(w, F.lit(f"q{k}"))), " ")
        return (df.withColumn("text", txt)
                  .withColumn("n_chars", F.length("text").cast("long")))

    replicate("documents", ["doc_id"], doc_extra)

    # embeddings: per-replica orthogonal rotation via mapInPandas
    import pandas as pd  # noqa: F401  (mapInPandas batches)
    base = read_parquet(spark, f"{SRC}/embeddings.parquet")
    dim = len(base.select("embedding").first()[0])
    qs = []
    for k in range(N_REPLICAS):
        if k == 0:
            qs.append(np.eye(dim))
        else:
            rng = np.random.RandomState(1000 + k)
            q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            qs.append(q)

    parts = []
    for k in range(N_REPLICAS):
        qk = qs[k]

        def rot(batches, _q=qk):
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.array(list(pdf["embedding"]), dtype=np.float64)
                rotated = (mat @ _q.T).astype(np.float32)
                pdf = pdf.copy()
                pdf["embedding"] = list(rotated)
                yield pdf

        df = (base.withColumn(
            "vec_id", (F.col("vec_id") + F.lit(k * OFF)).cast("long"))
            .mapInPandas(rot, base.schema))
        parts.append(df)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print("embeddings rows:", spark.read.parquet(
        f"{out}/embeddings.parquet").count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
