"""Synthesize the sf10 decade (documents + embeddings only) for the
three operators whose 100 TB story rests on a single measured decade
(VERDICT r9 #6): dedup_embedding_ivf, strip_dup_spans,
dedup_minhash_incremental.

Same structure-preserving trick as tools/make_sf1.py, applied to the
sf1 corpus: 10 replicas, replica j > 0 suffixes every word with
``r<j>`` (sf1 words already carry ``q<k>``, so all 100 sf0.1-shaped
sub-corpora have pairwise-disjoint vocabularies — no artificial
cross-replica duplicates) and rotates every embedding by a fresh seeded
orthogonal Q_j (within-replica cosines preserved, cross-replica ~0).
Only the two tables those queries read are written — 500k docs / 200k
vectors, ~110 MB — the fact tables are not part of this ladder.

Usage: python tools/make_sf10.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

OFF = 100_000_000_000  # above sf1's max id (9e9 + base)
N_REPLICAS = 10
SRC = "/root/repo/benchdata/sf1"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
    os.makedirs(out, exist_ok=True)
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.sources.registry import read_parquet
    from pyspark.sql import functions as F

    spark = get_spark()

    base = read_parquet(spark, f"{SRC}/documents.parquet")
    parts = []
    for j in range(N_REPLICAS):
        df = base.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(j * OFF)).cast("long"))
        if j:
            words = F.split(F.trim(F.col("text")), r"\s+")
            txt = F.array_join(
                F.transform(words, lambda w: F.concat(w, F.lit(f"r{j}"))),
                " ")
            df = (df.withColumn("text", txt)
                    .withColumn("n_chars", F.length("text").cast("long")))
        parts.append(df)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print("documents rows:", spark.read.parquet(
        f"{out}/documents.parquet").count())

    emb = read_parquet(spark, f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for j in range(N_REPLICAS):
        if j == 0:
            qj = np.eye(dim)
        else:
            rng = np.random.RandomState(2000 + j)
            qj, _ = np.linalg.qr(rng.standard_normal((dim, dim)))

        def rot(batches, _q=qj):
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.array(list(pdf["embedding"]), dtype=np.float64)
                pdf = pdf.copy()
                pdf["embedding"] = list((mat @ _q.T).astype(np.float32))
                yield pdf

        parts.append(emb.withColumn(
            "vec_id", (F.col("vec_id") + F.lit(j * OFF)).cast("long"))
            .mapInPandas(rot, emb.schema))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print("embeddings rows:", spark.read.parquet(
        f"{out}/embeddings.parquet").count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
