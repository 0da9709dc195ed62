"""K-means clustering over an embedding column — the corpus-curation
primitive behind semantic bucketing, diversity-aware sampling, and
cluster-balanced training mixes (no reference analogue; beyond-parity like
the rest of the LLM-pipeline operators).

Scale shape (the 100 TB story):

* **Centroids broadcast, data never shuffles.**  Assignment is one narrow
  ``mapInPandas`` pass with the k×d centroid matrix captured in the
  closure (k·d doubles — kilobytes).  No join, no shuffle, no state.
* **Lloyd updates move partitions × k rows, not n.**  Each partition
  emits its (cluster, count, per-dimension partial sum) — the classic
  tree-aggregation shape — and the driver reduces a ≤ partitions×k×d
  float block.  Shuffle volume is independent of corpus size.
* **Determinism.**  Init is the k hash-smallest vectors by id (same
  md5 trick as operators/sampling.py), so a re-run over the same corpus
  fits the same centroids; assignment margins are float64 with the same
  vectorized op order per row.  Like every float-sum pipeline, partial
  sums depend on partitioning, so *fit* is registered rows-only; *assign*
  against FIXED centroids is exactly reproducible and oracle-checked
  (see queries.py ``cluster_assign``).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def assign_clusters(emb: DataFrame, centroids: Sequence[Sequence[float]],
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, cluster_id): nearest centroid by cosine, ties broken by lowest
    centroid index.  One narrow Arrow pass — the centroid matrix rides the
    closure (broadcast), the data is never shuffled, so this runs at any
    corpus size for any k that fits in executor memory (k·d doubles)."""
    cent = _normalize(np.asarray(centroids, dtype=np.float64))

    def assigner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vs = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            out = pdf[[id_col]].copy()
            # argmax returns the FIRST max → lowest centroid index on ties
            out["cluster_id"] = (vs @ cent.T).argmax(axis=1).astype(np.int64)
            yield out

    return emb.mapInPandas(assigner, f"{id_col} long, cluster_id long")


def kmeans_fit(emb: DataFrame, k: int = 8, n_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               init_salt: str = "") -> np.ndarray:
    """Lloyd's k-means on the unit sphere (spherical k-means: cosine
    assignment, mean-then-renormalize update).  Returns the (k, d) float64
    centroid matrix.

    Init: the k hash-smallest rows by ``md5(id||salt)`` — a deterministic
    corpus-independent-order sample (same device as
    ``operators/sampling.py``), fetched with the bounded two-phase top-n,
    so no full sort and no skew.  Each iteration is one narrow pass
    (assign + per-partition partial sums) plus a driver-side reduce of
    ≤ partitions × k × d floats; empty clusters keep their previous
    centroid.  For the oracle-checked assignment query use
    :func:`assign_clusters` with fixed centroids."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pandas_db_spark.operators.sampling import stratified_sample

    seed_rows = (stratified_sample(emb.select(id_col, vec_col), [], k,
                                   id_col, salt=init_salt)
                 .orderBy(id_col).collect())
    if len(seed_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seed_rows)}")
    cent = _normalize(np.array([r[vec_col] for r in seed_rows],
                               dtype=np.float64))
    d = cent.shape[1]

    partial_schema = "cluster_id long, cnt long, psum array<double>"

    for _ in range(n_iter):
        cent_local = cent  # rebind: ship THIS iteration's matrix

        def partials(batches: Iterator[pd.DataFrame],
                     _cent=cent_local) -> Iterator[pd.DataFrame]:
            sums = np.zeros((k, d), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                raw = np.array(list(pdf[vec_col]), dtype=np.float64)
                vs = _normalize(raw)
                assign = (vs @ _cent.T).argmax(axis=1)
                np.add.at(sums, assign, vs)
                np.add.at(counts, assign, 1)
            live = np.nonzero(counts)[0]
            if len(live):
                yield pd.DataFrame({
                    "cluster_id": live.astype(np.int64),
                    "cnt": counts[live],
                    "psum": [sums[c] for c in live],
                })

        rows = emb.select(vec_col).mapInPandas(
            partials, partial_schema).collect()
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster_id"]] += np.asarray(r["psum"], dtype=np.float64)
            counts[r["cluster_id"]] += r["cnt"]
        new_cent = cent.copy()  # empty clusters keep their centroid
        live = counts > 0
        new_cent[live] = _normalize(sums[live] / counts[live, None])
        cent = new_cent
    return cent


def kmeans_assign(emb: DataFrame, k: int = 8, n_iter: int = 5,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Fit + assign in one call: (id, cluster_id) under the fitted
    centroids.  Deterministic for a fixed corpus + partitioning, but float
    partial-sum order varies with partitioning, so this is registered as a
    rows-only query; the fixed-centroid :func:`assign_clusters` carries
    the hash-checked oracle."""
    cent = kmeans_fit(emb, k=k, n_iter=n_iter, id_col=id_col,
                      vec_col=vec_col)
    return assign_clusters(emb, cent, id_col=id_col, vec_col=vec_col)


def semdedup(emb: DataFrame, threshold: float = 0.95, k: int = 8,
             n_iter: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: np.ndarray | None = None,
             persist: bool = True) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and pruning within-cluster
    near-duplicates — returns the SURVIVOR frame (all of ``emb``'s
    columns plus ``cluster_id``).

    Recipe, as published: spherical k-means partitions the corpus;
    within each cluster every pair with cosine ≥ ``threshold`` is a
    semantic duplicate edge; of each connected duplicate group, the
    example kept is the one with the LOWEST cosine to its cluster
    centroid (the paper's diversity-preserving keeper rule; ties break
    to the minimum id).

    Plan shape at 100 TB: assignment is one narrow Arrow pass (the
    centroid matrix rides the closure); pair generation shuffles once
    on ``cluster_id`` and is quadratic only WITHIN a cluster, so ``k``
    is the knob — size it for ~n/k-row clusters exactly as the paper
    does (50k clusters for LAION); the keeper rule reuses the
    union-find/large-star machinery of :func:`pandas_db_spark.operators.
    graph.keep_components_by`, never collecting vectors."""
    from pandas_db_spark.operators.graph import keep_components_by
    from pandas_db_spark.operators.similarity import cosine_sim

    if centroids is None:
        centroids = kmeans_fit(emb, k=k, n_iter=n_iter, id_col=id_col,
                               vec_col=vec_col)
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    assigned = assign_clusters(emb, cent, id_col=id_col, vec_col=vec_col)
    base = emb.join(assigned, id_col)
    if persist:
        # the assigned frame feeds three consumers (pair generation,
        # keeper scoring, survivor join-back) — materialize the Arrow
        # assignment pass once instead of re-running it per consumer
        # (same device as dedup._shared_shingles; LRU-evicted under
        # pressure, pass persist=False for fire-and-forget plans)
        from pyspark import StorageLevel
        base = base.persist(StorageLevel.MEMORY_AND_DISK)

    # centroid similarity for the keeper rule, recomputed JVM-side from
    # the SAME normalized matrix the assignment used (array literal —
    # k·d doubles; for k beyond ~10⁴ pass `centroids` from a persisted
    # index and swap the literal for a broadcast join on cluster_id)
    cent_lit = F.array(*[F.array(*[F.lit(float(x)) for x in row])
                         for row in cent])
    cent_vec = F.element_at(cent_lit, (F.col("cluster_id") + 1).cast("int"))
    scored = base.withColumn(
        "__csim", cosine_sim(cent_vec, F.col(vec_col).cast("array<double>")))

    # within-cluster duplicate edges via the fused cogroup device (one
    # small matmul per cluster + bit-exact JVM re-verify of the near-
    # threshold survivors) — see within_group_pairs for the epsilon
    # soundness argument
    from pandas_db_spark.operators.similarity import within_group_pairs
    pairs = within_group_pairs(
        base.select("cluster_id", id_col, vec_col),
        "cluster_id", id_col, vec_col, threshold, emb)

    kept = keep_components_by(scored, pairs, id_col, "__csim",
                              ascending=True)
    return kept.drop("__csim")
