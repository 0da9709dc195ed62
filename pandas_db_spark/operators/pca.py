"""PCA / whitening for embedding columns — the preprocessing pass an
embedding pipeline runs before IVF/PQ indexing or SemDeDup (decorrelated,
variance-ordered dimensions make residual codebooks and cosine thresholds
behave; OPQ-style rotations in the PQ literature are this plus a per-block
permutation).

Determinism discipline (the corr_matrix rule applied to a MATRIX moment):
a float Gram matrix accumulated across partitions is partition-order
dependent, so the fitted basis would differ run to run.  Here each vector
is quantized ONCE to integers (``round(x * scale)``) and the Gram/mean
moments are EXACT int accumulations — per-partition ``int64`` matmuls with
an explicit overflow guard, summed on the driver as Python ints (unbounded,
exact).  The only float steps are the final covariance division and the
eigendecomposition, both computed ONCE on the driver from bytes that are
partition-order independent — so the model is bit-stable across runs,
partitionings, and cluster sizes for a given corpus.

Scale shape: the fit is ONE Arrow-batched pass (`mapInPandas`) emitting one
``d·(d+3)/2``-element partial per PARTITION (a few KB each; d is the
embedding width, bounded by the model, not the corpus), folded on the
driver — the classic tree-reduce moment shape, no shuffle of the vectors
at all.  Projection is pure JVM: k dot products per row as codegen'd
``aggregate(zip_with(...))`` expressions over array literals (k·d literal
nodes — fine for embedding-sized d; far below the 4k-element cliff the
classifier module documents).

Reference scope: the reference engine has no linear-algebra operators;
beyond-parity capability for the LLM-pipeline layer, gated by the
``pca_invariant`` oracle (orthonormality, eigenvalue ordering, projected
variance == eigenvalue) and fixture pytests with known covariance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8,
            scale: int = 10 ** 6) -> dict:
    """Fit a top-``k`` PCA basis on an ``array<float/double>`` column.

    Returns a plain JSON-able model dict:
    ``{"mean": [d floats], "components": [k][d] (rows orthonormal,
    descending eigenvalue), "eigvals": [k], "n": rows, "d": dim,
    "scale": scale}`` — eigenvalues are the POPULATION variances of the
    projections.  Rows with NULL vectors are skipped; a dimension
    mismatch raises (mixed widths corrupt the Gram silently otherwise).

    ``scale`` sets the quantization grid: inputs are rounded to
    ``1/scale`` before the exact accumulation, so the fitted model is
    the PCA of the QUANTIZED corpus — at the default 1e-6 grid the
    basis differs from the unquantized one far below eigenvector noise.
    Overflow: each partition asserts ``max(|q|)² · rows`` fits int64;
    the driver fold is exact Python ints, so corpus size is unbounded —
    only a single partition's mass is constrained (repartition finer if
    a partition ever trips it).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")

    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            try:
                x = np.asarray(vecs, dtype=np.float64)
            except ValueError as exc:     # ragged -> inhomogeneous
                raise ValueError(
                    f"pca_fit: {vec_col} has mixed vector widths "
                    "within a batch — a rectangular corpus is "
                    "required") from exc
            if x.ndim != 2:
                raise ValueError(
                    f"pca_fit: {vec_col} has mixed vector widths "
                    "within a batch — a rectangular corpus is required")
            q = np.rint(x * scale).astype(np.int64)
            peak = int(np.abs(q).max(initial=0))
            if peak * peak * q.shape[0] >= 2 ** 62:
                raise ValueError(
                    "pca_fit: partition Gram risks int64 overflow "
                    f"(max|q|={peak}, rows={q.shape[0]}); lower scale "
                    "or repartition finer")
            gram = (q.T @ q)
            yield pd.DataFrame({
                "n": [int(q.shape[0])],
                "d": [int(q.shape[1])],
                "s": [q.sum(axis=0).tolist()],
                # upper triangle (row-major) — halves the Arrow payload
                "g": [gram[np.triu_indices(q.shape[1])].tolist()],
            })

    rows = (df.select(vec_col)
            .mapInPandas(partials,
                         "n long, d int, s array<long>, "
                         "g array<long>")
            .collect())
    if not rows:
        raise ValueError("pca_fit: no non-NULL vectors")
    dims = {r["d"] for r in rows}
    if len(dims) > 1:
        raise ValueError(
            f"pca_fit: mixed vector widths across corpus: {sorted(dims)}")
    d = dims.pop()
    if k > d:
        raise ValueError(f"k={k} exceeds vector width d={d}")
    n = sum(r["n"] for r in rows)
    s = [0] * d
    g = [0] * (d * (d + 1) // 2)
    for r in rows:                       # exact: Python ints, no wrap
        for i, v in enumerate(r["s"]):
            s[i] += int(v)
        for i, v in enumerate(r["g"]):
            g[i] += int(v)
    np_g = np.zeros((d, d), dtype=np.float64)
    iu = np.triu_indices(d)
    np_g[iu] = np.asarray(g, dtype=np.float64)
    np_g = np_g + np.triu(np_g, 1).T
    mean_q = np.asarray(s, dtype=np.float64) / n
    cov = (np_g / n - np.outer(mean_q, mean_q)) / (scale * scale)
    w, v = np.linalg.eigh(cov)           # ascending
    order = np.argsort(w)[::-1][:k]
    eig = w[order]
    comp = v[:, order].T                 # k x d
    # canonical sign: the largest-|coordinate| entry of each component
    # is positive (first such index on ties), so the basis is unique
    for j in range(k):
        i = int(np.argmax(np.abs(comp[j])))
        if comp[j][i] < 0:
            comp[j] = -comp[j]
    return {"mean": (mean_q / scale).tolist(),
            "components": comp.tolist(),
            "eigvals": eig.tolist(),
            "n": int(n), "d": int(d), "scale": int(scale)}


def pca_project(df: DataFrame, model: dict, vec_col: str = "embedding",
                out_col: str = "pca", whiten: bool = False,
                eps: float = 1e-12) -> DataFrame:
    """Project ``vec_col`` onto the fitted basis — pure JVM, zero
    Python in the hot path: component ``j`` is one codegen'd
    ``aggregate(zip_with(vec, w_j, *), +)`` fold minus the precomputed
    ``dot(mean, w_j)`` offset.  ``whiten=True`` divides each coordinate
    by ``sqrt(eigval + eps)`` (unit-variance output — the SemDeDup /
    OPQ preprocessing form).  NULL vectors yield NULL."""
    comps = model["components"]
    mean = model["mean"]
    outs = []
    for j, wj in enumerate(comps):
        offset = sum(m * w for m, w in zip(mean, wj))
        arr = F.array(*[F.lit(float(x)) for x in wj])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), arr,
                       lambda x, w: x * w),
            F.lit(0.0), lambda acc, x: acc + x)
        coord = dot - F.lit(float(offset))
        if whiten:
            coord = coord / F.lit(
                float(math.sqrt(model["eigvals"][j] + eps)))
        outs.append(coord)
    return df.withColumn(
        out_col,
        F.when(F.col(vec_col).isNotNull(), F.array(*outs)))
