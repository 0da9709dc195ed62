"""PCA / whitening (operators/pca.py) — planted-covariance recovery,
bit-stability across partitionings, projection/whitening variance, and
the error contracts."""

import numpy as np
import pytest


def _planted(spark, n=3000, d=6, seed=7):
    rng = np.random.default_rng(seed)
    u1 = np.array([1, 1, 0, 0, 0, 0.0]) / np.sqrt(2)
    u2 = np.array([0, 0, 1, -1, 0, 0.0]) / np.sqrt(2)
    x = (rng.normal(0, 3, (n, 1)) * u1 + rng.normal(0, 1, (n, 1)) * u2
         + rng.normal(0, 0.01, (n, d)) + 5.0)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(n)],
        "id long, embedding array<double>")
    return df, u1, u2


def test_pca_recovers_planted_directions(spark):
    from pandas_db_spark.operators.pca import pca_fit

    df, u1, u2 = _planted(spark)
    m = pca_fit(df, k=3)
    c = np.asarray(m["components"])
    assert abs(c[0] @ u1) > 0.999
    assert abs(c[1] @ u2) > 0.999
    assert m["eigvals"][0] > m["eigvals"][1] > m["eigvals"][2]
    assert np.abs(c @ c.T - np.eye(3)).max() < 1e-10


def test_pca_bit_stable_across_partitionings(spark):
    """The whole point of the integer-moment discipline: the model is
    byte-identical however the corpus is partitioned."""
    from pandas_db_spark.operators.pca import pca_fit

    df, _, _ = _planted(spark, n=1200)
    assert pca_fit(df, k=4) == pca_fit(df.repartition(17), k=4) \
        == pca_fit(df.coalesce(1), k=4)


def test_pca_projection_variance_equals_eigvals_and_whitening(spark):
    from pandas_db_spark.operators.pca import pca_fit, pca_project

    df, _, _ = _planted(spark)
    m = pca_fit(df, k=3)
    p = np.array(pca_project(df, m).select("pca")
                 .toPandas()["pca"].tolist())
    assert np.allclose(p.var(axis=0), m["eigvals"], rtol=1e-4)
    pw = np.array(pca_project(df, m, whiten=True).select("pca")
                  .toPandas()["pca"].tolist())
    assert np.allclose(pw.var(axis=0), 1.0, rtol=1e-3)


def test_pca_null_vectors_skipped_in_fit_null_out_in_project(spark):
    from pandas_db_spark.operators.pca import pca_fit, pca_project

    df, _, _ = _planted(spark, n=400)
    with_null = df.union(df.sparkSession.createDataFrame(
        [(99999, None)], "id long, embedding array<double>"))
    m = pca_fit(with_null, k=2)
    assert m["n"] == 400
    out = (pca_project(with_null, m).where("id = 99999")
           .select("pca").collect())
    assert out[0]["pca"] is None


def test_pca_validation_contracts(spark):
    from pandas_db_spark.operators.pca import pca_fit

    df, _, _ = _planted(spark, n=50)
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(df, k=0)
    with pytest.raises(ValueError, match="scale must be"):
        pca_fit(df, scale=0)
    with pytest.raises(ValueError, match="exceeds vector width"):
        pca_fit(df, k=7)
    empty = spark.createDataFrame([(1, None)],
                                  "id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-NULL vectors"):
        pca_fit(empty, k=1)
    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "id long, embedding array<double>").coalesce(1)
    with pytest.raises(Exception, match="mixed vector widths"):
        pca_fit(mixed, k=1)


def test_pca_partition_overflow_guard(spark):
    from pandas_db_spark.operators.pca import pca_fit

    big = spark.createDataFrame(
        [(i, [3.0e3] * 4) for i in range(64)],
        "id long, embedding array<double>").coalesce(1)
    with pytest.raises(Exception, match="int64 overflow"):
        # |q| = 3e9 at scale 1e6 -> q^2 * 64 rows ~ 5.8e20 >= 2^62
        pca_fit(big, k=2)


def test_pca_whitening_composes_with_cosine_dedup(spark):
    """Integration: whiten embeddings with pca_project, then run the
    sign-LSH cosine pair generator in whitened space — a planted exact
    duplicate (identical vector) is still found at threshold ~1, and
    the whitened space decorrelates the planted dominant direction
    (pairs that are near-dups ONLY along the high-variance axis stop
    colliding).  The SemDeDup preprocessing claim, exercised."""
    from pandas_db_spark.operators.pca import pca_fit, pca_project
    from pandas_db_spark.operators.similarity import cosine_pairs_lsh

    rng = np.random.default_rng(3)
    d = 8
    base = rng.normal(0, 1, (200, d))
    base[:, 0] *= 20.0                       # dominant axis
    rows = [(i, base[i].tolist()) for i in range(200)]
    rows.append((900, base[5].tolist()))     # planted exact dup of id 5
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = pca_fit(df, k=d)
    white = (pca_project(df, m, out_col="w", whiten=True)
             .select("vec_id", F.col("w").alias("embedding")))
    pairs = {(r["id_a"], r["id_b"]) for r in
             cosine_pairs_lsh(white, threshold=0.999,
                              id_col="vec_id", dim=d).collect()}
    assert (5, 900) in pairs
