"""Fixture-scale PCA / PPMI-SVD (SURVEY.md L1/L2 parity)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark.lm.decomposition import (
    pca_2d,
    ppmi_svd_factors,
    svd_cosine_topk,
)


def test_ppmi_svd_reconstruction(spark):
    # tiny ppmi triples with known structure: a-b strong, c-d strong
    triples = [("a", "b", 2.0), ("b", "a", 2.0), ("c", "d", 1.5), ("d", "c", 1.5)]
    ppmi = spark.createDataFrame(triples, "a string, b string, ppmi double")
    factors, vocab = ppmi_svd_factors(spark, ppmi, rank=4)
    assert vocab == ["a", "b", "c", "d"]
    rows = {r["term"]: np.array(r["vector"]) for r in factors.collect()}
    # rank-4 factors of a symmetric 4x4 reconstruct pairwise structure:
    # cosine(a,?) must rank b above c/d
    top = svd_cosine_topk(factors, "a", k=3).collect()
    assert top[0]["term"] == "b"


def test_svd_cosine_topk_missing_term(spark):
    ppmi = spark.createDataFrame([("a", "b", 1.0)], "a string, b string, ppmi double")
    factors, _ = ppmi_svd_factors(spark, ppmi, rank=2)
    assert svd_cosine_topk(factors, "zzz", k=3).count() == 0


def test_ppmi_svd_scale_guard(spark):
    import information_retrieval_project_spark.lm.decomposition as D

    old = D.MAX_DENSE_VOCAB
    D.MAX_DENSE_VOCAB = 2
    try:
        ppmi = spark.createDataFrame(
            [("a", "b", 1.0), ("b", "c", 1.0)], "a string, b string, ppmi double"
        )
        with pytest.raises(ValueError, match="fixture-scale"):
            ppmi_svd_factors(spark, ppmi)
    finally:
        D.MAX_DENSE_VOCAB = old


def test_pca_2d_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    out = pca_2d(spark, emb).collect()
    assert len(out) == emb.count()
    rows = emb.collect()
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    centered = m - m.mean(axis=0)
    u, s, _ = np.linalg.svd(centered, full_matrices=False)
    var2 = (s[:2] ** 2).sum()
    got = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in out}
    got_var = sum(x * x + y * y for x, y in got.values())
    # projected variance onto the top-2 components must match numpy's
    assert abs(got_var - var2) / var2 < 1e-9
