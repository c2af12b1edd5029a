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
    """Explicit dense above the cap still raises; auto falls through to the
    distributed path instead of raising (VERDICT r2 #6)."""
    import information_retrieval_project_spark.lm.decomposition as D

    old = D.MAX_DENSE_VOCAB
    D.MAX_DENSE_VOCAB = 2
    try:
        ppmi = spark.createDataFrame(
            [("a", "b", 1.0), ("b", "c", 1.0)], "a string, b string, ppmi double"
        )
        with pytest.raises(ValueError, match="fixture-scale"):
            ppmi_svd_factors(spark, ppmi, method="dense")
        factors, vocab = ppmi_svd_factors(spark, ppmi)  # auto -> distributed
        assert vocab == ["a", "b", "c"]
        assert factors.count() == 3
    finally:
        D.MAX_DENSE_VOCAB = old


def test_ppmi_svd_distributed_matches_dense(spark):
    """Distributed sparse SVD reproduces the dense factors up to the usual
    per-component sign ambiguity, including zero rows for context-only
    terms, and round-trips shapes above the dense cap."""
    triples = [
        # weights chosen so every singular value is distinct — a degenerate
        # pair would make the factor subspace rotation-ambiguous and the
        # dense/ARPACK comparison meaningless
        ("a", "b", 2.0), ("b", "a", 2.0), ("c", "d", 1.5), ("d", "c", 1.2),
        ("a", "e", 0.5),  # e appears only as context -> zero factor row
    ]
    ppmi = spark.createDataFrame(triples, "a string, b string, ppmi double")
    dense, vocab_d = ppmi_svd_factors(spark, ppmi, rank=4, method="dense")
    dist, vocab_s = ppmi_svd_factors(spark, ppmi, rank=4, method="distributed")
    assert vocab_d == vocab_s == ["a", "b", "c", "d", "e"]
    dm = {r["term"]: np.array(r["vector"]) for r in dense.collect()}
    sm = {r["term"]: np.array(r["vector"]) for r in dist.collect()}
    assert sm["e"] == pytest.approx(np.zeros(4))
    # align per-component signs on the largest-magnitude row, then compare
    D = np.array([dm[t] for t in vocab_d])
    S = np.array([sm[t] for t in vocab_s])
    k = min(D.shape[1], S.shape[1])
    for j in range(k):
        i = int(np.argmax(np.abs(D[:, j])))
        if D[i, j] * S[i, j] < 0:
            S[:, j] = -S[:, j]
        assert S[:, j] == pytest.approx(D[:, j], abs=1e-6)
    # factor SHAPES above the cap: V x k with k = rank
    n = 24
    ring = [(f"t{i:02d}", f"t{(i + 1) % n:02d}", 1.0 + (i % 3)) for i in range(n)]
    big = spark.createDataFrame(ring, "a string, b string, ppmi double")
    import information_retrieval_project_spark.lm.decomposition as Dm

    old = Dm.MAX_DENSE_VOCAB
    Dm.MAX_DENSE_VOCAB = 8  # force the above-cap branch without a 5k matrix
    try:
        factors, vocab = ppmi_svd_factors(spark, big, rank=5)
        rows = factors.collect()
        assert len(rows) == n and len(vocab) == n
        assert all(len(r["vector"]) == 5 for r in rows)
    finally:
        Dm.MAX_DENSE_VOCAB = old


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


def test_ppmi_svd_unknown_method_rejected(spark):
    ppmi = spark.createDataFrame([("a", "b", 1.0)], "a string, b string, ppmi double")
    with pytest.raises(ValueError, match="unknown method"):
        ppmi_svd_factors(spark, ppmi, method="distrbuted")
