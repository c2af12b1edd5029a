"""Fixture-scale linear algebra: PPMI-SVD embeddings and 2-D PCA.

Reference parity for SURVEY.md L1/L2 (showPCA data_manager.py:359-384;
SVD_cosine_matrix data_manager.py:658-680). Policy per SURVEY §2.10: these
run driver-side on COLLECTED small matrices — they are offline analysis
aids over vocabularies/query sets, not the hot path, and a dense V×V SVD
does not belong on the cluster. Guard rails enforce fixture scale; the
distributed alternative (mllib RowMatrix.computeSVD) is documented for
larger vocabularies.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_DENSE_VOCAB = 5000  # refuse to densify beyond fixture scale


def ppmi_svd_factors(
    spark: SparkSession, ppmi: DataFrame, rank: int = 16, method: str = "auto"
) -> tuple[DataFrame, list[str]]:
    """PPMI triples (a, b, ppmi) → rank-k word factors U·S as a DataFrame
    (term, vector:array<double>). Mirrors the reference's numpy SVD of the
    dense PPMI frame (data_manager.py:658-668).

    method: "dense" collects and densifies (fixture scale only, hard-capped
    at MAX_DENSE_VOCAB); "distributed" never densifies — sparse
    IndexedRowMatrix.computeSVD (ARPACK on the gram matrix; only the V×k
    factor is ever local). "auto" picks dense under the cap, distributed
    above it (VERDICT r2 #6: above-cap no longer raises)."""
    if method not in ("auto", "dense", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    if method != "dense":  # dense re-derives vocab from its own collect
        vocab_df = (
            ppmi.select(F.col("a").alias("term"))
            .union(ppmi.select(F.col("b").alias("term")))
            .distinct()
        )
        n_vocab = vocab_df.count()
        if method == "auto":
            method = "dense" if n_vocab <= MAX_DENSE_VOCAB else "distributed"
        if method == "distributed":
            return _ppmi_svd_distributed(spark, ppmi, vocab_df, n_vocab, rank)
    rows = ppmi.collect()
    vocab = sorted({r["a"] for r in rows} | {r["b"] for r in rows})
    if len(vocab) > MAX_DENSE_VOCAB:
        raise ValueError(
            f"vocab {len(vocab)} exceeds fixture-scale dense limit "
            f"{MAX_DENSE_VOCAB}; use method='distributed'"
        )
    pos = {w: i for i, w in enumerate(vocab)}
    m = np.zeros((len(vocab), len(vocab)))
    for r in rows:
        m[pos[r["a"]], pos[r["b"]]] = r["ppmi"]
    u, s, _ = np.linalg.svd(m, full_matrices=False)
    k = min(rank, s.size)
    factors = u[:, :k] * s[:k]
    df = spark.createDataFrame(
        [(w, factors[pos[w]].tolist()) for w in vocab],
        "term string, vector array<double>",
    )
    return df, vocab


def _ppmi_svd_distributed(
    spark: SparkSession,
    ppmi: DataFrame,
    vocab_df: DataFrame,
    n_vocab: int,
    rank: int,
) -> tuple[DataFrame, list[str]]:
    """Sparse distributed SVD of the PPMI matrix — the above-fixture-scale
    path. term→row-index comes from a distributed sort + zipWithIndex (no
    driver-side vocab dict); rows are mllib SparseVectors, so the only
    dense object anywhere is the k-column factor block. Terms that appear
    only as context (column b, no outgoing row) are zero rows of the
    matrix, hence zero factor vectors — filled in after the join to match
    the dense path's semantics."""
    from pyspark.mllib.linalg import Vectors
    from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

    k = min(rank, n_vocab)
    idx_df = (
        vocab_df.rdd.map(lambda r: r["term"])
        .sortBy(lambda t: t)
        .zipWithIndex()
        .toDF(["term", "i"])
        .persist()
    )
    a_idx = idx_df.select(F.col("term").alias("a"), F.col("i").alias("ai"))
    b_idx = idx_df.select(F.col("term").alias("b"), F.col("i").alias("bi"))
    cells = ppmi.join(a_idx, "a").join(b_idx, "b").select("ai", "bi", "ppmi")
    rows = (
        cells.rdd.map(lambda r: (r["ai"], (r["bi"], float(r["ppmi"]))))
        .groupByKey()
        .map(
            lambda kv: IndexedRow(
                kv[0], Vectors.sparse(n_vocab, sorted(kv[1]))
            )
        )
    )
    svd = IndexedRowMatrix(rows).computeSVD(k, computeU=True)
    s = [float(x) for x in svd.s]
    # computeSVD may return k' < k singular values (rCond trims the tail on
    # rank-deficient PPMI matrices, ADVICE r3); every factor vector — U·S
    # rows AND the zero-fill for context-only terms — must use the SAME
    # width k' or the output is ragged and downstream cosine math breaks
    k_actual = len(s)
    u_df = svd.U.rows.map(
        lambda ir: (int(ir.index), [float(x) * sv for x, sv in zip(ir.vector, s)])
    ).toDF("i long, vector array<double>")
    zeros = F.array(*[F.lit(0.0) for _ in range(k_actual)])
    factors = (
        idx_df.join(u_df, "i", "left")
        .select("term", F.coalesce("vector", zeros).alias("vector"))
    )
    vocab = [r["term"] for r in idx_df.orderBy("i").select("term").collect()]
    return factors, vocab


def svd_cosine_topk(
    factors: DataFrame, query_term: str, k: int = 10
) -> DataFrame:
    """Nearest terms to query_term by cosine over the SVD factors (the
    reference's cosine over U·S rows, data_manager.py:670-680) — expressed
    as native column math so only the 1-row query vector is collected."""
    from pyspark.sql import functions as F

    q = factors.filter(F.col("term") == query_term).collect()
    if not q:
        return factors.sparkSession.createDataFrame(
            [], "term string, cosine double"
        )
    qv = np.array(q[0]["vector"])
    qn = float(np.linalg.norm(qv))
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    dot = F.aggregate(
        F.zip_with("vector", qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform("vector", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return (
        factors.filter(F.col("term") != query_term)
        .select("term", (dot / (nrm * F.lit(qn))).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("term"))
        .limit(k)
    )


def pca_2d(
    spark: SparkSession,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """2-D PCA projection + distance-to-centroid (reference showPCA,
    data_manager.py:359-384: PCA to 2 components then euclidean distances).
    Centering + SVD run driver-side on the collected matrix (guarded)."""
    rows = vectors.select(id_col, vec_col).collect()
    if len(rows) > max_rows:
        raise ValueError(f"{len(rows)} rows exceeds fixture-scale PCA limit")
    ids = [r[id_col] for r in rows]
    m = np.array([r[vec_col] for r in rows], dtype=np.float64)
    centered = m - m.mean(axis=0)
    u, s, _ = np.linalg.svd(centered, full_matrices=False)
    xy = u[:, :2] * s[:2]
    # deterministic sign convention: largest |loading| positive per component
    for j in range(xy.shape[1]):
        i = int(np.argmax(np.abs(xy[:, j])))
        if xy[i, j] < 0:
            xy[:, j] = -xy[:, j]
    d = np.sqrt((xy ** 2).sum(axis=1))
    return spark.createDataFrame(
        [(int(i), float(x), float(y), float(dd)) for i, (x, y), dd in zip(ids, xy, d)],
        f"{id_col} long, pc1 double, pc2 double, dist double",
    )
