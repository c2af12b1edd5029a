"""Approximate-nearest-neighbor search over an embedding column.

Two tiers (per the training-data-pipeline requirements):
- brute_force_cosine_topk: exact baseline — native higher-order functions
  (zip_with/aggregate dot product) + TakeOrderedAndProject. No UDF, fully
  codegen'd; at 100 TB this is a full scan, which is exactly what the exact
  baseline must be.
- rp_lsh_buckets / lsh_bucketed_topk: random-hyperplane LSH (Charikar 2002,
  public algorithm). Hyperplanes are derived deterministically from a seed via
  numpy and injected as literal arrays, so the plan stays native; candidates
  are restricted to the query's bucket (and optional multi-probe neighbors),
  turning the scan into a bucket-pruned lookup. At scale the bucket id is a
  partition column — partition pruning does the candidate selection.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def brute_force_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    e = emb.withColumn("_v", _as_double(F.col(vec_col)))
    scored = e.select(
        F.col(id_col),
        (_dot(F.col("_v"), q) / (_norm(F.col("_v")) * _norm(q))).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_lsh_buckets(
    emb: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Add a sign-pattern bucket id: bit_j = [dot(v, h_j) >= 0]. Pure column
    math — each plane is a literal array folded into the plan."""
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for j, h in enumerate(planes):
        hcol = F.array(*[F.lit(float(x)) for x in h])
        bit = (_dot(v, hcol) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, j)
    return emb.withColumn(bucket_col, bucket)


def ivf_train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """Train an IVF coarse quantizer: k-means on a DRIVER-SIDE sample (the
    standard IVF recipe — the quantizer is tiny and trained on a sample even
    at billion-vector scale; only ASSIGNMENT is distributed)."""
    sample = emb.select(vec_col).limit(sample_rows).collect()
    x = np.array([r[vec_col] for r in sample], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_assign(
    emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding",
    bucket_col: str = "ivf_bucket",
) -> DataFrame:
    """Distributed assignment: bucket = argmin_c ||v - c||² expressed as the
    native argmax of (2·v·c − ||c||²) over literal centroid arrays — pure
    column math, no UDF, prunes like a partition column at scale."""
    v = _as_double(F.col(vec_col))
    entries = []
    for ci, c in enumerate(centroids):
        ccol = F.array(*[F.lit(float(x)) for x in c])
        score = 2.0 * _dot(v, ccol) - float((c * c).sum())
        entries.append(F.struct(score.alias("s"), F.lit(ci).alias("c")))
    best = F.array_sort(
        F.array(*entries),
        lambda a, b: F.when(a["s"] > b["s"], -1)
        .when(a["s"] < b["s"], 1)
        .when(a["c"] < b["c"], -1)
        .otherwise(1),
    )[0]
    return emb.withColumn(bucket_col, best["c"])


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score only vectors in the nprobe nearest buckets."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(d)[:nprobe].tolist()
    cand = assigned.filter(F.col("ivf_bucket").isin([int(x) for x in probe]))
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)


def lsh_near_dup_pairs(
    emb: DataFrame,
    planes: np.ndarray,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
    max_bucket: int = 10_000,
) -> DataFrame:
    """ALL-PAIRS embedding near-dup detection above cosine `tau`, LSH-bucketed
    (the dedup counterpart of lsh_bucketed_topk's search): candidates are
    pairs whose sign-buckets differ in ≤ probe_hamming bits — side A is
    exploded to its bucket plus the hamming-1 neighborhood and equi-joined on
    side B's true bucket, so the join stays a shuffle on bucket keys, never
    an O(n²) cross — then the exact cosine filter runs only on candidates.
    Deterministic given the seed-derived planes; recall < 1 by construction
    (standard LSH dedup semantics). Buckets above max_bucket are dropped
    (skew guard, same rationale as dedup.cap_buckets)."""
    if probe_hamming > 1:
        raise ValueError("probe expansion implemented for hamming <= 1")
    b = rp_lsh_buckets(emb, planes)
    probes = [F.col("bucket")]
    if probe_hamming >= 1:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(len(planes))
        ]
    ok = (
        b.groupBy("bucket").agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("bucket")
    )
    b = b.join(ok, "bucket")
    a = b.select(
        F.col(id_col).alias("id_a"),
        _as_double(F.col(vec_col)).alias("_va"),
        F.explode(F.array(*probes)).alias("bucket"),
    )
    bb = b.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("_vb"), "bucket"
    )
    cand = (
        a.join(bb, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        _norm(F.col("_va")) * _norm(F.col("_vb"))
    )
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )


def lsh_bucketed_topk(
    emb_with_buckets: DataFrame,
    planes: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's bucket (plus multi-probe
    buckets within the given Hamming distance of it)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = (planes @ qv >= 0).astype(np.int64)
    qbucket = int((qbits << np.arange(len(planes))).sum())
    buckets = {qbucket}
    if probe_hamming >= 1:
        for j in range(len(planes)):
            buckets.add(qbucket ^ (1 << j))
    cand = emb_with_buckets.filter(F.col("bucket").isin(sorted(buckets)))
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)
