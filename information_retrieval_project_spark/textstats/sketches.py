"""KMV (k-minimum-values) distinct-count sketch.

The classic mergeable distinct estimator (Bar-Yossef et al. 2002): hash every
element to (0,1); keep the k smallest hashes; estimate |D| ≈ (k−1)/h_(k).
Chosen over HLL here because its state (the k smallest hashes) is an exact,
engine-independent relation — a DuckDB oracle can verify the sketch itself,
not just the estimate; Spark's approx_count_distinct HLL state is not
portable.

Distributed shape: per-partition top-k via TakeOrderedAndProject (orderBy +
limit on the hash), which Spark executes as per-partition heaps + a k-row
final merge — the same pattern as the BM25 top-k path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unit_hash(col: Column) -> Column:
    """Deterministic hash of a string into (0,1): first 12 hex chars of md5
    as an integer over 2^48 — identical math is expressible in ANSI SQL."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("double") / float(1 << 48)


def kmv_state(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The sketch state: the k smallest unit-hashes of DISTINCT values,
    with their rank. Mergeable: union states → re-take k smallest."""
    from pyspark.sql import Window

    # nulls are filtered BEFORE hashing — distinct-count semantics ignore
    # null (SQL count(DISTINCT ..)), and a null h would otherwise land in
    # its own window partition (null*0 = null) and duplicate ranks
    hashes = (
        df.select(F.col(col).alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .select(_unit_hash(F.col("v")).alias("h"))
    )
    # rank window runs over the ≤k rows surviving the limit; the constant
    # nullable partition key (h*0) marks single-partition as intended and
    # silences the WindowExec warning (pr_curve idiom). h is conv() hex
    # arithmetic over a non-null input — finite by construction, so the
    # NaN*0 trap (ADVICE r3) cannot fire here.
    w = Window.partitionBy(F.col("h") * 0).orderBy("h")
    return (
        hashes.orderBy("h")
        .limit(k)
        .withColumn("rk", F.row_number().over(w))
        .select("rk", "h")
    )


def kmv_estimate(state: DataFrame, k: int = 64) -> float:
    """(k−1)/h_(k); if fewer than k distinct values exist the sketch is the
    full set and the exact count is returned."""
    rows = state.collect()
    if len(rows) < k:
        return float(len(rows))
    hk = max(r["h"] for r in rows)
    return (k - 1) / hk
