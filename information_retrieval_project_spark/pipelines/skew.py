"""Explicit skew-handling join: key salting.

AQE's skew-join splitting covers sort-merge joins at runtime, but the
north_rule asks for explicit handling, and some shapes (e.g. a shuffle-hash
join against a mid-size dim that can't broadcast) still hot-spot on a head
key. salted_join scatters the fact side across `n_salts` sub-keys and
replicates the dim side once per salt — the classic explicit remedy, exact
by construction.

Cost model: dim side grows n_salts×, fact side doesn't move more rows —
choose n_salts ≈ (rows of hottest key) / (target rows per task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SALTED_JOIN_HOWS = {"inner", "left", "leftouter", "left_outer", "left_semi",
                     "leftsemi", "left_anti", "leftanti"}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `key` with salting. Result is column-identical
    to fact.join(dim, key, how) for fact-preserving join types only: with a
    right/full outer join each unmatched dim row would surface once per salt
    replica (n_salts copies), so those modes are rejected."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALTED_JOIN_HOWS}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full outer would duplicate unmatched dim rows per salt"
        )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    salts = fact.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    salted_dim = dim.crossJoin(F.broadcast(salts))
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
