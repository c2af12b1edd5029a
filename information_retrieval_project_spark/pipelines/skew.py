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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `key` with salting. Result is column-identical
    to fact.join(dim, key, how)."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    salts = fact.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    salted_dim = dim.crossJoin(F.broadcast(salts))
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
