"""The ONE term-bucket partitioning scheme shared by every stored relation.

Both the main compressed index (index/build.write_index → queryexec/wand
pruning) and the positional index (index/positions) partition storage by
`pmod(xxhash64(term), m)` and prune query-time scans by recomputing the
bucket for the query terms. The hash, the modulus handling, and the prune
condition live HERE so the write and read sides can never drift apart —
a mismatched modulus silently drops valid postings (ADVICE r1)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def term_bucket_expr(term_buckets: int) -> Column:
    """Stable bucket of the `term` column under modulus term_buckets."""
    return F.pmod(F.xxhash64("term"), F.lit(int(term_buckets)))


def bucket_values_for_terms(spark, terms: list[str], term_buckets: int) -> list[int]:
    """Bucket values the given query terms hash to — computed with the SAME
    expression the writer used (never reimplement the hash driver-side)."""
    rows = (
        spark.createDataFrame([(t,) for t in sorted(set(terms))], "term string")
        .select(term_bucket_expr(term_buckets).alias("tb"))
        .distinct()
        .collect()
    )
    return [r["tb"] for r in rows]


def prune_terms(
    df: DataFrame, terms: list[str], term_buckets: int | None = None
) -> DataFrame:
    """Rows for `terms` only; when df carries a term_bucket partition column
    and the stored modulus is supplied, the filter includes the bucket
    values so the scan prunes whole partitions."""
    uniq = sorted(set(terms))
    cond = F.col("term").isin(uniq)
    if "term_bucket" in df.columns and term_buckets:
        cond = cond & F.col("term_bucket").isin(
            bucket_values_for_terms(df.sparkSession, uniq, term_buckets)
        )
    return df.filter(cond)
