"""Ranking evaluation: precision/recall curves, interpolated precision,
average precision — window-function form of the reference's getPred /
interpolation loops (data_manager.py:231-259; SURVEY.md L9/W3/W4/A9).

Input contract: a ranked DataFrame with (query_id, rank, rel) where rel is
the binary relevance label (the reference derives it from category
intersection, getCatCorrispondece data_manager.py:215-229 → SURVEY.md F14).
All metrics are per-query windows, so one plan evaluates every query at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pr_curve(ranked: DataFrame) -> DataFrame:
    """Add precision / recall / interpolated precision columns.

    interp_precision(r) = max_{r' >= r} precision(r') — the running max from
    the bottom of the ranking (reference data_manager.py:237-239), expressed
    as a max window over the following frame."""
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    w_all = Window.partitionBy("query_id")
    return (
        ranked.withColumn("cum_rel", F.sum("rel").over(w_cum))
        .withColumn("total_rel", F.sum("rel").over(w_all))
        .withColumn("precision", F.col("cum_rel") / F.col("rank"))
        .withColumn("recall", F.col("cum_rel") / F.col("total_rel"))
        .withColumn("interp_precision", F.max("precision").over(w_fwd))
        .drop("cum_rel", "total_rel")
    )


def average_precision(pr: DataFrame) -> DataFrame:
    """AP per query = Σ ΔR · P (reference (delta*reversed precision).sum(),
    data_manager.py:256-258): lag window for ΔR + sum aggregate."""
    w = Window.partitionBy("query_id").orderBy("rank")
    return (
        pr.withColumn(
            "d_recall", F.col("recall") - F.lag("recall", 1, 0.0).over(w)
        )
        .groupBy("query_id")
        .agg(F.sum(F.col("d_recall") * F.col("precision")).alias("avg_precision"))
    )
