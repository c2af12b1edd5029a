"""PPMI co-occurrence + query expansion (reference data_manager.py:600-745).

PPMI stays in sparse triple form (never the reference's dense V×V frame,
data_manager.py:624-636); top-10 co-occurring terms per query token is a
row_number window (SURVEY.md W6); expanded query strings are built with
array insert + array_join (F9/F10) driver-side over the tiny query set, with
the ≤100 cap of data_manager.py:745.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ppmi_triples(cooc: DataFrame) -> DataFrame:
    """(a, b, cnt) → (a, b, ppmi): max(log2((c_ab·T)/(c_a·c_b)), 0)
    (reference pmi_matrix, data_manager.py:639-655) on sparse triples."""
    tot = cooc.agg(F.sum("cnt").alias("t"))
    ca = cooc.groupBy("a").agg(F.sum("cnt").alias("cnt_a"))
    cb = cooc.groupBy("b").agg(F.sum("cnt").alias("cnt_b"))
    return (
        cooc.join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.greatest(
                F.log2((F.col("cnt") * F.col("t")) / (F.col("cnt_a") * F.col("cnt_b"))),
                F.lit(0.0),
            ).alias("ppmi"),
        )
    )


def top_cooccurring(ppmi: DataFrame, query_tokens: list[str], k: int = 10) -> DataFrame:
    """Top-k co-occurring terms per query token by PPMI, deterministic
    tie-break (reference top-10 loop, data_manager.py:686-699 → W6 window).
    Excludes the query's own tokens (the reference's membership guard)."""
    qset = sorted(set(query_tokens))
    w = Window.partitionBy("a").orderBy(F.desc("ppmi"), F.asc("b"))
    return (
        ppmi.filter(F.col("a").isin(qset) & ~F.col("b").isin(qset))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("a", "b", "ppmi", "rk")
    )


def query_expansion(
    top_df: DataFrame, query_tokens: list[str], cap: int = 100
) -> list[str]:
    """Expanded query strings: insert each top co-occurring word after its
    query token, cartesian across tokens, capped (reference query_expansion,
    data_manager.py:683-739; cap at :745). The expansion space is tiny
    (≤ k^|q|), so composition happens driver-side over collected top-k rows;
    the heavy work (PPMI + window) stays distributed."""
    tops: dict[str, list[str]] = {}
    for r in top_df.orderBy("a", "rk").collect():
        tops.setdefault(r["a"], []).append(r["b"])
    expanded: list[list[str]] = [list(query_tokens)]
    for i, tok in enumerate(query_tokens):
        if tok not in tops:
            continue
        new: list[list[str]] = []
        for base in expanded:
            for w in tops[tok]:
                # positions shift as earlier insertions happen; insert right
                # after the first occurrence of tok (reference :694-697)
                j = base.index(tok)
                new.append(base[: j + 1] + [w] + base[j + 1 :])
                if len(new) + len(expanded) >= cap:
                    break
            if len(new) + len(expanded) >= cap:
                break
        expanded.extend(new)
        if len(expanded) >= cap:
            break
    return [" ".join(q) for q in expanded[:cap]]
