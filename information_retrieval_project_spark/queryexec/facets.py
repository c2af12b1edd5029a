"""Faceted search: facet counts over a match set and facet-filtered
(drill-down) ranking.

The standard fulltext-engine result-page shape (Solr facets / Elasticsearch
terms aggregations; the reference has no facet surface — its result page is
a bare ranked list, data_manager.py:126-130): alongside the ranked hits,
count the matching documents per metadata value so the UI can offer
drill-down filters, then re-rank within a chosen facet value.

Scale shape: ONE stack + ONE hash aggregation for ALL facet dimensions —
not one job per facet. `stack` explodes each matched doc into one row per
facet dimension map-side (no shuffle amplification beyond the |dims| factor
on the slim (facet, value) pairs), then a single partial+final count
aggregate. The match set arrives as doc_ids only (left-semi pruned), so the
metadata table is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def matched_docs(tf_df: DataFrame, terms: DataFrame) -> DataFrame:
    """Distinct doc_ids containing >=1 query term — the facet match set.
    Broadcast the tiny term list; distinct is a partial+final aggregate on
    the slim doc_id column."""
    return (
        tf_df.join(F.broadcast(terms), "term").select("doc_id").distinct()
    )


def facet_counts(
    match: DataFrame, docs_meta: DataFrame, facet_cols: list[str]
) -> DataFrame:
    """(facet, value, n_docs) for every facet dimension in one aggregation.

    match: (doc_id) relation (e.g. matched_docs output). docs_meta: the
    metadata table carrying doc_id + the facet columns. Null facet values
    count under value NULL (engines bucket missing as its own entry)."""
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    missing = [c for c in facet_cols if c not in docs_meta.columns]
    if missing:
        raise ValueError(f"facet columns not in docs_meta: {missing}")
    joined = docs_meta.join(match, "doc_id", "left_semi")
    # identifiers are backtick-quoted (ADVICE r4: a name with spaces or
    # reserved characters would break the hand-built stack() parse); the
    # label string escapes single quotes so it always round-trips
    def _ident(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    def _label(c: str) -> str:
        # backslashes first (Spark SQL string literals are escape-aware):
        # a name ending in a bare backslash would otherwise swallow the
        # closing quote
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_expr = "stack({n}, {args}) as (facet, value)".format(
        n=len(facet_cols),
        args=", ".join(
            f"{_label(c)}, cast({_ident(c)} as string)" for c in facet_cols
        ),
    )
    return (
        joined.selectExpr(stack_expr)
        .groupBy("facet", "value")
        .agg(F.count("*").alias("n_docs"))
    )
