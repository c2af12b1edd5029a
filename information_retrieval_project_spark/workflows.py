"""The reference's end-to-end driver workflow on the Spark engine.

Traces SURVEY.md §3.1 + §3.3 — everything /root/reference/python/main.py does,
re-expressed on the engine's primitives so a user of the reference can run
the same session shape here:

1. query selection from a corpus row (rnd_query, data_manager.py:165-179:
   the reference hardcodes row 11 and builds the query from the row's text;
   we take tokens from the target doc deterministically),
2. ranking + threshold = target doc's score (ranking data_manager.py:118-130,
   threshold loop main.py:14-16: retry with the next candidate row while the
   target's score < threshold_min),
3. binary-relevance P/R evaluation of the ranking (getPred/plots
   data_manager.py:215-259 → evalmetrics windows),
4. co-occurrence → PPMI → top-k co-occurring terms → query expansion
   (data_manager.py:600-745), re-ranking each expanded query and reporting
   the one that ranks the target best (show_information_queries :741-780).

Returns plain dataclass results; every heavy step is a distributed plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .evalmetrics.metrics import average_precision, pr_curve
from .functions.textnorm import normalize_tokenize
from .index.build import collection_stats, doc_stats, tokenize_tf, with_doc_id
from .lm.expansion import ppmi_triples, query_expansion, top_cooccurring
from .queryexec.bm25 import bm25_topk
from .queryexec.tfidf import tfidf_cosine_topk


@dataclass
class QuerySession:
    """The reference's Query object (query.py:3-24), engine-side."""

    index: int
    query: str
    target_doc_id: int
    threshold: float = 0.0
    ranking: list = field(default_factory=list)
    expanded: list = field(default_factory=list)


def select_query(
    corpus_with_ids: DataFrame, row_index: int, n_terms: int = 4
) -> QuerySession:
    """Build a query from the target row's own content (the reference reads
    the row's Query string, data_manager.py:175-176; our corpus carries no
    query column so the query is the doc's first n distinct tokens).

    Row-at-index-N without a global window (VERDICT r2 #5): the N+1 smallest
    doc_ids via orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    N+1 slim rows to the driver), target = the largest of them, then a keyed
    content lookup. No unpartitioned row_number over the corpus anywhere."""
    ids = (
        corpus_with_ids.select("doc_id")
        .orderBy("doc_id")
        .limit(row_index + 1)
        .collect()
    )
    if len(ids) <= row_index:
        raise IndexError(row_index)
    target_id = ids[-1]["doc_id"]
    row = (
        corpus_with_ids.filter(F.col("doc_id") == target_id)
        .select("doc_id", "content")
        .collect()
    )
    toks = normalize_tokenize(row[0]["content"])
    seen, q = set(), []
    for t in toks:
        if t not in seen:
            seen.add(t)
            q.append(t)
        if len(q) == n_terms:
            break
    return QuerySession(index=row_index, query=" ".join(q), target_doc_id=row[0]["doc_id"])


def rank_and_threshold(
    spark: SparkSession,
    tf_df: DataFrame,
    ds: DataFrame,
    n_docs: int,
    avgdl: float,
    session: QuerySession,
    scorer: str = "bm25",
    k: int = 100,
) -> QuerySession:
    """Rank; threshold = target doc's score (data_manager.py:129-130)."""
    toks = normalize_tokenize(session.query)
    if scorer == "bm25":
        ranked = bm25_topk(spark, tf_df, ds, n_docs, avgdl, toks, k=k)
    else:
        ranked = tfidf_cosine_topk(spark, tf_df, n_docs, toks, k=k)
    rows = ranked.collect()
    session.ranking = [(r["doc_id"], r["score"]) for r in rows]
    session.threshold = next(
        (r["score"] for r in rows if r["doc_id"] == session.target_doc_id), 0.0
    )
    return session


def run_reference_flow(
    spark: SparkSession,
    corpus: DataFrame,
    start_index: int = 11,
    threshold_min: float = 0.2,
    max_retries: int = 5,
    scorer: str = "bm25",
) -> dict:
    """The whole main.py session: retry query selection while the target's
    score is below threshold_min (main.py:14-16), then evaluate and expand."""
    ids = with_doc_id(corpus).cache()
    tf_df = tokenize_tf(ids).cache()
    ds = doc_stats(tf_df).cache()
    cs = collection_stats(ds).collect()[0]
    n_docs, avgdl = cs["n_docs"], cs["avgdl"]

    session = None
    for attempt in range(max_retries):
        s = select_query(ids, start_index + attempt)
        s = rank_and_threshold(spark, tf_df, ds, n_docs, avgdl, s, scorer)
        session = s
        if s.threshold >= threshold_min:
            break

    # evaluation: relevant = docs sharing the target's repo (a deterministic
    # category stand-in for the reference's scraped categories, F14)
    target_repo = ids.filter(F.col("doc_id") == session.target_doc_id).collect()[0]["repo"]
    rel_ids = {r["doc_id"] for r in ids.filter(F.col("repo") == target_repo).select("doc_id").collect()}
    ranked_rows = [
        (0, i + 1, 1 if doc in rel_ids else 0)
        for i, (doc, _) in enumerate(session.ranking)
    ]
    ranked_df = spark.createDataFrame(ranked_rows, "query_id long, rank int, rel int")
    pr = pr_curve(ranked_df)
    ap = average_precision(pr).collect()[0]["avg_precision"]

    # expansion: bigram PPMI over the corpus → insert top co-occurring terms
    w = Window.partitionBy("doc_id").orderBy("pos")
    positions = ids.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("content"), "[^a-z0-9_]+"), lambda x: x != "")
        ).alias("pos", "term"),
    )
    bigrams = (
        positions.withColumn("b", F.lead("term", 1).over(w))
        .filter(F.col("b").isNotNull())
        .groupBy(F.col("term").alias("a"), "b")
        .agg(F.count("*").alias("cnt"))
    )
    q_tokens = normalize_tokenize(session.query)
    trip = ppmi_triples(bigrams)
    top = top_cooccurring(trip, q_tokens, k=3)
    session.expanded = query_expansion(top, q_tokens, cap=20)

    # re-rank each expanded query; report the best target rank achieved
    # (show_information_queries, data_manager.py:741-780)
    best = (None, None)
    for q in session.expanded[: 10]:
        rows = bm25_topk(
            spark, tf_df, ds, n_docs, avgdl, normalize_tokenize(q), k=50
        ).collect()
        rank = next(
            (r["rank"] for r in rows if r["doc_id"] == session.target_doc_id), None
        )
        if rank is not None and (best[1] is None or rank < best[1]):
            best = (q, rank)

    return {
        "query": session.query,
        "target_doc_id": session.target_doc_id,
        "threshold": session.threshold,
        "top10": session.ranking[:10],
        "avg_precision": ap,
        "n_expanded": len(session.expanded),
        "best_expanded_query": best[0],
        "best_expanded_rank": best[1],
    }
