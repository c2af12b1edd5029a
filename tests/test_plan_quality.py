"""Physical-plan regression tests: the optimizations SURVEY.md §4.2 relies on
must actually appear in the plans (pushdown, pruning, broadcast joins,
TakeOrderedAndProject) — catching a regression where Catalyst silently falls
back to a scan-everything / shuffle-everything plan."""

import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark import entry_queries as EQ


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_to_parquet(spark, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )
    p = plan(d)
    assert "PushedFilters" in p and "lang" in p.split("PushedFilters", 1)[1][:200]
    # column pruning: text must NOT be read
    read_schema = p.split("ReadSchema", 1)[1][:200]
    assert "text" not in read_schema


def test_bm25_uses_broadcast_and_takeordered(spark, sf_dir):
    # q_bm25_topk returns a checkpointed result (cache-lifecycle hygiene,
    # VERDICT r4 #4), so its final plan is a checkpoint scan; assert the
    # SCORING plan via the shared weighted scorer (weights 1.0 == plain
    # BM25, identical plan shape, no checkpoint)
    tf = EQ._tf(spark, sf_dir)
    w1 = spark.createDataFrame(
        [(t, 1.0) for t in sorted(set(EQ.BM25_QUERY))],
        "term string, w double",
    )
    scored = EQ._bm25_scores_weighted(tf, w1)
    p = plan(
        scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    )
    assert "BroadcastHashJoin" in p          # query terms joined broadcast
    assert "TakeOrderedAndProject" in p      # top-k, not global sort


def test_semi_and_anti_join_strategies(spark, sf_dir):
    ps = plan(EQ.q_semi_join_customers(spark, sf_dir))
    pa = plan(EQ.q_anti_join_customers(spark, sf_dir))
    assert "LeftSemi" in ps
    assert "LeftAnti" in pa


def test_aggregate_is_hash_partial_final(spark, sf_dir):
    p = plan(EQ.q_pricing_summary(spark, sf_dir))
    assert p.count("HashAggregate") >= 2     # partial + final
    assert "SortAggregate" not in p


def test_native_path_vectorized_scan_and_hash_agg(spark, sf_dir):
    # AQE hides WholeStageCodegen ids pre-execution; assert the vectorized
    # reader + hash aggregation instead (the codegen-eligible shape)
    p = plan(EQ.q_token_stats(spark, sf_dir))
    assert "Batched: true" in p
    assert "HashAggregate" in p and "SortAggregate" not in p


def test_pr_curve_limits_before_ranking(spark, sf_dir):
    """Regression for the round-1 hazard: rank-then-filter ran a global
    row_number over the whole table on one partition. The fixed plan must
    take the top-50 via TakeOrderedAndProject (per-partition heaps) BEFORE
    any Window executes."""
    p = plan(EQ.q_pr_curve(spark, sf_dir))
    # round-1 plan had NO TakeOrderedAndProject: a bare global Window ranked
    # every row, then a filter kept 50. Its presence is the fix — the windows
    # that remain run over the 50 limited rows (they sit above it in the tree)
    assert "TakeOrderedAndProject" in p
    # and the scan reads only the needed columns (no text)
    rs = p.split("ReadSchema", 1)[1][:200]
    assert "text" not in rs


def test_emb_near_dup_has_no_cartesian(spark, sf_dir):
    """The all-pairs near-dup candidate join must stay an equi-join on the
    bucket key — never a CartesianProduct / BroadcastNestedLoopJoin."""
    p = plan(EQ.q_emb_near_dup_pairs(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_capped_band_join_stays_hash_equi(spark, sf_dir):
    """The bucket-size guard must not change the join strategy of the
    band self-join (equi hash/SMJ, no nested loop)."""
    p = plan(EQ.q_minhash_band_pairs(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_batch_bm25_window_partitioned_by_query(spark, sf_dir):
    """The query-set rank window must be PARTITIONED by query_id (parallel
    across queries) and the (query_id, term) relation broadcast — the whole
    point of the one-plan batch form. Asserted on the library function's
    plan directly: the gate wrapper localCheckpoints its k-row result (to
    unpersist tf without a lingering cache), which replaces the visible
    plan with a checkpoint scan."""
    from pyspark.sql import functions as F

    from information_retrieval_project_spark.queryexec.bm25 import (
        bm25_topk_batch,
    )

    tf = EQ._tf(spark, sf_dir)
    ds = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    stats = ds.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    out = bm25_topk_batch(
        spark, tf, ds, stats["n_docs"], stats["avgdl"], EQ.BATCH_QUERIES, k=5
    )
    p = plan(out)
    assert "BroadcastHashJoin" in p
    # a Window over partitionBy(query_id) plans an Exchange hashpartitioning
    # on query_id; an unpartitioned window would plan SinglePartition instead
    assert "hashpartitioning(query_id" in p
    assert "TakeOrderedAndProject" in p or "Window" in p


def test_phrase_match_joins_stay_equi(spark, sf_dir):
    """Both phrase paths (corpus-side positional self-join and the
    positional-index serve) must stay equi-joins on (doc_id, pos) — never a
    nested loop — and the corpus path must prune the text column's siblings
    at the scan."""
    for q in (EQ.q_phrase_match_docs, EQ.q_phrase_match_indexed):
        p = plan(q(spark, sf_dir))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_build_positions_is_shuffle_free(spark, sf_dir):
    """The positional-index build must stay map-side complete: every
    (term, doc_id) group lives inside one content row, so the plan must
    contain NO Exchange (a groupBy formulation would shuffle one row per
    token — the largest possible shuffle at 100 TB)."""
    from information_retrieval_project_spark.index.positions import (
        build_positions,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("text").alias("content")
    )
    assert "Exchange" not in plan(build_positions(docs))


def test_facet_counts_plan_shape(spark, sf_dir):
    """Facet counts must broadcast both small sides (query terms, match
    set) and explode facet dimensions through ONE generator — never a
    cartesian join or one aggregation job per facet."""
    p = plan(EQ.q_facet_counts(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
    assert "Generate" in p  # the stack() of all facet dims, one pass
