"""End-to-end reference-workflow parity (main.py session shape):
select → rank → threshold retry → P/R eval → PPMI expansion → re-rank."""

from information_retrieval_project_spark.corpus import generate_corpus
from information_retrieval_project_spark.workflows import run_reference_flow


def test_full_reference_flow(spark):
    corpus = generate_corpus(spark, 300, partitions=3)
    out = run_reference_flow(spark, corpus, start_index=11, threshold_min=0.0)
    # the query was built from the target doc's own tokens → the target must
    # score > 0 and appear in the ranking
    assert out["threshold"] > 0.0
    assert any(d == out["target_doc_id"] for d, _ in out["top10"])
    assert 0.0 <= out["avg_precision"] <= 1.0
    assert out["n_expanded"] >= 1
    # expansion keeps the original query first, so a rank is always found
    assert out["best_expanded_rank"] is not None
    assert out["best_expanded_rank"] >= 1


def test_threshold_retry_loop(spark):
    corpus = generate_corpus(spark, 120, partitions=2)
    # absurd threshold forces the retry loop through max_retries candidates
    out = run_reference_flow(
        spark, corpus, start_index=3, threshold_min=1e9, max_retries=3
    )
    assert out["threshold"] < 1e9  # loop terminated after retries, no crash
    assert out["query"]
