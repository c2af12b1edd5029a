"""P/R curve + AP vs hand-computed fixture (FIXTURES.md §5 pr_curve_tiny;
reference semantics data_manager.py:231-259)."""

import pytest

from information_retrieval_project_spark.evalmetrics.metrics import (
    average_precision,
    pr_curve,
)

# 1 query, 8 ranked docs, labels: 1,0,1,1,0,0,1,0 → total_rel=4
LABELS = [1, 0, 1, 1, 0, 0, 1, 0]
PRECISION = [1 / 1, 1 / 2, 2 / 3, 3 / 4, 3 / 5, 3 / 6, 4 / 7, 4 / 8]
RECALL = [1 / 4, 1 / 4, 2 / 4, 3 / 4, 3 / 4, 3 / 4, 4 / 4, 4 / 4]
# interpolated: max precision at this rank or later
INTERP = [max(PRECISION[i:]) for i in range(8)]
# AP = sum of dR * P
D_R = [RECALL[0]] + [RECALL[i] - RECALL[i - 1] for i in range(1, 8)]
AP = sum(d * p for d, p in zip(D_R, PRECISION))


@pytest.fixture(scope="module")
def ranked(spark):
    rows = [(7, r + 1, rel) for r, rel in enumerate(LABELS)]
    return spark.createDataFrame(rows, "query_id long, rank int, rel int")


def test_pr_curve_matches_hand_calc(ranked):
    out = {r["rank"]: r for r in pr_curve(ranked).collect()}
    for i in range(8):
        r = out[i + 1]
        assert r["precision"] == pytest.approx(PRECISION[i], abs=1e-12)
        assert r["recall"] == pytest.approx(RECALL[i], abs=1e-12)
        assert r["interp_precision"] == pytest.approx(INTERP[i], abs=1e-12)


def test_average_precision(ranked):
    ap = average_precision(pr_curve(ranked)).collect()[0]
    assert ap["query_id"] == 7
    assert ap["avg_precision"] == pytest.approx(AP, abs=1e-12)


def test_multi_query_partitioning(spark):
    rows = [(1, 1, 1), (1, 2, 0), (2, 1, 0), (2, 2, 1)]
    ranked = spark.createDataFrame(rows, "query_id long, rank int, rel int")
    ap = {r["query_id"]: r["avg_precision"] for r in average_precision(pr_curve(ranked)).collect()}
    assert ap[1] == pytest.approx(1.0)
    assert ap[2] == pytest.approx(0.5)
