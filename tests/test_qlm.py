"""Query-likelihood Dirichlet ranking: the decomposed Spark plan must equal
the textbook per-doc formula, and the gate's candidate restriction and OOV
handling must hold."""

import math

import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark.queryexec.qlm import (
    ql_dirichlet_scores,
    ql_dirichlet_topk,
)


def _tiny(spark):
    rows = [
        (1, {"a": 3, "b": 1, "x": 2}),
        (2, {"a": 1, "y": 5}),
        (3, {"b": 2, "z": 1}),
        (4, {"x": 4, "z": 2}),   # no query term
    ]
    tf = spark.createDataFrame(
        [(d, t, n) for d, terms in rows for t, n in terms.items()],
        "doc_id long, term string, tf long",
    )
    ds = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    return rows, tf, ds


def test_ql_dirichlet_matches_direct_formula(spark):
    rows, tf, ds = _tiny(spark)
    mu = 300.0
    query = ["a", "b", "missing"]  # 'missing' is OOV -> dropped both sides
    coll_total = sum(n for _, terms in rows for n in terms.values())
    cf = {"a": 4, "b": 3}
    got = {
        r["doc_id"]: r["score"]
        for r in ql_dirichlet_scores(spark, tf, ds, query, mu=mu).collect()
    }
    # candidate restriction: doc 4 matches no in-collection query term
    assert set(got) == {1, 2, 3}
    for doc_id, terms in rows:
        if doc_id not in got:
            continue
        dl = sum(terms.values())
        want = sum(
            math.log(
                (terms.get(t, 0) + mu * cf[t] / coll_total) / (dl + mu)
            )
            for t in ("a", "b")
        )
        assert got[doc_id] == pytest.approx(want, abs=1e-9)


def test_ql_dirichlet_topk_tiebreak_and_rounding(spark):
    _, tf, ds = _tiny(spark)
    out = ql_dirichlet_topk(spark, tf, ds, ["a", "b"], k=2, round_scores=5)
    rows = out.collect()
    assert [r["rank"] for r in rows] == [1, 2]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(round(s, 5) == s for s in scores)
