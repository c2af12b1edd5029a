"""LM / smoothing / PPMI / expansion parity tests (SURVEY.md §2.10).

Oracle: tiny hand-checkable corpora + a straight-line python reimplementation
of the frozen semantics (sentinels, skip window, Laplace, the λ+λ quirk)."""

import math

import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark.lm.expansion import (
    ppmi_triples,
    query_expansion,
    top_cooccurring,
)
from information_retrieval_project_spark.lm.language_models import (
    collection_lm,
    jelinek_mercer_scores,
    laplace_scores,
    param_grid_search,
    perplexity,
    skipgram_pairs,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "a b c a b"),
        (2, "b c d"),
        (3, "a a a b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def py_skipgrams(text, s):
    toks = ["#S", *text.split(), "#E"]
    out = {}
    for i, a in enumerate(toks):
        for j in range(i + 1, min(i + s, len(toks) - 1) + 1):
            out[(a, toks[j])] = out.get((a, toks[j]), 0) + 1
    return out


def test_skipgram_counts_match_python(spark, tiny):
    got = {
        (r["doc_id"], r["a"], r["b"]): r["cnt"]
        for r in skipgram_pairs(tiny, s=2).collect()
    }
    for doc_id, text in [(1, "a b c a b"), (2, "b c d"), (3, "a a a b")]:
        want = py_skipgrams(text, 2)
        mine = {(a, b): c for (d, a, b), c in got.items() if d == doc_id}
        assert mine == want, doc_id


def test_laplace_matches_hand_calc(spark, tiny):
    sg = skipgram_pairs(tiny, s=1)  # plain bigrams
    # vocab = distinct tokens incl sentinels across corpus
    vocab = {"#S", "#E", "a", "b", "c", "d"}
    got = {
        r["doc_id"]: r["log_score"]
        for r in laplace_scores(spark, sg, len(vocab), ["a", "b"]).collect()
    }
    # doc 1: bigrams of (#S a b #E): (#S,a),(a,b),(b,#E)
    # query bigrams: (#S,a),(a,b),(b,#E)
    bg1 = py_skipgrams("a b c a b", 1)
    marg = {}
    for (a, _), c in bg1.items():
        marg[a] = marg.get(a, 0) + c
    want = 0.0
    for qa, qb in [("#S", "a"), ("a", "b"), ("b", "#E")]:
        want += math.log((1 + bg1.get((qa, qb), 0)) / (marg.get(qa, 0) + len(vocab)))
    assert abs(got[1] - want) < 1e-9


def test_jelinek_mercer_quirk_and_perplexity(spark, tiny):
    sg = skipgram_pairs(tiny, s=1)
    jm = jelinek_mercer_scores(spark, sg, ["a", "b"], lambdas=[0.5])
    rows = {r["doc_id"]: r["log_score"] for r in jm.collect()}
    # doc 3 "a a a b": p_doc for (#S,a)=1/1,(a,b)=1/3,(b,#E)=1/1
    cl_rows = {(r["a"], r["b"]): (r["ccnt"], r["ccnt_a"]) for r in collection_lm(sg).collect()}
    want = 0.0
    bg3 = py_skipgrams("a a a b", 1)
    marg3 = {}
    for (a, _), c in bg3.items():
        marg3[a] = marg3.get(a, 0) + c
    for qa, qb in [("#S", "a"), ("a", "b"), ("b", "#E")]:
        p_doc = bg3.get((qa, qb), 0) / marg3.get(qa, 1)
        ccnt, ccnt_a = cl_rows.get((qa, qb), (0, 1))
        p_coll = ccnt / ccnt_a
        p = 0.5 * p_doc + 0.5 * p_coll  # the λ+λ quirk (both coeffs = λ)
        want += math.log(p)
    assert abs(rows[3] - want) < 1e-9
    pp = {r["doc_id"]: r["perplexity"] for r in perplexity(jm, 3).collect()}
    assert abs(pp[3] - math.exp(-rows[3] / 3)) < 1e-9


def test_param_grid_search_returns_one_best(spark, tiny):
    best = param_grid_search(spark, tiny, ["a", "b"], target_doc_id=1, s_values=[1, 2]).collect()
    assert len(best) == 1
    assert best[0]["s"] in (1, 2) and 0.1 <= best[0]["lamb"] <= 0.9


def test_ppmi_and_expansion(spark, tiny):
    sg = skipgram_pairs(tiny, s=1).groupBy("a", "b").agg(F.sum("cnt").alias("cnt"))
    trip = ppmi_triples(sg)
    vals = {(r["a"], r["b"]): r["ppmi"] for r in trip.collect()}
    assert all(v >= 0 for v in vals.values())  # positive part
    top = top_cooccurring(trip, ["a"], k=2)
    rows = top.collect()
    assert all(r["a"] == "a" and r["b"] != "a" for r in rows)
    assert len(rows) <= 2
    expanded = query_expansion(top, ["a", "b"], cap=10)
    assert expanded[0] == "a b"  # original always first
    assert len(expanded) <= 10
    assert any(len(q.split()) == 3 for q in expanded[1:])  # insertion happened
