"""Batched multi-query BM25 == per-query results, one plan for the set."""

import pytest

from information_retrieval_project_spark.corpus import generate_corpus
from information_retrieval_project_spark.functions.textnorm import normalize_tokenize
from information_retrieval_project_spark.index.build import (
    collection_stats,
    doc_stats,
    tokenize_tf,
    with_doc_id,
)
from information_retrieval_project_spark.queryexec.bm25 import (
    bm25_topk,
    bm25_topk_batch,
)

QUERIES = {
    0: "def return import",
    1: "parse_config_16 handle_request_100",
    2: "get_cache_44 class",
    3: "zzz_absent_term",
}


def test_batch_equals_per_query(spark):
    corpus = generate_corpus(spark, 400, partitions=4)
    tf = tokenize_tf(with_doc_id(corpus)).cache()
    ds = doc_stats(tf).cache()
    cs = collection_stats(ds).collect()[0]
    tok = {qid: normalize_tokenize(q) for qid, q in QUERIES.items()}
    batch = bm25_topk_batch(spark, tf, ds, cs["n_docs"], cs["avgdl"], tok, k=10)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid in got:
        got[qid].sort()
    for qid, toks in tok.items():
        want = bm25_topk(spark, tf, ds, cs["n_docs"], cs["avgdl"], toks, k=10).collect()
        wl = [(r["rank"], r["doc_id"]) for r in want]
        gl = [(r_[0], r_[1]) for r_ in got.get(qid, [])]
        assert gl == wl, qid
        for (_, _, gs), r in zip(got.get(qid, []), want):
            assert abs(gs - r["score"]) < 1e-9
    assert 3 not in got  # absent-term query scores nothing
