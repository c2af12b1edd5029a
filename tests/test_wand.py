"""WAND kernel == exhaustive scoring (property test, SURVEY.md §5.2.3)."""

import numpy as np
import pytest

from information_retrieval_project_spark.queryexec.wand import (
    bm25_idf,
    bm25_tf_component,
    wand_topk,
)


def exhaustive_topk(postings, doc_len, n_docs, avgdl, k):
    scores = {}
    for t in sorted(postings):
        d, tf = postings[t]
        if d.size == 0:
            continue
        idf = bm25_idf(n_docs, d.size)
        for doc, f in zip(d.tolist(), tf.tolist()):
            scores[doc] = scores.get(doc, 0.0) + idf * bm25_tf_component(
                float(f), float(doc_len[doc]), avgdl
            )
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


@pytest.mark.parametrize("seed", range(20))
def test_wand_equals_exhaustive(seed):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(50, 2000))
    doc_ids = np.arange(n_docs, dtype=np.int64) * 7 - 3000  # incl. negatives
    doc_len = {int(d): int(rng.integers(10, 500)) for d in doc_ids}
    avgdl = float(np.mean(list(doc_len.values())))
    n_terms = int(rng.integers(1, 6))
    postings = {}
    for t in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        sel = np.sort(rng.choice(doc_ids, size=df, replace=False))
        tfs = rng.integers(1, 20, size=df).astype(np.int64)
        postings[f"t{t}"] = (sel.astype(np.int64), tfs)
    for k in (1, 10, 100):
        got = wand_topk(postings, doc_len, n_docs, avgdl, k)
        want = exhaustive_topk(postings, doc_len, n_docs, avgdl, k)
        assert [d for d, _ in got] == [d for d, _ in want], (seed, k)
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-9


def test_wand_empty_and_missing_terms():
    assert wand_topk({}, {}, 10, 5.0, 5) == []
    postings = {"t": (np.array([], dtype=np.int64), np.array([], dtype=np.int64))}
    assert wand_topk(postings, {}, 10, 5.0, 5) == []
