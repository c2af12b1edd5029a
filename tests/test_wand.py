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


def test_wand_actually_prunes_on_skewed_postings():
    """On a skewed corpus (one selective high-idf term + one huge common
    term) WAND must skip scoring most candidates — the whole point of the
    pruning. Exactness is asserted alongside."""
    rng = np.random.default_rng(99)
    n_docs = 50_000
    doc_ids = np.arange(n_docs, dtype=np.int64)
    doc_len = {int(d): int(rng.integers(50, 200)) for d in doc_ids}
    avgdl = float(np.mean(list(doc_len.values())))
    common = (doc_ids, rng.integers(1, 3, size=n_docs).astype(np.int64))
    rare_ids = np.sort(rng.choice(doc_ids, size=200, replace=False))
    rare = (rare_ids.astype(np.int64), rng.integers(5, 20, size=200).astype(np.int64))
    postings = {"common": common, "rare": rare}
    stats = {}
    got = wand_topk(postings, doc_len, n_docs, avgdl, k=10, stats=stats)
    want = exhaustive_topk(postings, doc_len, n_docs, avgdl, 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    # pivot-based pruning must skip the vast majority of candidates
    # (block-max refinement only fires with 3+ near-threshold terms, so
    # n_block_skips may legitimately be 0 here)
    assert stats["n_scored"] < stats["n_candidates"] * 0.1, stats
