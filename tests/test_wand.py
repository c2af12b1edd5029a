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


def test_blockmax_pruned_decode_equals_exhaustive_and_prunes(spark):
    """The DEFAULT distributed serving path (VERDICT r4 #2): two-phase
    block-max pruning in bm25_topk_compressed must return rank- and
    score-identical results to the exhaustive decode, and on a corpus with
    a stopword-grade term it must measurably shrink the decoded candidate
    set (the rows that would otherwise shuffle)."""
    from pyspark.sql import functions as F

    from information_retrieval_project_spark.index.build import (
        BuildConfig,
        build_postings,
        collection_stats,
        doc_stats,
        tokenize_tf,
        with_doc_id,
    )
    from information_retrieval_project_spark.corpus import generate_corpus
    from information_retrieval_project_spark.index.bucketing import (
        prune_terms,
    )
    from information_retrieval_project_spark.queryexec.wand import (
        blockmax_prune_info,
        bm25_topk_compressed,
        decode_candidates,
    )

    ids = with_doc_id(generate_corpus(spark, 2000, partitions=4))
    tf = tokenize_tf(ids).cache()
    ds = doc_stats(tf).cache()
    cs = collection_stats(ds).collect()[0]
    # segmented salted build → multiple rows per hot term, the layout the
    # pruning must stay exact on (df = term-total, blocks disjoint per term)
    idx = build_postings(
        tf,
        BuildConfig(
            hot_df_threshold=100,
            docs_per_salt=200,
            hot_detection_sample=1.0,
            segment_hot_terms=True,
        ),
    ).cache()
    query = ["def", "return", "buffer"]  # hot + hot + selective

    for k in (5, 10):
        pruned = bm25_topk_compressed(
            spark, idx, ds, cs["n_docs"], cs["avgdl"], query, k=k,
            blockmax=True,
        ).collect()
        exhaustive = bm25_topk_compressed(
            spark, idx, ds, cs["n_docs"], cs["avgdl"], query, k=k,
            blockmax=False,
        ).collect()
        assert [r["doc_id"] for r in pruned] == [
            r["doc_id"] for r in exhaustive
        ]
        for a, b in zip(pruned, exhaustive):
            assert a["rank"] == b["rank"]
            assert abs(a["score"] - b["score"]) < 1e-9

    # rounded-rank variant (the gate's mode): identity on rounded values
    pr = bm25_topk_compressed(
        spark, idx, ds, cs["n_docs"], cs["avgdl"], query, k=10,
        round_scores=5, blockmax=True,
    ).collect()
    ex = bm25_topk_compressed(
        spark, idx, ds, cs["n_docs"], cs["avgdl"], query, k=10,
        round_scores=5, blockmax=False,
    ).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in pr] == [
        (r["rank"], r["doc_id"], r["score"]) for r in ex
    ]

    tf.unpersist(); ds.unpersist(); idx.unpersist()


def test_blockmax_candidate_generation_prunes_stopword_postings(spark):
    """The measured decoded-row reduction (VERDICT r4 #2 'Done' bar): on a
    skewed corpus — a selective high-idf term + a stopword-grade term — the
    candidate-generation pass must drop the stopword's blocks (pigeonhole
    rule: their upper bound can't supply 1/|Q| of the certified k-th
    score), so the rows that reach the shuffle collapse from every posting
    of every query term to roughly the selective term's postings. Exactness
    vs the exhaustive decode is asserted alongside."""
    import random

    from pyspark.sql import functions as F

    from information_retrieval_project_spark.index.build import (
        BuildConfig,
        build_postings,
        collection_stats,
        doc_stats,
        tokenize_tf,
    )
    from information_retrieval_project_spark.index.bucketing import (
        prune_terms,
    )
    from information_retrieval_project_spark.queryexec.wand import (
        blockmax_prune_info,
        bm25_topk_compressed,
        decode_candidates,
    )

    rng = random.Random(7)
    rows = []
    for i in range(3000):
        words = ["common"] * rng.randint(1, 2) + [
            f"filler{rng.randint(0, 200)}" for _ in range(rng.randint(5, 30))
        ]
        if i % 8 == 0:  # 375 docs carry the selective term, tf 2..8
            words += ["rare"] * rng.randint(2, 8)
        rng.shuffle(words)
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    tf = tokenize_tf(docs).cache()
    ds = doc_stats(tf).cache()
    cs = collection_stats(ds).collect()[0]
    idx = build_postings(
        tf,
        BuildConfig(
            hot_df_threshold=500, docs_per_salt=800, hot_detection_sample=1.0
        ),
    ).cache()
    query = ["rare", "common"]

    pruned = bm25_topk_compressed(
        spark, idx, ds, cs["n_docs"], cs["avgdl"], query, k=10, blockmax=True
    ).collect()
    exhaustive = bm25_topk_compressed(
        spark, idx, ds, cs["n_docs"], cs["avgdl"], query, k=10, blockmax=False
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in pruned] == [
        (r["rank"], r["doc_id"]) for r in exhaustive
    ]
    for a, b in zip(pruned, exhaustive):
        assert abs(a["score"] - b["score"]) < 1e-9

    # the measured reduction: surviving blocks vs full posting volume
    irows = prune_terms(idx, query, None)
    info = blockmax_prune_info(irows, ds, cs["n_docs"], cs["avgdl"], 10)
    assert info is not None
    n_all = decode_candidates(irows).count()
    n_kept = decode_candidates(irows, prune=info, n_docs=cs["n_docs"]).count()
    # 'common' df=3000, 'rare' df~375: dropping common's blocks leaves
    # <= rare's postings + a handful of surviving common blocks
    assert n_kept < 0.5 * n_all, (n_kept, n_all)
    tf.unpersist(); ds.unpersist(); idx.unpersist()


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_blockmax_pruned_equals_exhaustive_randomized(spark, seed):
    """Adversarial property coverage for the exactness claim: random
    corpora (negative doc_ids, skewed dfs, random tf ranges, segmentation
    on and off, random k incl. k larger than some posting lists) must give
    IDENTICAL top-k rows and scores with and without block-max pruning —
    both unrounded and in the gate's rounded-rank mode."""
    import random

    from pyspark.sql import functions as F

    from information_retrieval_project_spark.index.build import (
        BuildConfig,
        build_postings,
        collection_stats,
        doc_stats,
    )
    from information_retrieval_project_spark.queryexec.wand import (
        bm25_topk_compressed,
    )

    rng = random.Random(seed)
    n_docs = rng.randint(300, 1500)
    n_terms = rng.randint(5, 25)
    terms = [f"t{i}" for i in range(n_terms)]
    # skewed dfs: term i appears in docs with prob ~ 1/(i+1)
    rows = []
    for d in range(n_docs):
        doc_id = d * 13 - 7000  # includes negatives, sparse ids
        for i, t in enumerate(terms):
            if rng.random() < 1.0 / (i + 1):
                rows.append((doc_id, t, rng.randint(1, 30)))
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    ds = doc_stats(tf).cache()
    cs = collection_stats(ds).collect()[0]
    segmented = seed % 2 == 1
    idx = build_postings(
        tf,
        BuildConfig(
            hot_df_threshold=rng.randint(50, 400),
            docs_per_salt=rng.randint(100, 500),
            hot_detection_sample=1.0,
            segment_hot_terms=segmented,
        ),
    ).cache()
    query = rng.sample(terms, rng.randint(1, min(5, n_terms)))
    for k in (1, rng.randint(2, 40)):
        for rs in (None, 5):
            pruned = bm25_topk_compressed(
                spark, idx, ds, cs["n_docs"], cs["avgdl"], query,
                k=k, round_scores=rs, blockmax=True,
            ).collect()
            exhaustive = bm25_topk_compressed(
                spark, idx, ds, cs["n_docs"], cs["avgdl"], query,
                k=k, round_scores=rs, blockmax=False,
            ).collect()
            assert [(r["rank"], r["doc_id"]) for r in pruned] == [
                (r["rank"], r["doc_id"]) for r in exhaustive
            ], (seed, k, rs, segmented)
            for a, b in zip(pruned, exhaustive):
                assert abs(a["score"] - b["score"]) < 1e-9
    ds.unpersist(); idx.unpersist()


def test_fused_blockmax_construction_runs_no_driver_actions(spark, monkeypatch):
    """The r6 fused default path (VERDICT r5 #1): CONSTRUCTING the served
    top-k DataFrame must run zero driver actions — phase 1 lives inside the
    final query as a broadcast subtree (the r5 path collected twice before
    the serve job even started)."""
    from pyspark.sql import DataFrame as _DF

    from information_retrieval_project_spark.index.build import (
        BuildConfig,
        build_postings,
        collection_stats,
        doc_stats,
    )
    from information_retrieval_project_spark.queryexec.wand import (
        bm25_topk_compressed,
    )

    rows = [(d, t, (d * 7 + len(t)) % 9 + 1) for d in range(300) for t in ("aa", "bb", "cc") if (d + len(t)) % 3]
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    ds = doc_stats(tf).cache()
    cs = collection_stats(ds).collect()[0]
    idx = build_postings(
        tf, BuildConfig(hot_df_threshold=100, docs_per_salt=100, hot_detection_sample=1.0)
    ).cache()
    idx.count()

    calls = []
    orig = _DF.collect
    monkeypatch.setattr(_DF, "collect", lambda self: (calls.append(1), orig(self))[1])
    q = bm25_topk_compressed(
        spark, idx, ds, cs["n_docs"], cs["avgdl"], ["aa", "bb"], k=5
    )
    assert calls == [], "construction must not run driver actions"
    got = orig(q)
    monkeypatch.undo()
    exhaustive = bm25_topk_compressed(
        spark, idx, ds, cs["n_docs"], cs["avgdl"], ["aa", "bb"], k=5,
        blockmax=False,
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in got] == [
        (r["rank"], r["doc_id"]) for r in exhaustive
    ]
    ds.unpersist(); idx.unpersist()


def test_fused_blockmax_plan_single_decode_no_semijoin(spark):
    """Plan shape of the r6 default serve (VERDICT r5 #2): exactly TWO
    Python stages in the whole tree — the block-metadata theta pass and the
    ONE posting decode — and no semi-join of the decoded volume (the r5
    path decoded twice and semi-joined the full stream against an unhinted
    survivor set)."""
    from information_retrieval_project_spark.index.build import (
        BuildConfig,
        build_postings,
        collection_stats,
        doc_stats,
    )
    from information_retrieval_project_spark.queryexec.wand import (
        bm25_topk_compressed,
    )

    rows = [(d, t, d % 5 + 1) for d in range(200) for t in ("aa", "bb")]
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    ds = doc_stats(tf)
    cs = collection_stats(ds).collect()[0]
    idx = build_postings(
        tf, BuildConfig(hot_df_threshold=1000, docs_per_salt=1000, hot_detection_sample=1.0)
    ).localCheckpoint(eager=True)
    q = bm25_topk_compressed(
        spark, idx, ds, cs["n_docs"], cs["avgdl"], ["aa", "bb"], k=5
    )
    import re

    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    # formatted output names each operator twice (tree + details) — count
    # distinct operator ids: the theta metadata pass and THE one decode
    n_python = len(set(re.findall(r"\((\d+)\) MapInPandas", plan)))
    assert n_python == 2, plan
    assert "LeftSemi" not in plan, plan


@pytest.mark.parametrize("seed", [5, 23])
def test_batch_blockmax_pruned_equals_exhaustive(spark, seed):
    """VERDICT r5 #3: the batch server's fused per-query pruning must be
    exact — identical (query_id, rank, doc_id, score) rows with blockmax on
    and off, rounded and unrounded, segmented and not."""
    import random

    from information_retrieval_project_spark.index.build import (
        BuildConfig,
        build_postings,
        collection_stats,
        doc_stats,
    )
    from information_retrieval_project_spark.queryexec.wand import (
        bm25_topk_batch_compressed,
    )

    rng = random.Random(seed)
    n_docs = rng.randint(300, 1200)
    terms = [f"t{i}" for i in range(12)]
    rows = []
    for d in range(n_docs):
        doc_id = d * 11 - 4000
        for i, t in enumerate(terms):
            if rng.random() < 1.0 / (i + 1):
                rows.append((doc_id, t, rng.randint(1, 25)))
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    ds = doc_stats(tf).cache()
    cs = collection_stats(ds).collect()[0]
    idx = build_postings(
        tf,
        BuildConfig(
            hot_df_threshold=rng.randint(60, 300),
            docs_per_salt=rng.randint(100, 400),
            hot_detection_sample=1.0,
            segment_hot_terms=seed % 2 == 1,
        ),
    ).cache()
    queries = {
        qid: rng.sample(terms, rng.randint(1, 4)) for qid in range(4)
    }
    for rs in (None, 5):
        k = rng.randint(2, 15)
        pruned = bm25_topk_batch_compressed(
            spark, idx, ds, cs["n_docs"], cs["avgdl"], queries,
            k=k, round_scores=rs, blockmax=True,
        ).orderBy("query_id", "rank").collect()
        exhaustive = bm25_topk_batch_compressed(
            spark, idx, ds, cs["n_docs"], cs["avgdl"], queries,
            k=k, round_scores=rs, blockmax=False,
        ).orderBy("query_id", "rank").collect()
        assert [(r["query_id"], r["rank"], r["doc_id"]) for r in pruned] == [
            (r["query_id"], r["rank"], r["doc_id"]) for r in exhaustive
        ], (seed, rs)
        for a, b in zip(pruned, exhaustive):
            assert abs(a["score"] - b["score"]) < 1e-9
    ds.unpersist(); idx.unpersist()
