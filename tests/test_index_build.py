"""End-to-end index build + BM25/TF-IDF rank-identity vs the numpy oracle
(SURVEY.md §5.2 items 1/2/5; BASELINE.json north_rule rank-identical top-k +
sha256 per-row invariant)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark.corpus import generate_corpus, generate_pdf
from information_retrieval_project_spark.index.build import (
    BuildConfig,
    build_postings,
    collection_stats,
    doc_stats,
    tokenize_tf,
    with_doc_id,
)
from information_retrieval_project_spark.index.codec import decode_postings
from information_retrieval_project_spark.oracle.oracle import (
    oracle_bm25_topk,
    oracle_tf,
    oracle_tfidf_cosine_topk,
)
from information_retrieval_project_spark.queryexec.bm25 import bm25_topk
from information_retrieval_project_spark.queryexec.tfidf import tfidf_cosine_topk
from information_retrieval_project_spark.queryexec.wand import bm25_topk_compressed

N_DOCS = 400
QUERIES = [
    "def return import",             # hot head terms
    "parse_config_16 handle_request_100",  # tail terms
    "merge_index_33 return class",   # mixed
    "zzz_not_in_corpus",             # absent term
    "get_cache_44",
]


@pytest.fixture(scope="module")
def built(spark):
    corpus = generate_corpus(spark, N_DOCS, partitions=4)
    ids = with_doc_id(corpus).cache()
    tf_df = tokenize_tf(ids).cache()
    ds = doc_stats(tf_df).cache()
    cs = collection_stats(ds).collect()[0]
    idx = build_postings(tf_df, BuildConfig(hot_df_threshold=50, docs_per_salt=100, hot_detection_sample=1.0))
    pdf = generate_pdf(N_DOCS)
    # oracle-side corpus dict keyed by the SAME xxhash64 doc_id computed by Spark
    id_map = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in ids.select("repo", "path", "commit", "doc_id").collect()
    }
    docs = {
        id_map[(row.repo, row.path, row.commit)]: row.content
        for row in pdf.itertuples(index=False)
    }
    return ids, tf_df, ds, cs, idx, docs


def test_doc_id_no_collisions(built):
    ids = built[0]
    assert ids.select("doc_id").distinct().count() == N_DOCS


def test_sha256_row_invariant(built):
    """input_hint: per-row sha256(content) equality engine vs source."""
    ids, docs = built[0], built[5]
    import hashlib

    engine = {r["doc_id"]: r["content_sha"] for r in ids.select("doc_id", "content_sha").collect()}
    for doc_id, content in docs.items():
        assert engine[doc_id] == hashlib.sha256(content.encode()).hexdigest()


def test_tf_matches_oracle(built):
    _, tf_df, _, _, _, docs = built
    otf = oracle_tf(docs)
    rows = tf_df.collect()
    engine = {}
    for r in rows:
        engine.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
    assert engine == otf


def test_collection_stats(built):
    _, _, _, cs, _, docs = built
    otf = oracle_tf(docs)
    lens = [sum(c.values()) for c in otf.values()]
    assert cs["n_docs"] == len(docs)
    assert cs["total_terms"] == sum(lens)
    assert abs(cs["avgdl"] - sum(lens) / len(lens)) < 1e-9


def test_postings_match_tf_and_salting_is_lossless(built):
    """Salted multi-run path must produce byte-identical logical postings to
    the tf relation: exact df, sorted unique doc ids, exact tf."""
    _, tf_df, _, _, idx, _ = built
    expect = {}
    for r in tf_df.collect():
        expect.setdefault(r["term"], {})[r["doc_id"]] = r["tf"]
    got = idx.collect()
    assert len(got) == len(expect)
    salted_terms = 0
    for row in got:
        d, t = decode_postings(bytes(row["postings"]))
        exp = expect[row["term"]]
        assert row["df"] == len(exp)
        assert d.tolist() == sorted(exp)
        assert t.tolist() == [exp[x] for x in sorted(exp)]
        dl = d.tolist()  # python ints: int64 np.diff overflows on hash range
        assert all(x < y for x, y in zip(dl, dl[1:]))  # strictly sorted, no dups
        if len(exp) > 50:
            salted_terms += 1
    assert salted_terms > 0  # the hot path was actually exercised


@pytest.mark.parametrize("query", QUERIES)
def test_bm25_rank_identical_to_oracle(spark, built, query):
    _, tf_df, ds, cs, _, docs = built
    got = bm25_topk(spark, tf_df, ds, cs["n_docs"], cs["avgdl"],
                    __import__("information_retrieval_project_spark.functions.textnorm", fromlist=["normalize_tokenize"]).normalize_tokenize(query), k=10).collect()
    want = oracle_bm25_topk(docs, query, k=10)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-9


@pytest.mark.parametrize("query", QUERIES[:3])
def test_compressed_path_equals_sql_path(spark, built, query):
    from information_retrieval_project_spark.functions.textnorm import normalize_tokenize

    _, tf_df, ds, cs, idx, docs = built
    toks = normalize_tokenize(query)
    a = bm25_topk(spark, tf_df, ds, cs["n_docs"], cs["avgdl"], toks, k=10).collect()
    b = bm25_topk_compressed(spark, idx, ds, cs["n_docs"], cs["avgdl"], toks, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
        (r["doc_id"], round(r["score"], 9)) for r in b
    ]


def test_tfidf_cosine_rank_identical_to_oracle(spark, built):
    from information_retrieval_project_spark.functions.textnorm import normalize_tokenize

    _, tf_df, ds, cs, _, docs = built
    query = QUERIES[0]
    got = tfidf_cosine_topk(spark, tf_df, cs["n_docs"], normalize_tokenize(query), k=10).collect()
    want = oracle_tfidf_cosine_topk(docs, query, k=10)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-9


def test_segmented_hot_terms_rank_identical(spark, built):
    """segment_hot_terms=True (Arrow-row memory bound for 10^12-scale hot
    terms) must produce identical df totals and identical BM25 results
    through the compressed query path."""
    from information_retrieval_project_spark.functions.textnorm import normalize_tokenize

    _, tf_df, ds, cs, idx_merged, _ = built
    seg_idx = build_postings(
        tf_df,
        BuildConfig(
            hot_df_threshold=50, docs_per_salt=100, hot_detection_sample=1.0,
            segment_hot_terms=True,
        ),
    ).cache()
    # hot terms really are segmented
    seg_counts = {
        r["term"]: r["n"] for r in
        seg_idx.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    assert any(n > 1 for n in seg_counts.values())
    # df on every segment row equals the merged index's term df
    want_df = {r["term"]: r["df"] for r in idx_merged.select("term", "df").collect()}
    for r in seg_idx.select("term", "df").distinct().collect():
        assert want_df[r["term"]] == r["df"], r["term"]
    # compressed-path scoring identical to the merged index
    for query in QUERIES[:3]:
        toks = normalize_tokenize(query)
        a = bm25_topk_compressed(spark, idx_merged, ds, cs["n_docs"], cs["avgdl"], toks, k=10).collect()
        b = bm25_topk_compressed(spark, seg_idx, ds, cs["n_docs"], cs["avgdl"], toks, k=10).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
            (r["doc_id"], round(r["score"], 9)) for r in b
        ], query
