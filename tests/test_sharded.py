"""Doc-sharded WAND serving path == unsharded native BM25 (rank + score)."""

import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark.corpus import generate_corpus
from information_retrieval_project_spark.index.build import (
    collection_stats,
    doc_stats,
    tokenize_tf,
    with_doc_id,
)
from information_retrieval_project_spark.queryexec.bm25 import bm25_topk
from information_retrieval_project_spark.queryexec.sharded import (
    bm25_topk_sharded,
    build_sharded_index,
    global_term_df,
    shard_doc_stats,
)

QUERIES = [
    ["def", "return", "import"],
    ["parse_config_16", "handle_request_100"],
    ["get_cache_44", "class"],
    ["zzz_absent"],
]


@pytest.fixture(scope="module")
def built(spark):
    corpus = generate_corpus(spark, 500, partitions=4)
    tf = tokenize_tf(with_doc_id(corpus)).cache()
    ds = doc_stats(tf).cache()
    cs = collection_stats(ds).collect()[0]
    idx = build_sharded_index(tf, n_shards=8).cache()
    sds = shard_doc_stats(ds, n_shards=8).cache()
    return tf, ds, cs, idx, sds


def test_global_df_sums_across_shards(built):
    tf, _, _, idx, _ = built
    want = {r["term"]: r["df"] for r in tf.groupBy("term").count().withColumnRenamed("count", "df").collect()}
    got = {r["term"]: r["df"] for r in global_term_df(idx).collect()}
    assert got == want


@pytest.mark.parametrize("q", QUERIES)
def test_sharded_wand_equals_unsharded(spark, built, q):
    tf, ds, cs, idx, sds = built
    a = bm25_topk(spark, tf, ds, cs["n_docs"], cs["avgdl"], q, k=10).collect()
    b = bm25_topk_sharded(spark, idx, sds, cs["n_docs"], cs["avgdl"], q, k=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    for x, y in zip(a, b):
        assert abs(x["score"] - y["score"]) < 1e-9
