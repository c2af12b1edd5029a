"""Stored-index layout: term-bucket partition pruning on the read path and
full write/read roundtrip (SURVEY.md §4.2 partition pruning; index/build
write_index/read_index)."""

import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark.corpus import generate_corpus
from information_retrieval_project_spark.index.build import (
    BuildConfig,
    build_index,
    read_index,
    write_index,
)
from information_retrieval_project_spark.index.codec import decode_postings


@pytest.fixture(scope="module")
def stored(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    corpus = generate_corpus(spark, 300, partitions=3)
    idx, ds, cs = build_index(corpus, BuildConfig(hot_df_threshold=1000))
    write_index(idx, ds, cs, out, term_buckets=16)
    return out, {r["term"]: r["df"] for r in idx.select("term", "df").collect()}


def test_roundtrip_preserves_index(spark, stored):
    out, want_df = stored
    idx, ds, cs = read_index(spark, out)
    got = {r["term"]: r["df"] for r in idx.select("term", "df").collect()}
    assert got == want_df
    row = idx.filter(F.col("term") == "def").collect()[0]
    d, t = decode_postings(bytes(row["postings"]))
    assert d.size == row["df"] and (t > 0).all()


def test_term_bucket_partition_pruning(spark, stored):
    out, _ = stored
    idx = spark.read.parquet(f"{out}/index")
    bucket = idx.filter(F.col("term") == "def").select("term_bucket").collect()[0][0]
    pruned = idx.filter(
        (F.col("term") == "def") & (F.col("term_bucket") == int(bucket))
    )
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    # the term_bucket predicate must reach PartitionFilters (pruned scan),
    # and the term predicate must be pushed to the parquet reader
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:200]
    assert "term_bucket" in pf
    assert "PushedFilters" in plan
