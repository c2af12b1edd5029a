"""Bucketed co-located join: writing tf and doc_stats bucketed by doc_id
eliminates the join shuffle (SURVEY.md §4.2 'bucketing for co-located
joins') — asserted at the physical-plan level."""

import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark.corpus import generate_corpus
from information_retrieval_project_spark.index.build import (
    doc_stats,
    tokenize_tf,
    with_doc_id,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_eliminates_shuffle(spark):
    corpus = generate_corpus(spark, 200, partitions=2)
    tf = tokenize_tf(with_doc_id(corpus))
    ds = doc_stats(tf)
    spark.sql("DROP TABLE IF EXISTS tf_b")
    spark.sql("DROP TABLE IF EXISTS ds_b")
    tf.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("tf_b")
    ds.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("ds_b")
    try:
        tb = spark.table("tf_b")
        db = spark.table("ds_b")
        joined = tb.join(db, "doc_id").groupBy("doc_id").agg(
            F.sum(F.col("tf") * F.col("doc_len")).alias("x")
        )
        # force sort-merge path so bucketing (not broadcast) does the work
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            p = _plan(tb.join(db, "doc_id").select(tb.doc_id, "tf", "doc_len"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        assert "SortMergeJoin" in p
        # both sides read pre-bucketed: no Exchange feeds the join
        join_section = p.split("SortMergeJoin", 1)[0]
        assert "Exchange hashpartitioning" not in join_section, p[:2000]
        # correctness unchanged vs unbucketed join
        want = (
            tf.join(ds, "doc_id")
            .groupBy("doc_id")
            .agg(F.sum(F.col("tf") * F.col("doc_len")).alias("x"))
        )
        assert joined.exceptAll(want).count() == 0
        assert want.exceptAll(joined).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS tf_b")
        spark.sql("DROP TABLE IF EXISTS ds_b")
