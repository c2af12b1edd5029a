"""Custom Python DataSource for external-store scans (SURVEY.md §2.1 S3-S5:
the generic Spark equivalent of the reference's MongoDB/scrape/REST lookups,
data_manager.py:32,150-162,265-281 — parallel partitioned scan + broadcast
enrichment join instead of per-row I/O)."""

from pyspark.sql import functions as F

from information_retrieval_project_spark.sources.docstore import (
    enrich_with_docstore,
    read_docstore,
)


def test_docstore_scan_is_deterministic_and_partitioned(spark):
    a = read_docstore(spark, shards=4, rows_per_shard=50, seed=7)
    assert a.rdd.getNumPartitions() == 4          # one task per store shard
    assert a.count() == 200
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, read_docstore(spark, 4, 50, 7).collect()))
    assert rows_a == rows_b                        # same seed → same store
    assert len({r[0] for r in rows_a}) == 200      # keys unique across shards
    cats = {r[1] for r in rows_a}
    assert cats and all(isinstance(c, str) for c in cats)
    # different seed → different payload universe
    rows_c = sorted(map(tuple, read_docstore(spark, 4, 50, 8).collect()))
    assert rows_a != rows_c


def test_docstore_enrichment_is_a_broadcast_join(spark):
    store = read_docstore(spark, shards=2, rows_per_shard=20, seed=7)
    facts = spark.createDataFrame(
        [(f"k{0:03d}_{i:05d}", i) for i in range(10)]
        + [("missing_key", 99)],
        "key string, v int",
    )
    out = enrich_with_docstore(facts, store, "key")
    got = {r["key"]: r["category"] for r in out.collect()}
    assert len(got) == 11
    assert got["missing_key"] is None              # left join keeps the fact
    assert sum(v is not None for v in got.values()) == 10
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan             # never a per-row lookup


def test_usda_query_url_mirrors_reference_replace_chain(spark):
    """F6: ',' -> %20, '/' -> ',', '\"' -> ',', spaces stripped
    (data_manager.py:268-272), then concatenated onto the base URL."""
    from information_retrieval_project_spark.sources.docstore import usda_query_url

    df = spark.createDataFrame(
        [("red, ripe tomato/diced \"fresh\"",), ("plain salt",)], "ing string"
    )
    got = [r["url"] for r in df.select(usda_query_url(F.col("ing")).alias("url")).collect()]
    base = "https://api.nal.usda.gov/fdc/v1/foods/search?query="
    assert got[0] == base + "red%20ripetomato,diced,fresh,"
    assert got[1] == base + "plainsalt"
