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
    read_index_meta,
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


def test_query_stored_index_with_nondefault_bucket_count(spark, stored):
    """Regression (ADVICE r1): querying an index stored with term_buckets=16
    must not silently prune valid postings. The bucket count comes from the
    index_meta sidecar and is threaded into bm25_topk_compressed; a wrong
    modulus (32) on this corpus would drop every query term whose 16-bucket
    and 32-bucket values differ."""
    from information_retrieval_project_spark.queryexec.wand import (
        bm25_topk_compressed,
    )

    out, _ = stored
    meta = read_index_meta(spark, out)
    assert meta["term_buckets"] == 16
    idx, ds, cs_df = read_index(spark, out)
    cs = cs_df.collect()[0]
    toks = ["def", "return", "import"]
    got = bm25_topk_compressed(
        spark, idx, ds, cs["n_docs"], cs["avgdl"], toks, k=10,
        term_buckets=meta["term_buckets"],
    ).collect()
    # oracle: same query against the in-memory (unbucketed) index
    idx0, ds0, cs0_df = build_index(
        generate_corpus(spark, 300, partitions=3),
        BuildConfig(hot_df_threshold=1000),
    )
    cs0 = cs0_df.collect()[0]
    want = bm25_topk_compressed(
        spark, idx0, ds0, cs0["n_docs"], cs0["avgdl"], toks, k=10
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (r["doc_id"], round(r["score"], 9)) for r in want
    ]
    # default legacy fallback when no sidecar exists
    assert read_index_meta(spark, out + "/nonexistent")["term_buckets"] == 32


def test_iceberg_index_roundtrip_or_skip(spark, tmp_path):
    """north_rule names Iceberg as the target table layout. The write/read
    path is config-gated (write_index/read_index fmt param); this sandbox
    ships no Iceberg runtime jars, so the test skips cleanly when the data
    source can't load — on a cluster with the jars it runs end-to-end."""
    corpus = generate_corpus(spark, 50, partitions=2)
    idx, ds, cs = build_index(corpus, BuildConfig(hot_df_threshold=1000))
    out = str(tmp_path / "iceberg_idx")
    try:
        write_index(idx, ds, cs, out, term_buckets=8, fmt="iceberg")
    except Exception as e:  # noqa: BLE001 — classify, skip only for missing jars
        msg = f"{type(e).__name__}: {e}"
        if (
            "iceberg" in msg.lower()
            or "ClassNotFound" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find" in msg
        ):
            pytest.skip(f"Iceberg runtime jars not on the classpath ({type(e).__name__})")
        raise
    got_idx, got_ds, _ = read_index(spark, out, fmt="iceberg")
    assert got_idx.count() == idx.count()
    assert got_ds.count() == ds.count()
    assert read_index_meta(spark, out)["fmt"] == "iceberg"


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


def test_corrupt_index_meta_raises_not_falls_back(spark, tmp_path):
    """ADVICE r2: a sidecar that EXISTS but can't be parsed must raise —
    silently assuming 32 buckets against an index written with a different
    modulus would drop valid postings. Only a genuinely absent sidecar
    (legacy layout) falls back."""
    import os

    import pytest

    out = str(tmp_path / "idxmeta")
    os.makedirs(f"{out}/index_meta")
    with open(f"{out}/index_meta/part-00000.json", "w") as f:
        f.write("{this is not json")
    with pytest.raises(ValueError, match="corrupt index_meta"):
        read_index_meta(spark, out)

    # valid JSON but missing the required field is also corruption
    out2 = str(tmp_path / "idxmeta2")
    os.makedirs(f"{out2}/index_meta")
    with open(f"{out2}/index_meta/part-00000.json", "w") as f:
        f.write('{"something_else": 5}')
    with pytest.raises(ValueError, match="corrupt index_meta"):
        read_index_meta(spark, out2)

    # absent path = legacy layout -> documented fallback
    assert read_index_meta(spark, str(tmp_path / "nope"))["term_buckets"] == 32
