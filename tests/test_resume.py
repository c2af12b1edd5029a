"""Checkpoint-resumable build: crash mid-build → resume → identical index
(north_rule; SURVEY.md §7.1 M5)."""

import os

import pytest

from information_retrieval_project_spark.corpus import generate_corpus
from information_retrieval_project_spark.index.build import BuildConfig, build_index
from information_retrieval_project_spark.index.codec import decode_postings
from information_retrieval_project_spark.pipelines.lineage import (
    finalize_index,
    load_manifest,
    resumable_build,
)

CFG = BuildConfig(hot_df_threshold=50, docs_per_salt=100, hot_detection_sample=1.0)


def _index_as_dict(spark, path):
    rows = spark.read.parquet(path).collect()
    return {
        r["term"]: (r["df"], decode_postings(bytes(r["postings"]))[0].tolist(),
                    decode_postings(bytes(r["postings"]))[1].tolist())
        for r in rows
    }


def test_crash_resume_identical(spark, tmp_path):
    corpus = generate_corpus(spark, 300, partitions=3).cache()
    out = str(tmp_path / "build")

    with pytest.raises(RuntimeError, match="simulated crash"):
        resumable_build(spark, corpus, out, n_units=6, cfg=CFG, fail_after_units=3)
    assert len(load_manifest(out)) == 3

    # resume: only the remaining units run
    metrics = resumable_build(spark, corpus, out, n_units=6, cfg=CFG)
    assert len(metrics) == 3
    assert len(load_manifest(out)) == 6
    finalize_index(spark, out, CFG)

    # one-shot reference build
    idx, ds, _ = build_index(corpus, CFG)
    want = {
        r["term"]: (r["df"], decode_postings(bytes(r["postings"]))[0].tolist(),
                    decode_postings(bytes(r["postings"]))[1].tolist())
        for r in idx.collect()
    }
    got = _index_as_dict(spark, os.path.join(out, "index"))
    assert got == want

    # manifest carries throughput metrics per unit
    for rec in load_manifest(out).values():
        assert rec["n_docs"] >= 0 and rec["seconds"] > 0 and "docs_per_sec" in rec


def test_rerun_is_noop(spark, tmp_path):
    corpus = generate_corpus(spark, 120, partitions=2).cache()
    out = str(tmp_path / "build2")
    resumable_build(spark, corpus, out, n_units=4, cfg=CFG)
    again = resumable_build(spark, corpus, out, n_units=4, cfg=CFG)
    assert again == []  # everything checkpointed, nothing re-runs


def test_changed_input_invalidates_stale_units(spark, tmp_path):
    """Resume against CHANGED input must rebuild the affected units, not
    silently skip them (manifest input fingerprint, ADVICE r1)."""
    from pyspark.sql import functions as F

    corpus = generate_corpus(spark, 120, partitions=2).cache()
    out = str(tmp_path / "build3")
    resumable_build(spark, corpus, out, n_units=4, cfg=CFG)

    # mutate one file's content → exactly the units holding its rows change
    changed = corpus.withColumn(
        "content",
        F.when(F.col("path") == corpus.select("path").first()["path"],
               F.concat(F.col("content"), F.lit(" mutated_token")))
        .otherwise(F.col("content")),
    ).cache()
    again = resumable_build(spark, changed, out, n_units=4, cfg=CFG)
    assert len(again) >= 1                   # stale unit(s) rebuilt
    assert len(again) < 4                    # unaffected units still skipped

    # after the rebuild, the resumed state matches a from-scratch build
    finalize_index(spark, out, CFG)
    idx, _, _ = build_index(changed, CFG)
    want = {
        r["term"]: (r["df"], decode_postings(bytes(r["postings"]))[0].tolist())
        for r in idx.collect()
    }
    got = {
        k: (v[0], v[1])
        for k, v in _index_as_dict(spark, os.path.join(out, "index")).items()
    }
    assert got == want
    # and a further rerun is again a no-op
    assert resumable_build(spark, changed, out, n_units=4, cfg=CFG) == []
