"""Streaming incremental ingest: only-new-files semantics + equality with
the one-shot batch build; watermarked window agg."""

import os
import shutil

from pyspark.sql import functions as F

from information_retrieval_project_spark.corpus import generate_pdf
from information_retrieval_project_spark.index.build import tokenize_tf, with_doc_id
from information_retrieval_project_spark.streaming.incremental import (
    incremental_tf_ingest,
    windowed_event_counts,
)


def _write_chunk(spark, pdf, path):
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)


def test_incremental_ingest_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "tf")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)

    p1 = generate_pdf(60, start=0)
    p2 = generate_pdf(60, start=60)
    _write_chunk(spark, p1, f"{inp}/chunk1")
    # file source needs a flat dir of files: move part files up
    for d in ["chunk1"]:
        for f in os.listdir(f"{inp}/{d}"):
            if f.endswith(".parquet"):
                shutil.move(f"{inp}/{d}/{f}", f"{inp}/{d.replace('chunk','f')}.parquet")
        shutil.rmtree(f"{inp}/{d}")

    incremental_tf_ingest(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    _write_chunk(spark, p2, f"{inp}/chunk2")
    for d in ["chunk2"]:
        for f in os.listdir(f"{inp}/{d}"):
            if f.endswith(".parquet"):
                shutil.move(f"{inp}/{d}/{f}", f"{inp}/{d.replace('chunk','f')}.parquet")
        shutil.rmtree(f"{inp}/{d}")

    incremental_tf_ingest(spark, inp, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() > n1

    # equality with the one-shot batch tokenize over the full corpus
    import pandas as pd

    full = spark.createDataFrame(pd.concat([p1, p2], ignore_index=True))
    want = tokenize_tf(with_doc_id(full))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_windowed_event_counts_batch_semantics(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(ev, window="1 day")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()  # tumbling windows partition all events
    # window bounds are day-aligned and disjoint per event_type
    rows = out.collect()
    assert all(r["window_start"] < r["window_end"] for r in rows)
