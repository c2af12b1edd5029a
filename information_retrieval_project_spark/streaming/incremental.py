"""Structured Streaming: incremental index ingest + event-time windows.

The reference is strictly batch (SURVEY.md §2.9), so streaming here is the
documented upgrade path, not parity: Trigger.AvailableNow + foreachBatch
drives the SAME batch build function (index/build.tokenize_tf) over newly
arrived corpus files, with Spark's checkpoint giving exactly-once file-source
progress on top of the build's own lineage manifest. A watermarked
tumbling-window aggregate over the events table shows the late-data path.

At cluster scale the file source becomes an Iceberg/Kafka source and
foreachBatch appends tf-unit partitions exactly like pipelines/lineage.py —
the batch and streaming ingest paths share one implementation.
"""

from __future__ import annotations

import json
import os
import shutil
from glob import glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import BuildConfig, build_postings, tokenize_tf, with_doc_id

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def incremental_tf_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Consume all currently-available corpus parquet files and append their
    (doc_id, term, tf) rows to out_dir. Re-running after new files arrive
    processes ONLY the new files (file-source checkpoint). Blocks until the
    AvailableNow trigger drains."""
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        tf = tokenize_tf(with_doc_id(batch_df))
        tf.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_index_update(
    spark: SparkSession,
    tf_dir: str,
    out_dir: str,
    cfg: BuildConfig = BuildConfig(),
) -> dict:
    """Maintain a SERVED index over the append-only tf stream: merge only the
    tf part-files that arrived since the last update into the stored index
    (index/merge.merge_index — untouched terms pass through byte-identical,
    no re-encode), instead of rebuilding from all of history. doc_stats and
    collection_stats are maintained alongside, so the out_dir is directly
    servable by queryexec after every update.

    This closes the loop with incremental_tf_ingest: the streaming source
    appends tf parquet per batch; this updater makes the index catch up in
    O(delta) work. State = the list of incorporated part-file names
    (JSON sidecar); the index swap is write-to-tmp + rename (an Iceberg
    snapshot commit at cluster scale — same idempotence argument as
    pipelines/lineage.py). Append-only: re-ingesting a document would sum
    its tf into existing postings; dedupe upstream."""
    os.makedirs(out_dir, exist_ok=True)
    state_path = os.path.join(out_dir, "incorporated.json")
    incorporated: set[str] = set()
    if os.path.exists(state_path):
        with open(state_path) as f:
            incorporated = set(json.load(f))
    files = sorted(glob(os.path.join(tf_dir, "*.parquet")))
    new = [f for f in files if os.path.basename(f) not in incorporated]
    if not new:
        return {"mode": "noop", "new_files": 0}
    from ..index.build import collection_stats, doc_stats

    delta_tf = spark.read.parquet(*new)
    delta_idx = build_postings(delta_tf, cfg)
    delta_ds = doc_stats(delta_tf)
    idx_path = os.path.join(out_dir, "index")
    ds_path = os.path.join(out_dir, "doc_stats")
    cs_path = os.path.join(out_dir, "collection_stats")
    if os.path.exists(idx_path):
        from ..index.merge import merge_doc_stats, merge_index

        merged = merge_index(spark.read.parquet(idx_path), delta_idx)
        ds = merge_doc_stats(spark.read.parquet(ds_path), delta_ds)
        mode = "merged"
    else:
        merged, ds, mode = delta_idx, delta_ds, "initial"

    def _swap(df, path):
        tmp, old = path + "_tmp", path + "_old"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    _swap(merged, idx_path)
    _swap(ds, ds_path)
    _swap(collection_stats(spark.read.parquet(ds_path)), cs_path)
    incorporated |= {os.path.basename(f) for f in new}
    with open(state_path, "w") as f:
        json.dump(sorted(incorporated), f)
    return {"mode": mode, "new_files": len(new)}


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type. Works identically
    on a streaming DataFrame (late rows beyond the watermark dropped) and on
    a batch DataFrame (watermark is a no-op) — the test asserts the batch
    semantics; the streaming wiring is the production path."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
