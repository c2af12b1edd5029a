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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import tokenize_tf, with_doc_id

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
