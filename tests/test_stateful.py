"""Stateful session-window operator: streaming (applyInPandasWithState)
closed-session output ⊆ and consistent with the batch sessionization."""

import os
import time

from pyspark.sql import functions as F

from information_retrieval_project_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)


def test_batch_sessionize_semantics(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts", "value")
    out = sessionize_batch(ev, gap_seconds=1800)
    # every event lands in exactly one session
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    rows = out.collect()
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    # sessions of one user don't overlap and respect the gap
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_start"])
        for a, b in zip(sess, sess[1:]):
            assert (b["session_start"] - a["session_end"]).total_seconds() > 1800


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "value")
        .filter(F.col("user_id") < 20)
    )
    src = str(tmp_path / "events_src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
    )
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir) if os.listdir(out_dir) else None
    # one AvailableNow pass closes only sessions followed by a gap within the
    # data; every emitted closed session must match a batch session exactly
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]):
            r["sum_value"]
        for r in sessionize_batch(ev, 1800).collect()
    }
    if got is not None:
        for r in got.collect():
            key = (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            assert key in want, key
            assert abs(want[key] - r["sum_value"]) < 1e-9
