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


def _read_current(out_dir: str) -> tuple[str, str] | None:
    """(snapshot_name, snapshot_path) the CURRENT pointer commits to, or None.
    A pointer naming a missing directory is corruption, not a fresh start —
    silently rebuilding from only new files would drop all history."""
    cur = os.path.join(out_dir, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        name = f.read().strip()
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        raise RuntimeError(
            f"CURRENT points at missing snapshot {name!r} in {out_dir}"
        )
    return name, path


def _recover(out_dir: str, current_name: str | None, retain: int) -> None:
    """Drop uncommitted leftovers from a crashed update: staging dirs,
    snapshot dirs newer than CURRENT (published data whose state commit
    never happened), and superseded snapshots beyond the retention window
    (a crash between the pointer flip and retirement would otherwise leak a
    full index copy forever). The committed snapshot is never touched."""
    cur_id = int(current_name[1:]) if current_name else -1
    for entry in os.listdir(out_dir):
        p = os.path.join(out_dir, entry)
        if entry.startswith("_staging_"):
            shutil.rmtree(p, ignore_errors=True)
        elif entry.startswith("v") and entry[1:].isdigit():
            eid = int(entry[1:])
            if eid > cur_id or eid <= cur_id - retain:
                shutil.rmtree(p, ignore_errors=True)


def current_snapshot_dir(out_dir: str) -> str:
    """Path of the committed snapshot (contains index/, doc_stats/,
    collection_stats/, incorporated.json)."""
    cur = _read_current(out_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot in {out_dir}")
    return cur[1]


def read_served_index(spark: SparkSession, out_dir: str):
    """(index, doc_stats, collection_stats) DataFrames of the committed
    snapshot — the serving handle for queryexec."""
    snap = current_snapshot_dir(out_dir)
    return (
        spark.read.parquet(os.path.join(snap, "index")),
        spark.read.parquet(os.path.join(snap, "doc_stats")),
        spark.read.parquet(os.path.join(snap, "collection_stats")),
    )


def incremental_index_update(
    spark: SparkSession,
    tf_dir: str,
    out_dir: str,
    cfg: BuildConfig = BuildConfig(),
    retain: int = 2,
) -> dict:
    """Maintain a SERVED index over the append-only tf stream: merge only the
    tf part-files that arrived since the last update into the stored index
    (index/merge.merge_index — untouched terms pass through byte-identical,
    no re-encode), instead of rebuilding from all of history. doc_stats and
    collection_stats are maintained alongside; read_served_index(out_dir)
    is directly servable by queryexec after every update.

    Crash idempotence (the merge is ADDITIVE — re-applying a delta would SUM
    tf into existing postings — so state and data must commit together):
    every update writes a complete versioned snapshot dir
    (index/ + doc_stats/ + collection_stats/ + incorporated.json) under
    _staging_vN, publishes it with ONE os.rename to vN, then flips the
    CURRENT pointer file atomically (write tmp + os.replace). A crash at any
    point leaves CURRENT on the previous consistent snapshot; the next run
    garbage-collects staging dirs and never-committed snapshots and re-merges
    the same new files against the unchanged base. At cluster scale the
    snapshot commit is an Iceberg snapshot (atomic data+metadata), which is
    exactly this protocol. Append-only: re-ingesting a document would sum
    its tf into existing postings; dedupe upstream.

    retain: how many committed snapshots to keep (default 2 — the previous
    snapshot survives one update so in-flight read_served_index readers
    pinned to it don't lose files mid-query; raise for longer grace)."""
    if retain < 1:
        raise ValueError("retain must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    cur = _read_current(out_dir)
    if cur is None and (
        os.path.isdir(os.path.join(out_dir, "index"))
        or os.path.exists(os.path.join(out_dir, "incorporated.json"))
    ):
        # pre-snapshot layout (top-level index/ + incorporated.json, no
        # CURRENT): treating it as a fresh start would re-merge everything
        # and orphan the old index — refuse instead of silently losing
        # history
        raise RuntimeError(
            f"{out_dir} uses the legacy pre-snapshot layout; migrate by "
            "moving index/, doc_stats/, collection_stats/ and "
            "incorporated.json into a v000001/ dir and writing 'v000001' "
            "to a CURRENT file"
        )
    cur_name = cur[0] if cur else None
    _recover(out_dir, cur_name, retain)
    incorporated: set[str] = set()
    if cur:
        with open(os.path.join(cur[1], "incorporated.json")) as f:
            incorporated = set(json.load(f))
    files = sorted(glob(os.path.join(tf_dir, "*.parquet")))
    new = [f for f in files if os.path.basename(f) not in incorporated]
    if not new:
        return {"mode": "noop", "new_files": 0, "snapshot": cur_name}
    delta_tf = spark.read.parquet(*new)
    return _apply_index_delta(
        spark,
        delta_tf,
        out_dir,
        cur,
        incorporated | {os.path.basename(f) for f in new},
        len(new),
        cfg,
        retain,
    )


def _apply_index_delta(
    spark: SparkSession,
    delta_tf: DataFrame,
    out_dir: str,
    cur: tuple[str, str] | None,
    incorporated: set[str],
    n_new: int,
    cfg: BuildConfig,
    retain: int,
) -> dict:
    """The merge + snapshot-commit core of incremental_index_update, with
    the delta already materialized as a tf relation — shared by the
    file-driven entry point above and by incremental_corpus_update (whose
    delta comes from ONE fused tokenize pass feeding this index AND the
    positional store)."""
    from ..index.build import collection_stats, doc_stats

    cur_name = cur[0] if cur else None
    delta_idx = build_postings(delta_tf, cfg)
    delta_ds = doc_stats(delta_tf)
    if cur:
        from ..index.merge import merge_doc_stats, merge_index

        merged = merge_index(
            spark.read.parquet(os.path.join(cur[1], "index")), delta_idx
        )
        ds = merge_doc_stats(
            spark.read.parquet(os.path.join(cur[1], "doc_stats")), delta_ds
        )
        mode = "merged"
    else:
        merged, ds, mode = delta_idx, delta_ds, "initial"

    next_id = (int(cur_name[1:]) if cur_name else 0) + 1
    next_name = f"v{next_id:06d}"
    staging = os.path.join(out_dir, f"_staging_{next_name}")
    merged.write.mode("overwrite").parquet(os.path.join(staging, "index"))
    ds.write.mode("overwrite").parquet(os.path.join(staging, "doc_stats"))
    collection_stats(
        spark.read.parquet(os.path.join(staging, "doc_stats"))
    ).write.mode("overwrite").parquet(os.path.join(staging, "collection_stats"))
    with open(os.path.join(staging, "incorporated.json"), "w") as f:
        json.dump(sorted(incorporated), f)
    # one rename publishes data AND state together; the pointer flip commits
    os.rename(staging, os.path.join(out_dir, next_name))
    ptr_tmp = os.path.join(out_dir, "CURRENT.tmp")
    with open(ptr_tmp, "w") as f:
        f.write(next_name)
    os.replace(ptr_tmp, os.path.join(out_dir, "CURRENT"))
    # retire snapshots beyond the retention window (the new snapshot plus
    # retain-1 predecessors stay): _recover's retention branch is exactly
    # this deletion relative to the just-committed snapshot, and it also
    # runs on startup in case of a crash right here
    _recover(out_dir, next_name, retain)
    return {"mode": mode, "new_files": n_new, "snapshot": next_name}


def incremental_corpus_update(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    cfg: BuildConfig = BuildConfig(),
    retain: int = 2,
) -> dict:
    """Maintain BOTH servable stores from the corpus itself: the merged
    postings index (incremental_index_update's snapshot protocol, under
    out_dir/index_store) AND the positional index
    (index/positions.append_positions, under out_dir/positions_store) —
    with the dominant tokenize cost paid ONCE per new-file batch via the
    fused tokenize_tf_positions pass (the maintenance-path form of
    build_index(positions=True): at 100 TB the corpus scan is the build,
    so a deployment serving BM25 + phrase/proximity must not scan twice).

    Each store commits its own incorporated-file list atomically WITH its
    snapshot (incorporated.json — the positions side rides
    append_positions' state_files). The two commits are sequential, not
    transactional: a crash between them leaves the index store one batch
    ahead, and the next run CATCHES THE LAGGING STORE UP with its own
    scan of exactly the missed files — each store converges independently
    and append-only idempotence holds per store. Corpus files are
    append-only immutable batches (the file-source contract of
    incremental_tf_ingest); re-writing an already-incorporated file is
    NOT detected (same rule as incremental_index_update: dedupe upstream).
    """
    from ..index.build import with_doc_id
    from ..index.positions import (
        append_positions,
        read_positions_state,
        tokenize_tf_positions,
    )

    idx_dir = os.path.join(out_dir, "index_store")
    pos_dir = os.path.join(out_dir, "positions_store")
    os.makedirs(idx_dir, exist_ok=True)
    files = sorted(glob(os.path.join(corpus_dir, "*.parquet")))

    cur = _read_current(idx_dir)
    inc_idx: set[str] = set()
    if cur:
        with open(os.path.join(cur[1], "incorporated.json")) as f:
            inc_idx = set(json.load(f))
    _recover(idx_dir, cur[0] if cur else None, retain)
    pos_state = read_positions_state(pos_dir, "incorporated.json")
    inc_pos: set[str] = set(json.loads(pos_state)) if pos_state else set()

    new_idx = [f for f in files if os.path.basename(f) not in inc_idx]
    new_pos = [f for f in files if os.path.basename(f) not in inc_pos]
    if not new_idx and not new_pos:
        return {"mode": "noop", "new_files": 0}

    out: dict = {}
    if new_idx and set(new_idx) == set(new_pos):
        # the common path: ONE fused pass feeds both deltas; persisted so
        # the index branch (postings + stats) and the positions branch
        # don't each re-tokenize
        corpus = with_doc_id(spark.read.parquet(*new_idx))
        fused = tokenize_tf_positions(corpus).persist()
        try:
            tf_delta = fused.select("doc_id", "term", "tf")
            pos_delta = fused.select(
                "term", "doc_id", F.col("tf").alias("n_occ"), "positions"
            )
            names = {os.path.basename(f) for f in new_idx}
            out["index"] = _apply_index_delta(
                spark, tf_delta, idx_dir, cur, inc_idx | names,
                len(new_idx), cfg, retain,
            )
            out["positions"] = append_positions(
                spark,
                pos_dir,
                delta_positions=pos_delta,
                state_files={
                    "incorporated.json": json.dumps(sorted(inc_pos | names))
                },
            )
        finally:
            # a failure between the two commits must not leave the full
            # tokenized corpus cached for the session lifetime
            fused.unpersist()
        out["mode"] = "fused"
        return out
    # catch-up path (after a crash between the two commits): each lagging
    # store scans exactly its own missed files
    if new_idx:
        names = {os.path.basename(f) for f in new_idx}
        tf_delta = tokenize_tf(with_doc_id(spark.read.parquet(*new_idx)))
        out["index"] = _apply_index_delta(
            spark, tf_delta, idx_dir, cur, inc_idx | names, len(new_idx),
            cfg, retain,
        )
    if new_pos:
        names = {os.path.basename(f) for f in new_pos}
        out["positions"] = append_positions(
            spark,
            pos_dir,
            new_docs_corpus=with_doc_id(spark.read.parquet(*new_pos)),
            state_files={
                "incorporated.json": json.dumps(sorted(inc_pos | names))
            },
        )
    out["mode"] = "catchup"
    return out


def read_served_positions(spark: SparkSession, out_dir: str):
    """(positions DataFrame, term_buckets) of the corpus-update layout —
    the positional serving handle next to read_served_index(out_dir +
    '/index_store')."""
    from ..index.positions import read_positions

    return read_positions(spark, os.path.join(out_dir, "positions_store"))


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
