"""Checkpoint-resumable index build with per-partition lineage + metrics.

north_rule requirement: the build must be resumable from checkpoint with
per-partition lineage and index-throughput metrics. Design (SURVEY.md §4.2,
§7.1 M5):

- The corpus is split into BUILD UNITS by a stable hash of the row key
  (pmod(xxhash64(repo, path), n_units)) — a deterministic, data-independent
  partitioning, so a resumed run sees exactly the same units.
- Each unit's tokenize→tf stage is written to its own parquet directory via
  an ATOMIC commit: write to `_tmp_unit=<i>`, then rename to `unit=<i>`.
  Spark task retries inside the unit are already safe (parquet job commit);
  the rename makes the *unit* commit atomic against driver crashes.
- A lineage manifest (JSON lines, one per unit) records an input fingerprint
  (order-independent bit_xor of xxhash64(repo,path,commit,content) plus the
  row count), row/term counts, wall time, and throughput — append-only,
  written after the rename, so `manifest ⊆ committed units` always holds.
- Resume = skip units whose manifest fingerprint matches the CURRENT input
  (one slim groupBy(build_unit) hash pass recomputes all unit fingerprints);
  units built from since-changed input are invalidated and rebuilt
  (ADVICE r1). The final posting build reads all unit outputs (a plain
  parquet scan) and is itself idempotent (mode=overwrite on the index
  output).

At cluster scale each unit is a chunk of input partitions, the manifest
lives on the object store, and Iceberg snapshot commits would replace the
rename — same protocol, same idempotence argument.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import (
    BuildConfig,
    build_postings,
    collection_stats,
    doc_stats,
    tokenize_tf,
    with_doc_id,
)


@dataclass
class UnitMetric:
    unit: int
    n_docs: int
    n_tf_rows: int
    seconds: float
    docs_per_sec: float


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage_manifest.jsonl")


def load_manifest(out_dir: str) -> dict[int, dict]:
    path = _manifest_path(out_dir)
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    done[rec["unit"]] = rec
    return done


def resumable_build(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    n_units: int = 8,
    cfg: BuildConfig = BuildConfig(),
    fail_after_units: int | None = None,
) -> list[UnitMetric]:
    """Tokenize the corpus unit-by-unit with checkpoint/resume; then build the
    final index from the committed units. Returns per-unit metrics for the
    units processed in THIS invocation (resumed units are skipped).

    fail_after_units: test hook — raise after N unit commits to simulate a
    mid-build crash.
    """
    os.makedirs(out_dir, exist_ok=True)
    tf_root = os.path.join(out_dir, "tf_units")
    os.makedirs(tf_root, exist_ok=True)
    done = load_manifest(out_dir)
    ids = with_doc_id(corpus).withColumn(
        "build_unit", F.pmod(F.xxhash64("repo", "path"), F.lit(n_units))
    )
    # One slim pass computes every unit's input fingerprint: row count +
    # order-independent bit_xor of the full-row hash. A manifest entry only
    # skips its unit if the fingerprint still matches — a resumed run against
    # changed input rebuilds the stale units instead of silently keeping them.
    fps = {
        r["build_unit"]: (r["n"], r["fp"])
        for r in ids.groupBy("build_unit")
        .agg(
            F.count("*").alias("n"),
            F.bit_xor(
                F.xxhash64("repo", "path", "commit", "content")
            ).alias("fp"),
        )
        .collect()
    }
    metrics: list[UnitMetric] = []
    processed = 0
    for unit in range(n_units):
        n_docs, input_fp = fps.get(unit, (0, 0))
        prev = done.get(unit)
        if (
            prev is not None
            and prev.get("input_fp") == input_fp
            and prev.get("n_docs") == n_docs
        ):
            continue
        t0 = time.time()
        part = ids.filter(F.col("build_unit") == unit)
        tf_df = tokenize_tf(part, cfg.strategy, cfg.stem, cfg.stopwords)
        tmp = os.path.join(tf_root, f"_tmp_unit={unit}")
        final = os.path.join(tf_root, f"unit={unit}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # leftovers from a crashed attempt
        tf_df.write.mode("overwrite").parquet(tmp)
        n_tf = spark.read.parquet(tmp).count()
        if os.path.exists(final):
            shutil.rmtree(final)  # uncommitted (not in manifest) → replace
        os.rename(tmp, final)  # atomic unit commit
        dt = time.time() - t0
        m = UnitMetric(unit, n_docs, n_tf, dt, n_docs / dt if dt > 0 else 0.0)
        with open(_manifest_path(out_dir), "a") as f:
            f.write(
                json.dumps(
                    {
                        "unit": unit,
                        "input_fp": input_fp,
                        "n_docs": m.n_docs,
                        "n_tf_rows": m.n_tf_rows,
                        "seconds": round(m.seconds, 3),
                        "docs_per_sec": round(m.docs_per_sec, 2),
                        "ts": time.time(),
                    }
                )
                + "\n"
            )
        metrics.append(m)
        processed += 1
        if fail_after_units is not None and processed >= fail_after_units:
            raise RuntimeError(f"simulated crash after {processed} units")
    return metrics


def finalize_index(
    spark: SparkSession, out_dir: str, cfg: BuildConfig = BuildConfig()
) -> None:
    """Build postings + stats from all committed units (idempotent)."""
    tf_df = spark.read.parquet(os.path.join(out_dir, "tf_units"))
    tf_df = tf_df.select("doc_id", "term", "tf")
    ds = doc_stats(tf_df)
    idx = build_postings(tf_df, cfg)
    idx.write.mode("overwrite").parquet(os.path.join(out_dir, "index"))
    ds.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_stats"))
    collection_stats(ds).write.mode("overwrite").parquet(
        os.path.join(out_dir, "collection_stats")
    )
