"""Supplementary benchmarks (guide §1.4) — bench.py itself is FROZEN for
measurement, so everything extra lives here:

- noop-sink isolation per headline query (times the computation via the
  noop data source, full-column materialization, no count() column pruning);
- serving-latency isolation: the same loop as bench.query_latency (the
  graded p50/p95 path) runnable standalone with a configurable corpus size;
- per-query job labels (setJobDescription) so the UI/event log is readable.

Usage:
  python bench_extra.py noop [names...]      # noop-sink headline timings
  python bench_extra.py latency [n_docs]     # bm25_topk_compressed p50/p95
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as for bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, corpus_parquet, query_latency  # noqa: E402


def run_noop(names: list[str]) -> None:
    from information_retrieval_project_spark import entry_queries as EQ
    from information_retrieval_project_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    for t in ("documents", "lineitem", "events", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    EQ.q_term_df(spark, sf_dir).count()
    out: dict[str, list[float]] = {}
    for name in names:
        reps = []
        for _ in range(2):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            df = EQ.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = reps
        print(f"# noop {name}: reps {reps}", file=sys.stderr)
    print(json.dumps({"metric": "noop_headline", "sf_dir": sf_dir, "queries": out}))
    spark.stop()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "noop"
    if mode == "latency":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        n_big = max(4, cpus // 2)
        corpus_parquet(n_docs)
        res = query_latency(n_docs, f"local[{n_big}]", n_big, n_queries=12)
        print(json.dumps({"metric": "query_latency_isolated", **res}))
    else:
        names = sys.argv[2:] or HEADLINE
        run_noop(names)


if __name__ == "__main__":
    main()
