"""spark-submit entry point for the index build (north_rule launch mode).

Usage:
    tools/spark_submit.sh [--docs N] [--out DIR] [--units U]

Builds the synthetic input_hint corpus, runs the checkpoint-resumable build,
finalizes the compressed index, and prints JSON metrics. Re-running with the
same --out resumes from the lineage manifest.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10000)
    ap.add_argument("--out", default="/tmp/ir_spark_index")
    ap.add_argument("--units", type=int, default=8)
    args = ap.parse_args()

    # imports resolved from the --py-files zip on the executors
    from pyspark.sql import SparkSession

    from information_retrieval_project_spark.corpus import generate_corpus
    from information_retrieval_project_spark.index.build import BuildConfig
    from information_retrieval_project_spark.pipelines.lineage import (
        finalize_index,
        load_manifest,
        resumable_build,
    )

    spark = SparkSession.builder.appName("ir-index-build").getOrCreate()
    t0 = time.time()
    corpus = generate_corpus(spark, args.docs)
    metrics = resumable_build(spark, corpus, args.out, n_units=args.units, cfg=BuildConfig())
    finalize_index(spark, args.out)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "n_docs": args.docs,
                "units_built_this_run": len(metrics),
                "units_total": len(load_manifest(args.out)),
                "seconds": round(dt, 2),
                "files_per_sec": round(args.docs / dt, 2),
                "out": args.out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
