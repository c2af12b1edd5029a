"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in information_retrieval_project_spark.entry_queries;
this module is the thin registry the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from information_retrieval_project_spark import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 over the sf0.001 documents corpus."""
    return EQ.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLE_SQL)
