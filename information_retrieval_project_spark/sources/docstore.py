"""External-store scan as a custom Python DataSource (pyspark 4 API).

The reference enriches its corpus from three external stores, all consumed
row-at-a-time in Python loops:
- MongoDB collection scan (`db.find({"_id": ObjectId(obj)})` per doc,
  /root/reference/python/data_manager.py:32, 40-54),
- schema.org web scrape per URL (data_manager.py:150-162),
- USDA FoodData REST lookup per ingredient (data_manager.py:265-281).

Those endpoints are non-deterministic external I/O and stay out of scope
(SURVEY.md §2.1 S3-S5), but the Spark-idiomatic SHAPE for any of them is the
same and is realized here concretely: a custom `DataSource` that declares a
schema up front and exposes the store as N input partitions (shards / cursor
ranges / key ranges) that executors read in parallel — then enrichment is a
broadcast JOIN against the scanned store, never a per-row lookup. The store
contents are synthesized deterministically from a seed so the source is
exactly testable in this sandbox; swapping `_shard_rows` for a real client
call (one cursor per partition) is the production path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# mirrors the reference's USDA foodCategory vocabulary role
# (data_manager.py:276-278 extracts js['foods'][0]['foodCategory'])
CATEGORIES = [
    "vegetable", "fruit", "grain", "dairy", "protein",
    "spice", "oil", "sweetener",
]


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def _shard_rows(shard: int, rows_per_shard: int, seed: int):
    """Deterministic fake 'collection shard': (doc_key, category, payload).
    In production this body is the store client reading one cursor range."""
    for i in range(rows_per_shard):
        key = f"k{shard:03d}_{i:05d}"
        h = _h(f"{seed}:{key}")
        yield (
            key,
            CATEGORIES[h % len(CATEGORIES)],
            f"payload_{h % 10_000}",
        )


class DocStoreReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_shards = int(options.get("shards", 4))
        self.rows_per_shard = int(options.get("rows_per_shard", 100))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        # one InputPartition per store shard → Spark schedules one task per
        # shard; this is what turns "an external store" into parallel scan
        return [InputPartition(i) for i in range(self.n_shards)]

    def read(self, partition: InputPartition):
        yield from _shard_rows(partition.value, self.rows_per_shard, self.seed)


class DocStoreDataSource(DataSource):
    """`spark.read.format("fake_docstore").option("shards", 8).load()`."""

    @classmethod
    def name(cls) -> str:
        return "fake_docstore"

    def schema(self) -> str:
        return "doc_key string, category string, payload string"

    def reader(self, schema) -> DocStoreReader:
        return DocStoreReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(DocStoreDataSource)


def read_docstore(
    spark: SparkSession, shards: int = 4, rows_per_shard: int = 100, seed: int = 42
) -> DataFrame:
    register(spark)
    return (
        spark.read.format("fake_docstore")
        .option("shards", shards)
        .option("rows_per_shard", rows_per_shard)
        .option("seed", seed)
        .load()
    )


def usda_query_url(col, base: str = "https://api.nal.usda.gov/fdc/v1/foods/search?query="):
    """SURVEY.md F14→F6: the reference's URL-munging replace chain
    (data_manager.py:268-272: ',' → '%20', '/' → ',', '\"' → ',', ' ' → '')
    as native column functions — the request itself stays out of scope
    (non-deterministic I/O); this is the query-string constructor a
    mapInPandas/DataSource enrichment stage would consume."""
    munged = F.regexp_replace(col, ",", "%20")
    munged = F.regexp_replace(munged, "/", ",")
    munged = F.regexp_replace(munged, '"', ",")
    munged = F.regexp_replace(munged, " ", "")
    return F.concat(F.lit(base), munged)


def enrich_with_docstore(
    df: DataFrame, store: DataFrame, key_col: str, store_key: str = "doc_key"
) -> DataFrame:
    """The enrichment join replacing the reference's per-row lookups
    (data_manager.py:40-54 loops db.find per doc): broadcast the (small)
    store side and equi-join — one scan, zero per-row I/O."""
    return df.join(
        F.broadcast(store), df[key_col] == store[store_key], "left"
    ).drop(store_key)
