"""Inverted-index build: corpus → postings + stats, Spark-first.

Dataflow (SURVEY.md §3.2; replaces the reference's per-query TfidfVectorizer
refit, data_manager.py:122-123, with a build-once index):

  scan (repo,path,commit,lang,content)
    → doc_id = xxhash64(repo,path,commit), content_sha = sha2(content,256)
    → mapInPandas tokenize+count  ···· (doc_id, term, tf) with NO (doc,term)
      shuffle: tf is finished inside the Arrow batch (map-side complete)
    → doc_stats  = groupBy(doc_id).sum(tf)           [hash agg, AQE coalesce]
    → df per term= groupBy(term).count()             [partial+final agg —
      skew-safe: map-side partial bounds hot-term rows at one per task]
    → SALTED posting encode: hot terms (df > hot_df_threshold) are split into
      pmod(xxhash64(doc_id), n_salts) sub-groups so no single Arrow group
      exceeds memory; each sub-group encodes a sorted delta+varbyte run;
      a second per-term merge pass combines sub-runs (merge_sorted_runs).
      Cold terms take the 1-salt path and skip nothing. This is the explicit
      skew handling required by BASELINE.json north_rule (AQE skew-join covers
      joins, not groupBy hot keys — SURVEY.md §4.2).
    → index(term, df, postings:binary, bm_docs:binary, bm_tfs:binary)
    → collection_stats(n_docs, avgdl, total_terms)

All row-wise compute is vectorized pandas/Arrow (input_hint rule).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import normalize_tokenize
from .codec import block_max_meta, decode_postings, encode_postings, merge_sorted_runs, varbyte_encode

TF_SCHEMA = "doc_id long, term string, tf long"
INDEX_SCHEMA = "term string, df long, max_tf long, postings binary, bm_docs binary, bm_tfs binary"
_RUN_SCHEMA = "term string, salt int, postings binary"


def with_doc_id(corpus: DataFrame) -> DataFrame:
    """Stable 64-bit doc id + the per-row content invariant column.

    doc_id = xxhash64(repo,path,commit) (SURVEY.md §7.0); content_sha is the
    sha256 invariant from BASELINE.json input_hint, checked in tests.
    """
    return corpus.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha", F.sha2("content", 256))


def tokenize_tf(
    corpus_with_id: DataFrame,
    strategy: str = "code",
    stem: bool = False,
    stopwords: bool = False,
) -> DataFrame:
    """(doc_id, content) → (doc_id, term, tf), tf finished map-side.

    Per-doc term counting happens inside the Arrow batch via np.unique —
    no (doc_id, term) shuffle is ever needed, which at 10^12 files removes
    the single largest shuffle of the naive explode+groupBy plan.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_term, out_tf = [], [], []
            for doc_id, content in zip(pdf["doc_id"].values, pdf["content"].values):
                toks = normalize_tokenize(
                    content, strategy, stem=stem, stopwords=stopwords
                )
                if not toks:
                    continue
                terms, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
                out_doc.append(np.full(terms.size, doc_id, dtype=np.int64))
                out_term.append(terms)
                out_tf.append(counts.astype(np.int64))
            if out_doc:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(out_doc),
                        "term": np.concatenate(out_term),
                        "tf": np.concatenate(out_tf),
                    }
                )

    return corpus_with_id.select("doc_id", "content").mapInPandas(gen, TF_SCHEMA)


def doc_stats(tf_df: DataFrame) -> DataFrame:
    return tf_df.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))


def collection_stats(doc_stats_df: DataFrame) -> DataFrame:
    return doc_stats_df.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_terms"),
    )


@dataclass(frozen=True)
class BuildConfig:
    hot_df_threshold: int = 100_000   # postings longer than this get salted
    docs_per_salt: int = 50_000       # target run length per salted sub-group
    strategy: str = "code"
    stem: bool = False
    stopwords: bool = False


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: one (term, salt) group → one encoded sorted run."""
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    d = pdf["doc_id"].values.astype(np.int64)
    t = pdf["tf"].values.astype(np.int64)
    order = np.argsort(d, kind="stable")
    return pd.DataFrame(
        {"term": [term], "salt": [salt], "postings": [encode_postings(d[order], t[order])]}
    )


def _merge_term(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: merge the salted runs of one term into the final posting
    list + block-max metadata."""
    term = pdf["term"].iloc[0]
    runs = [decode_postings(bytes(b)) for b in pdf["postings"].values]
    if len(runs) == 1:
        d, t = runs[0]
    else:
        d, t = merge_sorted_runs(runs)
    bm_d, bm_t = block_max_meta(d, t)
    return pd.DataFrame(
        {
            "term": [term],
            "df": [int(d.size)],
            "max_tf": [int(t.max()) if t.size else 0],
            "postings": [encode_postings(d, t)],
            "bm_docs": [varbyte_encode((bm_d.astype(np.uint64) + np.uint64(1 << 63)))],
            "bm_tfs": [varbyte_encode(bm_t.astype(np.uint64))],
        }
    )


def build_postings(tf_df: DataFrame, cfg: BuildConfig = BuildConfig()) -> DataFrame:
    """tf triples → compressed index with explicit hot-term salting."""
    df_per_term = tf_df.groupBy("term").agg(F.count("*").alias("df"))
    hot = (
        df_per_term.filter(F.col("df") > cfg.hot_df_threshold)
        .withColumn(
            "n_salts",
            F.greatest(
                F.lit(2), F.ceil(F.col("df") / cfg.docs_per_salt).cast("int")
            ),
        )
        .select("term", "n_salts")
    )
    salted = (
        tf_df.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_salts").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n_salts")
    )
    runs = salted.groupBy("term", "salt").applyInPandas(_encode_group, _RUN_SCHEMA)
    return runs.groupBy("term").applyInPandas(_merge_term, INDEX_SCHEMA)


def build_index(
    corpus: DataFrame, cfg: BuildConfig = BuildConfig()
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full build. Returns (index, doc_stats, collection_stats)."""
    ids = with_doc_id(corpus)
    tf_df = tokenize_tf(ids, cfg.strategy, cfg.stem, cfg.stopwords)
    ds = doc_stats(tf_df)
    cs = collection_stats(ds)
    idx = build_postings(tf_df, cfg)
    return idx, ds, cs


def write_index(
    idx: DataFrame,
    ds: DataFrame,
    cs: DataFrame,
    out_dir: str,
    term_buckets: int = 32,
) -> None:
    """Persist the index partitioned by a stable term-hash bucket so query-time
    term lookups prune partitions (SURVEY.md §4.2 partition pruning)."""
    (
        idx.withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)))
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{out_dir}/index")
    )
    ds.write.mode("overwrite").parquet(f"{out_dir}/doc_stats")
    cs.write.mode("overwrite").parquet(f"{out_dir}/collection_stats")


def read_index(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{out_dir}/index"),
        spark.read.parquet(f"{out_dir}/doc_stats"),
        spark.read.parquet(f"{out_dir}/collection_stats"),
    )
