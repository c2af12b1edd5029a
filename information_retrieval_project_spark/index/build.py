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
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .codec import block_max_meta, encode_postings, varbyte_encode

TF_SCHEMA = "doc_id long, term string, tf long"

# native split patterns per tokenizer strategy: split on the complement of
# the token class == findall of the class (empties filtered)
_SPLIT_PATTERNS = {
    "code": "[^a-z0-9_]+",
    "gensim": "[^a-z]+",
    "nltk": "[^a-z0-9_]+",  # \w+ on lowered ascii text
    "keras": r"\s+",
}
INDEX_SCHEMA = "term string, df long, max_tf long, postings binary, bm_docs binary, bm_tfs binary"


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
    """(doc_id, content) → (doc_id, term, tf), tf finished inside the batch.

    Default path is mapInArrow over pure Arrow C++ kernels
    (utf8_lower → split_pattern_regex → list_flatten/list_parent_indices →
    Acero hash group_by): no Python objects in the loop at all. Measured
    ladder at 600k docs, local[8] (BENCH notes): native explode+groupBy
    ≈ slowest (Java regex + 100M-row explosion), pandas str.findall 16.0 s,
    Arrow kernels 5.96 s — and the Arrow path strong-scales at ~0.76/stage
    where the pandas path was memory-bandwidth bound at ~0.45. The
    (doc_id, term) reduction finishes inside the batch, so the only
    downstream shuffles are the slim tf triples.

    Parity mode (stem/stopwords — the reference-shaped pipeline,
    data_manager.py:74-88) runs the frozen Python normalizer in a pandas
    pass instead; it shares code with the oracle by construction.
    """
    if not stem and not stopwords:
        split_pat = _SPLIT_PATTERNS[strategy]

        def gen_arrow(batches):
            import pyarrow as pa
            import pyarrow.compute as pc

            # Spark owns parallelism: one Arrow CPU thread per task worker.
            # Arrow's default pool is os.cpu_count() wide, so every task
            # would otherwise fan out machine-wide — oversubscribing the
            # executor and silently breaking task-level scaling measurements.
            pa.set_cpu_count(1)

            for batch in batches:
                tbl = pa.Table.from_batches([batch])
                low = pc.utf8_lower(tbl["content"].combine_chunks())
                toks = pc.split_pattern_regex(low, split_pat)
                flat = pc.list_flatten(toks)
                parents = pc.list_parent_indices(toks)
                doc_ids = pc.take(tbl["doc_id"].combine_chunks(), parents)
                t = pa.table({"doc_id": doc_ids, "term": flat})
                t = t.filter(pc.not_equal(t["term"], ""))
                agg = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
                yield from agg.rename_columns(["doc_id", "term", "tf"]).to_batches()

        return corpus_with_id.select("doc_id", "content").mapInArrow(
            gen_arrow, TF_SCHEMA
        )

    from ..functions.textnorm import _TOKEN_PATTERNS, clean_normalize

    pat = _TOKEN_PATTERNS[strategy]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["content"].map(
                lambda t: clean_normalize(t, stem=stem, stopwords=stopwords)
            )
            tok_lists = texts.str.lower().str.findall(pat)
            lens = tok_lists.str.len().to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                continue
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(np.int64), lens)
            terms = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
            out = (
                pd.DataFrame({"doc_id": doc_ids, "term": terms})
                .groupby(["doc_id", "term"], sort=False)
                .size()
                .rename("tf")
                .reset_index()
            )
            yield out

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
    # heavy-hitter detection runs on a sample (classic sketch-style
    # detection): a term missed near the threshold just takes the 1-salt
    # path — salting is a memory-bound mechanism, never a correctness one,
    # and the sampled pass is ~1/sample_rate cheaper than a full df agg.
    hot_detection_sample: float = 0.02
    # segment_hot_terms=True keeps each salted run as its OWN index row
    # (term, segment, postings) instead of merging to one row per term —
    # bounding every Arrow row/array by docs_per_salt. Required at true
    # 10^12-file scale where one hot term's full posting list cannot live in
    # a single row; df on every segment row is the TERM-TOTAL df so idf is
    # computable from any segment. Query paths sum per-doc contributions
    # across segments (each doc lives in exactly one segment).
    segment_hot_terms: bool = False
    strategy: str = "code"
    stem: bool = False
    stopwords: bool = False


def _encode_pairs_udf():
    """Series→Series Arrow UDF: (sorted doc_id array, tf array) → struct of
    encoded postings + block-max metadata. Per-term work is pure numpy —
    no per-group pandas machinery (applyInPandas costs ~ms per group; at
    millions of terms that dominates the build)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("postings binary, bm_docs binary, bm_tfs binary")
    def encode(doc_arrs: pd.Series, tf_arrs: pd.Series) -> pd.DataFrame:
        post, bmd, bmt = [], [], []
        for d, t in zip(doc_arrs.values, tf_arrs.values):
            d = np.asarray(d, dtype=np.int64)
            t = np.asarray(t, dtype=np.int64)
            bm_d, bm_t = block_max_meta(d, t)
            post.append(encode_postings(d, t))
            bmd.append(varbyte_encode(bm_d.astype(np.uint64) + np.uint64(1 << 63)))
            bmt.append(varbyte_encode(bm_t.astype(np.uint64)))
        return pd.DataFrame({"postings": post, "bm_docs": bmd, "bm_tfs": bmt})

    return encode


def detect_hot_terms(
    tf_df: DataFrame, cfg: BuildConfig, scale: float | None = None
) -> DataFrame:
    """(term, n_salts) for terms whose estimated df exceeds the threshold.

    Sampled heavy-hitter detection (classic sketch-style): a term missed near
    the threshold just takes the 1-salt path — salting is a memory-bound
    mechanism, never a correctness one.

    scale: when tf_df is ALREADY a sample of the corpus, pass its sampling
    fraction so counts are scaled up (count/scale) instead of re-sampling;
    when None, cfg.hot_detection_sample row-samples tf_df here."""
    if scale is None:
        sample = cfg.hot_detection_sample
        if 0 < sample < 1:
            tf_df = tf_df.sample(fraction=sample, seed=42)
            scale = sample
        else:
            scale = 1.0
    df_est = tf_df.groupBy("term").agg((F.count("*") / scale).alias("df"))
    return (
        df_est.filter(F.col("df") > cfg.hot_df_threshold)
        .withColumn(
            "n_salts",
            F.greatest(
                F.lit(2), F.ceil(F.col("df") / cfg.docs_per_salt).cast("int")
            ),
        )
        .select("term", "n_salts")
    )


def build_postings(
    tf_df: DataFrame,
    cfg: BuildConfig = BuildConfig(),
    hot: DataFrame | None = None,
) -> DataFrame:
    """tf triples → compressed index with explicit hot-term salting.

    Shuffle/skew profile: stage 1 groups by (term, salt) so no single
    reduce-side group exceeds ~docs_per_salt rows even for `def`/`import`
    grade hot terms; stage 2 re-groups the (few, pre-aggregated) salted runs
    per term — rows shuffled there = number of sub-runs, not postings. All
    grouping/sorting is JVM hash-agg + array_sort; Python only encodes the
    final arrays through one Arrow pass.

    hot: optional precomputed (term, n_salts) — build_index passes a
    corpus-sample estimate so the broadcast pre-job doesn't force a full
    tokenize pass before the main build starts (VERDICT r1: the detection
    job was the build's fixed serial share).
    """
    if hot is None:
        hot = detect_hot_terms(tf_df, cfg)
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
    runs = salted.groupBy("term", "salt").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias("pairs")
    )
    enc = _encode_pairs_udf()
    if cfg.segment_hot_terms:
        # one index row per (term, segment): every array bounded by
        # ~docs_per_salt; df = term total via a window sum over segments
        w = Window.partitionBy("term")
        seg = runs.select(
            "term",
            F.col("salt").alias("segment"),
            F.size("pairs").alias("seg_df"),
            F.array_max(F.col("pairs").getField("tf")).alias("max_tf"),
            F.col("pairs").getField("doc_id").alias("_docs"),
            F.col("pairs").getField("tf").alias("_tfs"),
        ).withColumn("df", F.sum("seg_df").over(w))
        return seg.withColumn("_enc", enc(F.col("_docs"), F.col("_tfs"))).select(
            "term",
            "segment",
            "df",
            "max_tf",
            F.col("_enc.postings").alias("postings"),
            F.col("_enc.bm_docs").alias("bm_docs"),
            F.col("_enc.bm_tfs").alias("bm_tfs"),
        )
    merged = (
        runs.groupBy("term")
        .agg(F.array_sort(F.flatten(F.collect_list("pairs"))).alias("pairs"))
        .select(
            "term",
            F.size("pairs").alias("df"),
            F.array_max(F.col("pairs").getField("tf")).alias("max_tf"),
            F.col("pairs").getField("doc_id").alias("_docs"),
            F.col("pairs").getField("tf").alias("_tfs"),
        )
    )
    return merged.withColumn("_enc", enc(F.col("_docs"), F.col("_tfs"))).select(
        "term",
        "df",
        "max_tf",
        F.col("_enc.postings").alias("postings"),
        F.col("_enc.bm_docs").alias("bm_docs"),
        F.col("_enc.bm_tfs").alias("bm_tfs"),
    )


def build_index(
    corpus: DataFrame,
    cfg: BuildConfig = BuildConfig(),
    cache: bool = True,
    positions: bool = False,
) -> tuple[DataFrame, ...]:
    """Full build. Returns (index, doc_stats, collection_stats), plus the
    positional index (term, doc_id, n_occ, positions) as a 4th element when
    positions=True.

    tf is persisted by default: three downstream consumers (doc_stats,
    collection_stats, postings) would otherwise each re-tokenize the corpus.
    On a cluster build this materialization is the tf-unit parquet write of
    pipelines/lineage.py; in-memory persist is the single-job equivalent.

    positions=True (VERDICT r3 #4): ONE fused tokenize pass
    (index/positions.tokenize_tf_positions) emits (doc_id, term, tf,
    positions) — tf and the positional index are projections of the same
    materialized relation, so an index+positions deployment scans and
    tokenizes the corpus ONCE instead of paying the dominant stage twice.
    Not supported with stem/stopwords parity mode (positions are defined on
    the raw token stream)."""
    ids = with_doc_id(corpus)
    pos_idx = None
    if positions:
        if cfg.stem or cfg.stopwords:
            raise ValueError(
                "positions=True requires the raw token stream "
                "(stem/stopwords parity mode unsupported)"
            )
        from .positions import tokenize_tf_positions

        fused = tokenize_tf_positions(ids, cfg.strategy)
        if cache:
            fused = fused.persist()
        tf_df = fused.select("doc_id", "term", "tf")
        pos_idx = fused.select(
            "term", "doc_id", F.col("tf").alias("n_occ"), "positions"
        )
    else:
        tf_df = tokenize_tf(ids, cfg.strategy, cfg.stem, cfg.stopwords)
        if cache:
            tf_df = tf_df.persist()
    ds = doc_stats(tf_df)
    cs = collection_stats(ds)
    # Hot-term detection from a DOC sample of the corpus, not from tf_df:
    # sampling tf_df would force the broadcast pre-job to tokenize the whole
    # corpus before the main build starts (it was the build's fixed serial
    # share); tokenizing hot_detection_sample of the docs costs ~1/sample of
    # that. Per-doc (term, doc) pair counts / sample is the same unbiased df
    # estimator either way.
    sample = cfg.hot_detection_sample
    if 0 < sample < 1:
        sampled_tf = tokenize_tf(
            ids.sample(fraction=sample, seed=42),
            cfg.strategy, cfg.stem, cfg.stopwords,
        )
        hot = detect_hot_terms(sampled_tf, cfg, scale=sample)
        idx = build_postings(tf_df, cfg, hot=hot)
    else:
        idx = build_postings(tf_df, cfg)
    if positions:
        return idx, ds, cs, pos_idx
    return idx, ds, cs


def write_index(
    idx: DataFrame,
    ds: DataFrame,
    cs: DataFrame,
    out_dir: str,
    term_buckets: int = 32,
    fmt: str = "parquet",
) -> None:
    """Persist the index partitioned by a stable term-hash bucket so query-time
    term lookups prune partitions (SURVEY.md §4.2 partition pruning). The
    bucket count is recorded in an `index_meta` sidecar — the query path must
    hash query terms with the SAME modulus or pruning silently drops valid
    postings (ADVICE r1).

    fmt: "parquet" (default; the sandbox has no Iceberg jars) or "iceberg"
    (north_rule target layout — path-based HadoopTables; on a real cluster
    the atomic-snapshot commit replaces the rename protocol of
    pipelines/lineage.py, see its module docstring). Identical layout and
    partitioning either way; read back with read_index(fmt=...)."""
    from .bucketing import term_bucket_expr

    (
        idx.withColumn("term_bucket", term_bucket_expr(term_buckets))
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .format(fmt)
        .save(f"{out_dir}/index")
    )
    ds.write.mode("overwrite").format(fmt).save(f"{out_dir}/doc_stats")
    cs.write.mode("overwrite").format(fmt).save(f"{out_dir}/collection_stats")
    meta = idx.sparkSession.createDataFrame(
        [(int(term_buckets), fmt)], "term_buckets int, fmt string"
    )
    meta.coalesce(1).write.mode("overwrite").json(f"{out_dir}/index_meta")


def read_index_meta(spark: SparkSession, out_dir: str) -> dict:
    """Sidecar layout metadata; {'term_buckets': 32, 'fmt': 'parquet'}
    fallback ONLY for indexes written before the sidecar existed (path
    absent). A sidecar that exists but cannot be parsed raises: silently
    assuming 32 buckets against an index written with a different modulus
    would reintroduce the pruning bug (valid postings dropped) the sidecar
    prevents (ADVICE r2)."""
    from pyspark.errors import AnalysisException

    meta_path = f"{out_dir}/index_meta"
    try:
        rows = spark.read.json(meta_path).collect()
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return {"term_buckets": 32, "fmt": "parquet"}  # legacy layout
        if "CORRUPT_RECORD" in msg:  # unparseable JSON in an existing sidecar
            raise ValueError(
                f"corrupt index_meta sidecar at {meta_path}: {msg[:200]}"
            ) from e
        raise
    if not rows or "term_buckets" not in rows[0].asDict() or rows[0]["term_buckets"] is None:
        raise ValueError(
            f"corrupt index_meta sidecar at {meta_path}: "
            f"{rows[0].asDict() if rows else 'no rows'}"
        )
    d = rows[0].asDict()
    return {
        "term_buckets": int(d["term_buckets"]),
        "fmt": d.get("fmt") or "parquet",
    }


def read_index(
    spark: SparkSession, out_dir: str, fmt: str = "parquet"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    r = spark.read.format(fmt)
    return (
        r.load(f"{out_dir}/index"),
        r.load(f"{out_dir}/doc_stats"),
        r.load(f"{out_dir}/collection_stats"),
    )
