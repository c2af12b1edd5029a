"""Positional index: per-(term, doc) token positions, delta+varbyte encoded,
and indexed phrase queries over it.

The reference engine is bag-of-words (its TF-IDF scorer never looks at
positions, data_manager.py:122-126); phrase search is the standard fulltext
extension (Manning et al., IIR ch.2 "positional postings") and the engine's
gate query `phrase_match_docs` already fixes the semantics corpus-side. This
module makes the same query INDEX-served: positions are materialized once at
build time, so a phrase query touches only its terms' position lists instead
of re-tokenizing the corpus.

Layout: one row per (term, doc_id) with the sorted position list
delta+varbyte encoded (positions are small monotone ints — deltas almost
always fit one byte). Rows group by (term, doc_id), so no group exceeds one
document's occurrences of one term — hot terms need no salting here; at
cluster scale the relation is written partitioned by the same term_bucket as
the main index for query-time pruning.

Phrase execution (n terms): decode each phrase term's lists to
(doc_id, pos - offset_in_phrase, slot) and count distinct slots per
(doc_id, aligned_pos) — a full house of n slots is a phrase hit. One shuffle
on (doc_id, aligned_pos); every stream is term-filtered before the decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import varbyte_decode, varbyte_encode

POS_SCHEMA = "term string, doc_id long, n_occ long, positions binary"


def build_positions(corpus_with_id: DataFrame) -> DataFrame:
    """corpus (with doc_id) → positional index (term, doc_id, n_occ,
    positions:binary), with ZERO shuffle: every position of a term within a
    doc lives in that doc's single content row, so the (term, doc_id) group
    is complete inside the Arrow batch — tokenize, group, delta+varbyte
    encode all happen map-side (the same no-shuffle property tokenize_tf
    exploits for tf). A groupBy formulation would shuffle one row per TOKEN;
    this emits one already-final row per (term, doc) pair."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.textnorm import _TOKEN_PATTERNS

        pat = _TOKEN_PATTERNS["code"]
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(np.int64)
            # null content = zero tokens (matches every other tokenize path);
            # without fillna, str.len() yields NaN which casts to INT64_MIN
            # and kills the task in np.repeat
            tok_lists = pdf["content"].fillna("").str.lower().str.findall(pat)
            lens = tok_lists.str.len().to_numpy(np.int64)
            total = int(lens.sum())
            if total == 0:
                continue
            doc_rep = np.repeat(ids, lens)
            terms = np.concatenate(
                [np.asarray(t, dtype=object) for t in tok_lists]
            )
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            # sort by (doc, term, pos) — pos least significant, so each
            # (doc, term) group's positions come out ascending
            order = np.lexsort((pos, terms, doc_rep))
            d, t, p = doc_rep[order], terms[order], pos[order]
            change = np.empty(d.size, dtype=bool)
            change[0] = True
            change[1:] = (d[1:] != d[:-1]) | (t[1:] != t[:-1])
            gs = np.flatnonzero(change)
            ge = np.append(gs[1:], d.size)
            out_t, out_d, out_n, out_b = [], [], [], []
            for s, e in zip(gs, ge):
                pp = p[s:e].astype(np.uint64)
                deltas = np.empty_like(pp)
                deltas[0] = pp[0]
                np.subtract(pp[1:], pp[:-1], out=deltas[1:])
                out_t.append(t[s])
                out_d.append(int(d[s]))
                out_n.append(int(e - s))
                out_b.append(varbyte_encode(deltas))
            yield pd.DataFrame(
                {
                    "term": out_t,
                    "doc_id": out_d,
                    "n_occ": out_n,
                    "positions": out_b,
                }
            )

    return corpus_with_id.select("doc_id", "content").mapInPandas(
        gen, POS_SCHEMA
    )


def write_positions(
    pos_idx: DataFrame, out_dir: str, term_buckets: int = 32
) -> None:
    """Persist the positional index partitioned by the shared term-bucket
    scheme (index/bucketing.py — same hash as the main index), with the
    modulus recorded next to the data.

    Data and sidecar live in ONE bundle directory published by a single
    rename, so no crash window can leave a modulus that mismatches the data
    (the class of silent-pruning bug ADVICE r1 flagged): worst case the
    bundle is briefly absent, which fails LOUDLY on read. At cluster scale
    the rename is an Iceberg/metastore snapshot commit (same protocol as
    streaming/incremental.py)."""
    import os
    import shutil

    from .bucketing import term_bucket_expr

    bundle = os.path.join(out_dir, "positions_bundle")
    tmp = os.path.join(out_dir, "_positions_staging")
    shutil.rmtree(tmp, ignore_errors=True)
    (
        pos_idx.withColumn("term_bucket", term_bucket_expr(term_buckets))
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(tmp, "data"))
    )
    meta = pos_idx.sparkSession.createDataFrame(
        [(int(term_buckets),)], "term_buckets int"
    )
    meta.coalesce(1).write.mode("overwrite").json(os.path.join(tmp, "meta"))
    old = bundle + "_old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(bundle):
        os.rename(bundle, old)
    os.rename(tmp, bundle)
    shutil.rmtree(old, ignore_errors=True)


def read_positions(spark: SparkSession, out_dir: str) -> tuple[DataFrame, int]:
    """(positions DataFrame, term_buckets). Raises on a corrupt sidecar
    (assuming a wrong modulus would silently drop valid rows)."""
    import os

    from pyspark.errors import AnalysisException

    bundle = os.path.join(out_dir, "positions_bundle")
    try:
        rows = spark.read.json(os.path.join(bundle, "meta")).collect()
    except AnalysisException as e:
        if "CORRUPT_RECORD" in str(e):
            raise ValueError(f"corrupt positions_meta in {out_dir}") from e
        raise
    if not rows or "term_buckets" not in rows[0].asDict() or rows[0]["term_buckets"] is None:
        raise ValueError(f"corrupt positions_meta in {out_dir}")
    return (
        spark.read.parquet(os.path.join(bundle, "data")),
        int(rows[0]["term_buckets"]),
    )


def prune_terms(
    pos_idx: DataFrame, terms: list[str], term_buckets: int | None = None
) -> DataFrame:
    """Shared-scheme term+bucket pruning (index/bucketing.prune_terms);
    the modulus MUST be the stored one — read_positions returns it."""
    from .bucketing import prune_terms as _prune

    return _prune(pos_idx, terms, term_buckets)


def decode_position_rows(rows: DataFrame) -> DataFrame:
    """(term, doc_id, positions) → exploded (term, doc_id, pos), one Arrow
    pass (inverse of build_positions' encode)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, docs, poss = [], [], []
            for term, doc, buf in zip(
                pdf["term"].values, pdf["doc_id"].values, pdf["positions"].values
            ):
                p = np.cumsum(varbyte_decode(bytes(buf)), dtype=np.uint64)
                terms.append(np.full(p.size, term, dtype=object))
                docs.append(np.full(p.size, doc, dtype=np.int64))
                poss.append(p.astype(np.int64))
            if terms:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms),
                        "doc_id": np.concatenate(docs),
                        "pos": np.concatenate(poss),
                    }
                )

    return rows.select("term", "doc_id", "positions").mapInPandas(
        gen, "term string, doc_id long, pos long"
    )


def proximity_match_indexed(
    spark: SparkSession,
    pos_idx: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    term_buckets: int | None = None,
) -> DataFrame:
    """Docs where term_a and term_b occur within `window` tokens →
    (doc_id, min_dist) — the proximity-ranking primitive. Decode is pruned
    to the two terms; the per-doc join of their position lists is bounded by
    occurrence counts, then one aggregate takes the minimum distance.
    term_a == term_b means two DISTINCT occurrences of the term within the
    window (self-pairs at distance 0 are excluded). term_buckets: stored
    index's bucket modulus (read_positions) for partition pruning."""
    occ = decode_position_rows(
        prune_terms(pos_idx, [term_a, term_b], term_buckets)
    )
    a = occ.filter(F.col("term") == term_a).select("doc_id", F.col("pos").alias("pa"))
    b = occ.filter(F.col("term") == term_b).select("doc_id", F.col("pos").alias("pb"))
    pairs = a.join(b, "doc_id")
    if term_a == term_b:
        pairs = pairs.filter(F.col("pa") != F.col("pb"))
    return (
        pairs.select("doc_id", F.abs(F.col("pa") - F.col("pb")).alias("dist"))
        .groupBy("doc_id")
        .agg(F.min("dist").alias("min_dist"))
        .filter(F.col("min_dist") <= window)
    )


def phrase_match_indexed(
    spark: SparkSession,
    pos_idx: DataFrame,
    phrase: list[str],
    term_buckets: int | None = None,
) -> DataFrame:
    """Exact phrase hits from the positional index → (doc_id, n_matches).

    Matches the corpus-side semantics of entry_queries.q_phrase_match_docs
    for any phrase length (including repeated terms): term i must occur at
    aligned position p for every slot i. Plan: term-pruned index scan →
    decode → broadcast the (term, slot) relation → count distinct slots per
    (doc_id, aligned position)."""
    if not phrase:
        raise ValueError("empty phrase")
    slots = spark.createDataFrame(
        [(t, i) for i, t in enumerate(phrase)], "term string, slot int"
    )
    occ = decode_position_rows(prune_terms(pos_idx, phrase, term_buckets))
    aligned = occ.join(F.broadcast(slots), "term").select(
        "doc_id", (F.col("pos") - F.col("slot")).alias("apos"), "slot"
    )
    hits = (
        aligned.groupBy("doc_id", "apos")
        .agg(F.count_distinct("slot").alias("_n"))
        .filter(F.col("_n") == len(phrase))
    )
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_matches"))
