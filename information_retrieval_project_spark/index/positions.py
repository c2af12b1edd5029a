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


def _positions_relation(corpus_with_id: DataFrame) -> DataFrame:
    """(doc_id, pos, term) via the frozen default pipeline
    (functions/textnorm semantics: split(lower(x), '[^a-z0-9_]+'))."""
    toks = F.filter(
        F.split(F.lower(F.col("content")), "[^a-z0-9_]+"), lambda x: x != ""
    )
    return corpus_with_id.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    )


def _encode_positions_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def enc(plists: pd.Series) -> pd.Series:
        out = []
        for p in plists.values:
            a = np.asarray(p, dtype=np.uint64)
            deltas = np.empty_like(a)
            if a.size:
                deltas[0] = a[0]
                np.subtract(a[1:], a[:-1], out=deltas[1:])
            out.append(varbyte_encode(deltas))
        return pd.Series(out)

    return enc


def build_positions(corpus_with_id: DataFrame) -> DataFrame:
    """corpus (with doc_id) → positional index (term, doc_id, n_occ,
    positions:binary). Grouping key is (term, doc_id): group size is bounded
    by one document's occurrences of one term, so hot terms cannot blow up a
    reduce group the way whole posting lists can in build_postings."""
    enc = _encode_positions_udf()
    return (
        _positions_relation(corpus_with_id)
        .groupBy("term", "doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("_plist"))
        .select(
            "term",
            "doc_id",
            F.size("_plist").cast("long").alias("n_occ"),
            enc(F.col("_plist")).alias("positions"),
        )
    )


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


def phrase_match_indexed(
    spark: SparkSession, pos_idx: DataFrame, phrase: list[str]
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
    uniq = sorted(set(phrase))
    occ = decode_position_rows(pos_idx.filter(F.col("term").isin(uniq)))
    aligned = occ.join(F.broadcast(slots), "term").select(
        "doc_id", (F.col("pos") - F.col("slot")).alias("apos"), "slot"
    )
    hits = (
        aligned.groupBy("doc_id", "apos")
        .agg(F.count_distinct("slot").alias("_n"))
        .filter(F.col("_n") == len(phrase))
    )
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_matches"))
