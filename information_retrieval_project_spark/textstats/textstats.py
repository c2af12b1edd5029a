"""Text-analysis operators for training-data pipelines.

All native column math (codegen, no UDFs): language-ID by stopword-marker
n-gram heuristic, quality scoring (length / punctuation / stopword ratios),
token counting (whitespace + BPE-ish regex), and rolling-hash document
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# frozen per-language marker terms (tiny, checked-in; the heuristic's
# accuracy is bounded by design — determinism is the contract)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "las", "una"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "zh": ["de5", "shi4", "zai4", "le5", "wo3", "you3", "he2", "ren2"],
}

# BPE-ish token pattern: words, numbers, or single non-space symbols —
# approximates a byte-pair pre-tokenizer's word-splitting stage
BPE_ISH = r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]"


def token_counts(df: DataFrame, text_col: str = "content") -> DataFrame:
    """Whitespace and BPE-ish token counts per doc — the cheap cost model for
    training-token accounting."""
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    ).withColumn(
        "bpe_ish_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0)),
    )


def quality_scores(df: DataFrame, text_col: str = "content") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / diversity heuristics."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9_]+"), lambda x: x != "")
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    from ..functions.textnorm import STOPWORDS

    sw = F.array(*[F.lit(w) for w in sorted(STOPWORDS)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return df.select(
        "*",
        F.size(toks).alias("n_tokens"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_stop / F.greatest(F.size(toks), F.lit(1))).alias("stopword_ratio"),
        (
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))
        ).alias("ttr"),
    )


def language_id(df: DataFrame, text_col: str = "content") -> DataFrame:
    """Marker-count language ID: argmax over per-language marker hits with a
    deterministic tie-break (count DESC, lang ASC). Pure column math via a
    literal marker map — no shuffle, no UDF."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9_]+"), lambda x: x != "")
    scored = df.withColumn("_toks", toks)
    pairs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marr = F.array(*[F.lit(m) for m in markers])
        cnt = F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(marr, t)))
        pairs.append(F.struct(cnt.alias("cnt"), F.lit(lang).alias("lang")))
    # argmax with tie-break: sort by (cnt desc, lang asc) = sort structs desc
    # on cnt then asc lang — array_sort with custom comparator
    arr = F.array(*pairs)
    best = F.array_sort(
        arr,
        lambda a, b: F.when(a["cnt"] > b["cnt"], -1)
        .when(a["cnt"] < b["cnt"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]
    return scored.withColumn("pred_lang", best["lang"]).withColumn(
        "pred_lang_hits", best["cnt"]
    ).drop("_toks")


def doc_fingerprints(df: DataFrame, text_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Two fingerprints per doc: exact (sha256 of raw text) and normalized
    rolling (xxhash64 over the sorted distinct token set) — the second is
    stable under whitespace/punctuation-only edits."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9_]+"), lambda x: x != "")
    return df.select(
        F.col(id_col),
        F.sha2(F.col(text_col), 256).alias("exact_fp"),
        F.xxhash64(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias(
            "token_set_fp"
        ),
    )
