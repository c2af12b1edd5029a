"""Lexical term-dictionary queries: fuzzy (bounded edit distance) and
prefix/wildcard term matching.

The Lucene FuzzyQuery / PrefixQuery surface (the reference has neither —
its retrieval is exact-vocabulary TF-IDF, data_manager.py:122-126): a
query term is matched against the TERM DICTIONARY first, and the matched
variants then behave like an OR over their posting lists. The dictionary
(|V| distinct terms) is orders of magnitude smaller than the corpus, so
the dictionary scan is the cheap stage; the expensive stage — reaching
the postings — stays an equi-join on the (small, broadcastable) matched
variant set.

Scale shape for fuzzy: plain Levenshtein over |V| is linear in the
dictionary; the lossless length prefilter (|len(t) − len(q)| ≤ max_dist,
an edit-distance lower bound) prunes most of it inside codegen before the
quadratic-per-pair levenshtein kernel runs. At Lucene scale the
dictionary itself would carry a character-n-gram index (candidate terms
must share ≥ len−k·n n-grams with the query) — that refinement changes
the dictionary-scan constant, not the join shape, and the length
prefilter already demonstrates the lossless-prefilter contract the n-gram
form must also satisfy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_terms(
    term_dict: DataFrame, query_term: str, max_dist: int = 1
) -> DataFrame:
    """Dictionary terms within `max_dist` edits of query_term → (term).

    term_dict: a (term) relation (typically tf.select("term").distinct()
    or the stored index's term column). The length prefilter is an edit-
    distance lower bound, so it never drops a true match — the oracle SQL
    applies NO prefilter and the driver hash proves losslessness."""
    return term_dict.filter(
        (
            F.abs(F.length("term") - F.lit(len(query_term)))
            <= F.lit(int(max_dist))
        )
        & (F.levenshtein(F.col("term"), F.lit(query_term)) <= int(max_dist))
    ).select("term")


def prefix_terms(term_dict: DataFrame, prefix: str) -> DataFrame:
    """Dictionary terms starting with `prefix` → (term). At scale the
    dictionary is stored sorted (or bucketed) so the prefix predicate is a
    range scan, not a full pass; the relational form is the same."""
    return term_dict.filter(F.col("term").startswith(prefix)).select("term")


def docs_matching_terms(tf_df: DataFrame, terms: DataFrame) -> DataFrame:
    """Distinct doc_ids containing ANY of the matched terms — the OR-of-
    posting-lists step shared by fuzzy and prefix queries. The matched
    variant set is broadcast (it is a filtered term dictionary — small by
    construction)."""
    return (
        tf_df.join(F.broadcast(terms), "term").select("doc_id").distinct()
    )
