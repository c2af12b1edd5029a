"""Keyset-pagination invariant (VERDICT r4 #6): concatenating pages 1..n
must equal the global ranking prefix — including tied-score boundaries,
where the (score DESC, doc_id ASC) tie-break decides which duplicates land
on which side of a page cut."""

import random

import pytest
from pyspark.sql import functions as F

from information_retrieval_project_spark.queryexec.paging import (
    cursor_of,
    page_after,
    page_after_df,
)


def _random_scores(spark, seed):
    """A scored relation engineered for tie-heavy page boundaries: few
    distinct score values over many docs."""
    rng = random.Random(seed)
    n = rng.randint(7, 120)
    n_distinct = rng.randint(1, 6)
    values = [round(rng.uniform(0, 5), 2) for _ in range(n_distinct)]
    rows = [(i * 3 - 50, rng.choice(values)) for i in range(n)]
    return (
        spark.createDataFrame(rows, "doc_id long, score double"),
        sorted(rows, key=lambda r: (-r[1], r[0])),
    )


@pytest.mark.parametrize("seed", range(8))
def test_pages_concatenate_to_global_prefix(spark, seed):
    """Client-driven paging (the production shape: each hop's cursor is the
    last row the client already holds — flat plans, no growing lazy
    chain). Walk the ENTIRE ranking and compare against the global order."""
    scores, ranking = _random_scores(spark, seed)
    scores = scores.cache()
    page_size = random.Random(seed + 1000).randint(2, 9)
    got = []
    cursor = None
    page_no = 0
    while True:
        rows = (
            page_after(
                scores, page_size, cursor, rank_offset=page_no * page_size
            )
            .orderBy("rank")
            .collect()
        )
        got.extend(rows)
        if len(rows) < page_size:
            break
        cursor = (rows[-1]["score"], rows[-1]["doc_id"])
        page_no += 1
        if page_no > 80:
            raise AssertionError("pagination did not terminate")

    scores.unpersist()
    assert [(r["doc_id"], r["score"]) for r in got] == ranking
    assert [r["rank"] for r in got] == list(range(1, len(ranking) + 1))


def test_lazy_df_cursor_chain_matches_global_prefix(spark):
    """The fully lazy DataFrame-cursor chain (the gate's shape — no driver
    round-trip between hops) must produce the same pages as the global
    ranking, across a tie-heavy boundary, three hops deep."""
    scores, ranking = _random_scores(spark, 424242)
    page_size = 4
    p1 = page_after_df(scores, page_size)
    p2 = page_after_df(
        scores, page_size, cursor_of(p1, page_size), rank_offset=page_size
    )
    p3 = page_after_df(
        scores,
        page_size,
        cursor_of(p2, page_size),
        rank_offset=2 * page_size,
    )
    got = (
        p1.unionByName(p2).unionByName(p3).orderBy("rank").collect()
    )
    want = ranking[: 3 * page_size]
    assert [(r["doc_id"], r["score"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))


def test_exhausted_ranking_yields_empty_page(spark):
    """A cursor at the end of the ranking must produce an empty page, and a
    short page's cursor must terminate the chain (empty cursor relation)."""
    scores = spark.createDataFrame(
        [(1, 2.0), (2, 1.0), (3, 1.0)], "doc_id long, score double"
    )
    p1 = page_after_df(scores, 2)
    p2 = page_after_df(scores, 2, cursor_of(p1, 2), rank_offset=2)
    assert p2.count() == 1  # only doc 3 remains
    # p2 is short (1 < 2): its cursor is empty, page 3 must be empty
    p3 = page_after_df(scores, 2, cursor_of(p2, 2), rank_offset=4)
    assert p3.count() == 0


def test_cursor_of_full_page_with_arbitrary_rank_offset(spark):
    """A FULL page must yield a usable cursor regardless of the caller's
    rank_offset (fullness is a row-count property; rank arithmetic would
    end pagination early for offsets that aren't page_size multiples)."""
    scores = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(6)], "doc_id long, score double"
    )
    p1 = page_after_df(scores, 2, rank_offset=7)  # full page, ranks 8..9
    c1 = cursor_of(p1, 2)
    assert c1.count() == 1
    p2 = page_after_df(scores, 2, c1, rank_offset=9)
    assert [r["doc_id"] for r in p2.orderBy("rank").collect()] == [2, 3]
