"""Generate the frozen query set + golden top-k fixtures (FIXTURES.md §2/§3).

20 queries sampled deterministically from target docs of the seed-42
synthetic corpus (mirroring the reference's one-query-per-target-document
design, data_manager.py:165-179), scored by the pure-numpy oracle for both
BM25 and TF-IDF-cosine. Output: tests/fixtures/queries.json +
golden_topk.json (checked into the repo; the engine must match
rank-identically — test_golden_fixtures.py).

Rerun only if the corpus generator or frozen scoring semantics change:
    python tools/make_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from information_retrieval_project_spark.corpus import generate_pdf
from information_retrieval_project_spark.functions.textnorm import normalize_tokenize
from information_retrieval_project_spark.oracle.oracle import (
    oracle_bm25_topk,
    oracle_tfidf_cosine_topk,
)

N_DOCS = 500
N_QUERIES = 20
K = 10
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")


def spark_xxhash64(repo: str, path: str, commit: str) -> int:
    """Driver-side stand-in is NOT possible without the JVM; fixtures key
    docs by row index and the test resolves index→xxhash64 doc_id in Spark."""
    raise NotImplementedError


def main() -> None:
    pdf = generate_pdf(N_DOCS)
    # docs keyed by ROW INDEX here; the pytest resolves index→doc_id via the
    # same xxhash64 Spark computes, then maps golden rows over
    docs = {i: row.content for i, row in enumerate(pdf.itertuples(index=False))}
    rng = np.random.default_rng(42)
    queries = []
    for qid in range(N_QUERIES):
        target = int(rng.integers(0, N_DOCS))
        toks = normalize_tokenize(docs[target])
        uniq = sorted(set(toks))
        n_terms = int(rng.integers(2, 6))
        sel = [uniq[int(i)] for i in rng.integers(0, len(uniq), size=n_terms)]
        if qid == N_QUERIES - 1:
            sel.append("zzz_term_absent_from_corpus")
        queries.append({"query_id": qid, "query": " ".join(sel), "target_row": target, "k": K})

    golden = []
    for q in queries:
        for scorer, fn in (("bm25", oracle_bm25_topk), ("tfidf_cosine", oracle_tfidf_cosine_topk)):
            for rank, (row_idx, score) in enumerate(fn(docs, q["query"], k=K), start=1):
                golden.append(
                    {
                        "query_id": q["query_id"],
                        "scorer": scorer,
                        "rank": rank,
                        "target_row": row_idx,
                        "score": score,
                    }
                )

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "queries.json"), "w") as f:
        json.dump({"n_docs": N_DOCS, "seed": 42, "queries": queries}, f, indent=1)
    with open(os.path.join(OUT, "golden_topk.json"), "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {len(queries)} queries, {len(golden)} golden rows to {OUT}")


if __name__ == "__main__":
    main()
