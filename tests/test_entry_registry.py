"""Driver-contract registry invariants: every queries() entry is oracled
unless explicitly allowlisted as rows-only, and no orphan oracles exist.
Guards against a new query silently shipping without its DuckDB oracle
(the driver would record only a weak rows-only check)."""

from information_retrieval_project_spark import entry_queries as EQ

# genuinely non-SQL-expressible: ann_ivf_topk (iterative k-means quantizer
# state), minhash_band_pairs_fast (seeded xxhash64 signatures — DuckDB has
# no xxhash64; the md5 sibling minhash_band_pairs carries the value oracle,
# and test_pipeline_ops pins the fast variant's exact-duplicate recall)
ROWS_ONLY_ALLOWLIST = {"ann_ivf_topk", "minhash_band_pairs_fast"}


def test_every_query_has_an_oracle_or_is_allowlisted():
    missing = set(EQ.QUERIES) - set(EQ.ORACLE_SQL) - ROWS_ONLY_ALLOWLIST
    assert not missing, f"queries without oracle_sql: {sorted(missing)}"


def test_no_orphan_oracles():
    orphans = set(EQ.ORACLE_SQL) - set(EQ.QUERIES)
    assert not orphans, f"oracle_sql without queries entry: {sorted(orphans)}"


def test_registry_is_nonempty_and_callable():
    assert len(EQ.QUERIES) >= 66
    assert all(callable(f) for f in EQ.QUERIES.values())
    assert all(isinstance(s, str) and s.strip() for s in EQ.ORACLE_SQL.values())
