"""Every oracle-declared query must match DuckDB exactly (the t2 gate,
mirrored locally)."""

import pytest

from spark_streaming_with_debezium_spark.registry import load_all
from tests.oracle_harness import compare_query

QUERIES = load_all()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    compare_query(spark, QUERIES[name], sf_dir)


def test_no_rows_only_queries_remain():
    """Round 9 promoted the last rows-only face (dedup_clusters_ml):
    EVERY registered query now carries a DuckDB oracle. This gate keeps
    it that way — a new rows-only registration must be a conscious
    decision (delete this test and restore the old rows-only
    canonicalizer check from git history if one ever becomes
    legitimately necessary)."""
    assert ROWS_ONLY == [], (
        f"rows-only queries reappeared: {ROWS_ONLY} — give them an "
        "oracle (bound-check pattern if approximate) or consciously "
        "revert this gate"
    )
