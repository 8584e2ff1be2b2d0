"""Every oracle-declared query must match DuckDB exactly (the t2 gate,
mirrored locally)."""

import pytest

from spark_streaming_with_debezium_spark.registry import load_all
from tests.oracle_harness import (
    assert_driver_safe_schema,
    compare_query,
    driver_faithful_canon,
)

QUERIES = load_all()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    compare_query(spark, QUERIES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    """Rows-only queries still pass through the driver's canonicalizer
    (round 1: agg_approx_percentile crashed it despite having no
    oracle), so they get the same non-scalar-column gate."""
    df = QUERIES[name].fn(spark, sf_dir)
    assert_driver_safe_schema(name, df)
    rows = [tuple(r) for r in df.collect()]
    driver_faithful_canon(df.columns, rows)
    assert len(df.columns) > 0
