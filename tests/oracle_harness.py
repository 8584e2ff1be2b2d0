"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Sorts columns by name, canonicalizes values, sorts rows, compares
exactly — a stricter local version of the driver's order-insensitive
value hash, so any mismatch the driver would flag fails here first.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

from spark_streaming_with_debezium_spark.sources.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> list[tuple]:
    """Fetch the oracle result THROUGH PANDAS, exactly like the driver.

    ``fetchall()`` hides a whole bug class: DuckDB returns ``SUM(int)``
    as HUGEINT, which ``fetchall`` yields as Python int (compares equal
    to Spark's long) but the driver's pandas fetch renders as float64
    (``500.0`` vs ``500`` → hash mismatch; the sole cause of all three
    red rows in CORRECTNESS_r03). Going through ``.df()`` makes the
    same divergence fail pytest before the driver ever sees it.
    """
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        pdf = con.execute(sql).df()
        cols = list(pdf.columns)
        return cols, _rows_from_pandas(pdf)
    finally:
        con.close()


def _rows_from_pandas(pdf) -> list[tuple]:
    """Convert a pandas frame to plain-Python rows, keeping the dtype
    pandas chose (float64 stays float — that's the point), while mapping
    missing values back to None so the local Spark side (``collect()``,
    which yields None) still lines up the way the driver's
    both-sides-through-pandas comparison does."""
    import numpy as np
    import pandas as pd

    rows = []
    for rec in pdf.itertuples(index=False, name=None):
        out = []
        for v in rec:
            if v is None or v is pd.NaT:
                out.append(None)
            elif isinstance(v, float) and math.isnan(v):
                out.append(None)
            elif isinstance(v, pd.Timestamp):
                out.append(v.to_pydatetime())
            elif isinstance(v, np.generic):
                out.append(v.item())
            elif isinstance(v, np.ndarray):
                out.append([x.item() if isinstance(x, np.generic) else x
                            for x in v])
            else:
                out.append(v)
        rows.append(tuple(out))
    return rows


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", float(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("ts", dt.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, bytes):
        return ("bytes", v)
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("num", v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("float", float(v))
    except ImportError:
        pass
    return (type(v).__name__, str(v))


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def assert_driver_safe_schema(name: str, df) -> None:
    """The driver's canonicalizer is pandas ``sort_values`` over every
    output column — it crashes with ``unhashable type: 'list'`` on any
    array/map/struct column (round-1 err rows: agg_collect_sorted,
    cdc_history_per_key, agg_approx_percentile). Registered queries must
    therefore emit only scalar columns (array_join / to_json instead)."""
    from pyspark.sql import types as T

    for f in df.schema.fields:
        assert not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)), (
            f"{name}: output column '{f.name}' is "
            f"{f.dataType.simpleString()} — the driver's pandas "
            "canonicalizer crashes on non-scalar columns; emit "
            "array_join(...)/to_json(...) scalars instead"
        )


def driver_faithful_canon(cols: list[str], rows: list[tuple]) -> None:
    """Replicate the driver's pandas canonicalization step verbatim so
    anything that crashes the driver crashes here first (the local
    ``_canon`` above tolerates lists; the driver's does not)."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=cols)
    pdf = pdf[sorted(cols)]
    pdf.sort_values(by=list(pdf.columns))  # TypeError on non-scalar cells


def compare_query(spark, query, sf_dir: str) -> None:
    """Assert the Spark query matches its DuckDB oracle exactly."""
    sdf = query.fn(spark, sf_dir)
    assert_driver_safe_schema(query.name, sdf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    driver_faithful_canon(s_cols, s_rows)
    o_cols, o_rows = run_oracle(query.oracle, sf_dir)
    assert sorted(s_cols) == sorted(o_cols), (
        f"{query.name}: column mismatch spark={sorted(s_cols)} "
        f"oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{query.name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sc = canonical_rows(s_cols, s_rows)
    oc = canonical_rows(o_cols, o_rows)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        raise AssertionError(
            f"{query.name}: value mismatch; first diffs (spark, oracle): {diffs}"
        )
