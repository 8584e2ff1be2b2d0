"""UDF / UDAF / UDTF surface (SURVEY §2.10).

The reference has no Spark UDFs (its only custom logic ran on the
driver). This module is the engine's sanctioned slow path — used ONLY
where built-ins can't express the semantics, always Arrow-vectorized:

- scalar Pandas UDF  : cosine similarity on embedding pairs (numpy
  batch math — demonstrates the pattern; the production cosine in
  llm.similarity stays JVM-side via higher-order functions)
- grouped-agg Pandas UDF : geometric mean (no built-in equivalent)
- applyInPandas      : per-key CDC replay validation (sequentially
  replays a key's event history — inherently imperative)
- UDTF               : envelope exploder producing one row per
  changed column (before/after diff) from a Debezium pair
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf(T.DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine over two array<float> columns (Arrow batches →
    numpy). ~10-100× faster than a row-at-a-time Python UDF; still
    slower than the JVM higher-order-function version — benchmarked
    against it in tests/test_plans.py."""
    import numpy as np

    am = np.stack(a.to_numpy())
    bm = np.stack(b.to_numpy())
    dots = (am * bm).sum(axis=1)
    norms = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
    return pd.Series(dots / norms)


@pandas_udf(T.DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """Grouped-agg Pandas UDF (UDAF surface): exp(mean(log(x)))."""
    import numpy as np

    x = v.to_numpy()
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x).mean()))


def replay_validate(changes: DataFrame, key_col: str = "id") -> DataFrame:
    """Per-key CDC replay validation via applyInPandas.

    Sequentially replays each key's ordered event history and reports
    whether set-based LWW compaction (cdc.compact) would produce the
    same final op — the cross-check that the distributed kernel agrees
    with the sequential semantics. Input: typed change rows with
    ``op`` and ``offset``.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("final_op", T.StringType()),
            T.StructField("lww_matches_replay", T.BooleanType()),
        ]
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset")
        final_seq = pdf.iloc[-1]["op"]  # sequential replay outcome
        lww = pdf.loc[pdf["offset"].idxmax()]["op"]  # set-based outcome
        return pd.DataFrame(
            {
                "id": [pdf.iloc[0][key_col]],
                "n_events": [len(pdf)],
                "final_op": [final_seq],
                "lww_matches_replay": [final_seq == lww],
            }
        )

    return changes.groupBy(key_col).applyInPandas(per_key, out_schema)


@udtf(returnType="col string, before string, after string")
class EnvelopeDiffUDTF:
    """UDTF (Spark 3.5+): explode a Debezium before/after pair into one
    row per CHANGED column — the cell-level changelog."""

    def eval(self, before: dict | None, after: dict | None):  # noqa: D102
        b = before or {}
        a = after or {}
        for col in sorted(set(b) | set(a)):
            if b.get(col) != a.get(col):
                yield col, b.get(col), a.get(col)


def cell_changelog(changes: DataFrame, before_col: str, after_col: str) -> DataFrame:
    """Apply the envelope-diff UDTF laterally to a change DataFrame."""
    spark = changes.sparkSession
    spark.udtf.register("EnvelopeDiffUDTF", EnvelopeDiffUDTF)
    changes.createOrReplaceTempView("_chg")
    # distinct output names: c.* already carries the before/after maps
    return spark.sql(
        f"SELECT c.*, d.col AS changed_col, d.before AS before_value, "
        f"d.after AS after_value "
        f"FROM _chg c, LATERAL EnvelopeDiffUDTF(c.{before_col}, c.{after_col}) d"
    )
