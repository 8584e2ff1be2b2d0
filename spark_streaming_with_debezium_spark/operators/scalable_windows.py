"""Scalable exact global-order windows.

A ``Window.orderBy(...)`` with no ``partitionBy`` funnels every row
through ONE task — fine for frames that are tiny by construction
(months, days, bucket tallies), a single-reducer wall when the frame is
O(users) / O(customers) / O(parts) at 100 TB. This module computes the
same EXACT running sums / row numbers with bounded partitions:

1. range-bucket rows on a numeric sort key (boundaries from one
   ``approxQuantile`` pass — boundary precision affects only balance,
   never values);
2. run the window WITHIN each bucket (partitioned shuffle, bounded
   sort);
3. cumulate per-bucket totals on the TINY (≤ n_buckets rows) totals
   table and add them back as per-bucket starting offsets via a
   broadcast join.

Step 3's window is itself globally ordered, but over at most
``n_buckets`` rows — the allowlisted tiny-frame case the repo-wide plan
census (tests/test_plans.py) recognizes by the ``_bkt`` sort key.

Exactness: integer/decimal running sums within a bucket plus an
integer/decimal offset equal the single global window bit-for-bit;
``test_global_running_matches_naive_window`` asserts it and the three
rewritten queries (orders_rfm_segments, events_pareto_concentration,
parts_abc_classification) keep their unchanged DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantile_boundaries(
    df: DataFrame, key_cols: Sequence[str], n_buckets: int = 64
) -> list[list[float]]:
    """One-pass approximate bucket boundaries for each key column
    (cast to double first; callers negate for DESC orders). Returns a
    sorted, deduped boundary list per column."""
    if n_buckets <= 1:  # single bucket: no boundary pass needed
        return [[] for _ in key_cols]
    probs = [i / n_buckets for i in range(1, n_buckets)]
    raw = df.stat.approxQuantile(list(key_cols), probs, 0.01)
    return [sorted(set(b)) for b in raw]


def global_ordered_running(
    df: DataFrame,
    key: Column,
    order_cols: Sequence[Column | str],
    sums: Mapping[str, Column] | None = None,
    rank_name: str | None = None,
    n_buckets: int = 64,
    boundaries: Sequence[float] | None = None,
    prev_mins: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Add exact global running sums (``sums``: out-name → column) and/
    or a global ``row_number`` (``rank_name``) and/or STRICTLY-PRECEDING
    running minimums (``prev_mins``: min over all rows before the
    current one in the total order, NULL for the global first row — the
    skyline/dominance primitive) under the total order ``order_cols``,
    without a single-task global window.

    ``key`` must be a non-null numeric expression that sorts ASC
    consistently with ``order_cols`` (negate for DESC leading keys;
    double-rounding ties are safe — equal doubles share a bucket and
    the within-bucket sort still applies the exact order). Boundaries
    may be precomputed (one multi-column approxQuantile pass) when
    several rankings run over the same input.
    """
    sums = dict(sums or {})
    prev_mins = dict(prev_mins or {})
    df2 = df.withColumn("_key", key.cast("double"))
    if boundaries is None:
        # Boundaries INLINE in the plan (r13): the previous
        # ``approxQuantile`` call was a SEPARATE Spark action, which
        # executed the caller's whole input lineage once more per run
        # (shuffle files are only reused within one query execution).
        # One percentile_approx aggregate + a 1-row broadcast
        # crossJoin keeps everything in a single action; boundary
        # precision affects only bucket balance, never values
        # (module docstring), so the approximation swap is value-free.
        probs = F.array(
            *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
        )
        bounds = df2.agg(
            F.sort_array(
                F.array_distinct(
                    F.percentile_approx("_key", probs, 10_000)
                )
            ).alias("_bounds")
        )
        df3 = (
            df2.crossJoin(F.broadcast(bounds))
            .withColumn(
                "_bkt",
                F.coalesce(
                    F.size(
                        F.filter("_bounds", lambda b: b < F.col("_key"))
                    ),
                    F.lit(0),
                ),
            )
            .drop("_bounds")
        )
    else:
        barr = F.array(*[F.lit(float(b)) for b in boundaries])
        df3 = df2.withColumn(
            "_bkt", F.size(F.filter(barr, lambda b: b < F.col("_key")))
        )
    w_rank = Window.partitionBy("_bkt").orderBy(*order_cols)
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    within = df3
    for name, col in sums.items():
        within = within.withColumn(f"_run_{name}", F.sum(col).over(w_run))
    for name, col in prev_mins.items():
        within = within.withColumn(f"_pmin_{name}", F.min(col).over(w_prev))
    if rank_name:
        within = within.withColumn("_rn", F.row_number().over(w_rank))

    totals = df3.groupBy("_bkt").agg(
        *[F.sum(c).alias(f"_tot_{n}") for n, c in sums.items()],
        *[F.min(c).alias(f"_bmin_{n}") for n, c in prev_mins.items()],
        F.count(F.lit(1)).alias("_cnt"),
    )
    # tiny frame: ≤ n_buckets rows — the allowlisted global window
    w_off = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = totals.select(
        "_bkt",
        *[
            F.coalesce(F.sum(f"_tot_{n}").over(w_off), F.lit(0)).alias(
                f"_off_{n}"
            )
            for n in sums
        ],
        *[
            F.min(f"_bmin_{n}").over(w_off).alias(f"_offmin_{n}")
            for n in prev_mins
        ],
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off_rn"),
    )
    out = within.join(F.broadcast(off), "_bkt")
    for name in sums:
        out = out.withColumn(
            name, F.col(f"_run_{name}") + F.col(f"_off_{name}")
        )
    for name in prev_mins:
        # least() skips NULLs: first row of bucket 0 stays NULL (no
        # predecessor), first row of later buckets sees the bucket
        # offset, interior rows combine both — bit-equal to the single
        # global strictly-preceding window
        out = out.withColumn(
            name, F.least(F.col(f"_pmin_{name}"), F.col(f"_offmin_{name}"))
        )
    if rank_name:
        out = out.withColumn(rank_name, F.col("_rn") + F.col("_off_rn"))
    drop = (
        ["_key", "_bkt", "_rn", "_off_rn"]
        + [f"_run_{n}" for n in sums]
        + [f"_off_{n}" for n in sums]
        + [f"_pmin_{n}" for n in prev_mins]
        + [f"_offmin_{n}" for n in prev_mins]
    )
    return out.drop(*drop)


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative longs: ``(a - a % b)``
    is an exact multiple of ``b``, and an IEEE division whose result is
    an integer < 2^53 is exact — no float-floor edge cases."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """SQL ``ntile(k)`` recomputed from an exact 1-based global rank and
    the total row count: the first ``total % k`` tiles get
    ``total div k + 1`` rows, the rest ``total div k`` — identical to
    the window function on every engine, in pure integer arithmetic
    (``ceil(a/b)`` as ``idiv(a + b - 1, b)``)."""
    rk = rank.cast("long")
    n = total.cast("long")
    kl = F.lit(k).cast("long")
    base = _idiv(n, kl)
    rem = n % kl
    thresh = rem * (base + 1)
    in_big = _idiv(rk + base, base + 1)
    in_small = _idiv(rk - thresh + base - 1, base)
    return (
        F.when(rk <= thresh, in_big).otherwise(rem + in_small).cast("int")
    )


def grouped_ordered_running(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column,
    order_cols: Sequence[Column | str],
    sums: Mapping[str, Column] | None = None,
    rank_name: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-GROUP exact running sums / row numbers without giant group
    partitions: the grouped face of :func:`global_ordered_running` for
    skewed group keys (one language holding half the corpus turns a
    ``Window.partitionBy(lang)`` sort into a near-global single task).

    Boundaries come from one ``percentile_approx`` aggregate per group
    (a tiny (groups × n_buckets) table, broadcast back); rows bucket
    by their group's boundary array; the window partitions on
    (group, bucket) — bounded sorts at any skew — and per-bucket
    offsets cumulate over the tiny totals table partitioned by group
    (≤ n_buckets rows per group, never a global sort). Bit-identical
    to the naive per-group window; NULL keys unsupported (callers
    pass non-null metrics)."""
    sums = dict(sums or {})
    gcols = list(group_cols)
    df2 = df.withColumn("_key", key.cast("double"))
    if n_buckets <= 1:
        # single bucket: skip the boundary aggregate entirely
        df3 = df2.withColumn("_bkt", F.lit(0)).withColumn(
            "_bounds", F.array().cast("array<double>")
        )
    else:
        probs = F.array(
            *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
        )
        bounds = df2.groupBy(*gcols).agg(
            F.sort_array(
                F.array_distinct(F.percentile_approx("_key", probs, 10_000))
            ).alias("_bounds")
        )
        df3 = df2.join(F.broadcast(bounds), gcols).withColumn(
            "_bkt",
            F.coalesce(
                F.size(F.filter("_bounds", lambda b: b < F.col("_key"))),
                F.lit(0),
            ),
        )
    w_rank = Window.partitionBy(*gcols, "_bkt").orderBy(*order_cols)
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    within = df3
    for name, col in sums.items():
        within = within.withColumn(f"_run_{name}", F.sum(col).over(w_run))
    if rank_name:
        within = within.withColumn("_rn", F.row_number().over(w_rank))
    totals = df3.groupBy(*gcols, "_bkt").agg(
        *[F.sum(c).alias(f"_tot_{n}") for n, c in sums.items()],
        F.count(F.lit(1)).alias("_cnt"),
    )
    # tiny frame: ≤ n_buckets rows PER GROUP (partitioned, never global)
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = totals.select(
        *gcols,
        "_bkt",
        *[
            F.coalesce(F.sum(f"_tot_{n}").over(w_off), F.lit(0)).alias(
                f"_off_{n}"
            )
            for n in sums
        ],
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off_rn"),
    )
    out = within.join(F.broadcast(off), [*gcols, "_bkt"])
    for name in sums:
        out = out.withColumn(
            name, F.col(f"_run_{name}") + F.col(f"_off_{name}")
        )
    if rank_name:
        out = out.withColumn(rank_name, F.col("_rn") + F.col("_off_rn"))
    drop = (
        ["_key", "_bkt", "_bounds", "_rn", "_off_rn"]
        + [f"_run_{n}" for n in sums]
        + [f"_off_{n}" for n in sums]
    )
    return out.drop(*drop)
