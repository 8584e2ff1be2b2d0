"""Z-order (Morton) clustered parquet layout — multi-dimensional
data skipping.

Directory partitioning (sources/partitioned.py) prunes on ONE key;
sorting on one column clusters min/max row-group stats for that column
only. Interleaving the bits of TWO normalized sort keys into a Morton
code and range-partitioning + sorting on it gives every output file a
narrow min/max envelope in BOTH dimensions, so a 2-d predicate box
(e.g. ``orderkey BETWEEN … AND partkey BETWEEN …``) overlaps only
O(perimeter) of the files instead of all of them — the layout trick
behind Delta OPTIMIZE ZORDER and query engines' data-skipping indexes,
expressed here with plain DataFrame ops (no table format needed: the
pruning comes from parquet footer min/max stats, which any engine
reads).

``test_zorder_layout_skips_files`` verifies the claim the way a scan
planner would: it reads each output file's parquet footer stats and
counts files whose [min, max] ranges overlap a small query box in both
dimensions — Z-ordered layout must overlap a fraction of what the
unclustered layout does.

Scale notes: the min/max normalization pass is one cheap aggregate on
the write path (a layout job, run once per compaction — the same
amortization as `IvfIndex.build`); 16 bits per dimension bounds the
interleave at 32 codegen-friendly integer ops per row and caps the
value range regardless of key magnitude. Range partitioning on the
z-value samples like any repartitionByRange — no skew key, because
Morton codes of distinct rows spread uniformly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZBITS = 16


def _scale(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max normalize to [0, 2^bits) integer rank space. Constant
    columns (hi == lo) map to 0."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col - lo).cast("double") / span).otherwise(0.0)
    top = float(2**bits - 1)
    return F.round(frac * top).cast("bigint")


def zvalue(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two bit-bounded non-negative ints: bit i of
    ``a`` lands at position 2i+1, bit i of ``b`` at 2i."""
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        parts.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Morton code of (col_a, col_b). One stats aggregate (min/max per
    dimension, broadcast), one range shuffle on the z-value, a sort
    within each output task — the standard OPTIMIZE-ZORDER shape."""
    stats = F.broadcast(
        df.agg(
            F.min(col_a).alias("_alo"),
            F.max(col_a).alias("_ahi"),
            F.min(col_b).alias("_blo"),
            F.max(col_b).alias("_bhi"),
        )
    )
    z = zvalue(
        _scale(F.col(col_a), F.col("_alo"), F.col("_ahi"), bits),
        _scale(F.col(col_b), F.col("_blo"), F.col("_bhi"), bits),
        bits,
    )
    (
        df.crossJoin(stats)
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping_box(
    path: str,
    col_a: str,
    lo_a,
    hi_a,
    col_b: str,
    lo_b,
    hi_b,
) -> tuple[int, int]:
    """(files whose footer min/max stats overlap the query box in BOTH
    dimensions, total data files) — exactly the skip decision a scan
    planner makes from parquet metadata. Pure pyarrow, no Spark."""
    import os

    import pyarrow.parquet as pq

    total, overlapping = 0, 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                nm = col.path_in_schema
                st = col.statistics
                if st is None or nm not in (col_a, col_b):
                    continue
                mins[nm] = (
                    st.min if nm not in mins else min(mins[nm], st.min)
                )
                maxs[nm] = (
                    st.max if nm not in maxs else max(maxs[nm], st.max)
                )
        if (
            mins.get(col_a) is not None
            and not (maxs[col_a] < lo_a or mins[col_a] > hi_a)
            and mins.get(col_b) is not None
            and not (maxs[col_b] < lo_b or mins[col_b] > hi_b)
        ):
            overlapping += 1
    return overlapping, total
