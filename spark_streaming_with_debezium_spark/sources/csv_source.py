"""Static dimension CSV source (SURVEY §2.1 S3).

The reference ships `files/staticdata/cities.csv` — a `;`-delimited,
UTF-8-BOM, headered lookup table joined to the CDC stream by email
(the evident intent; no reference code consumes it). This reader
handles that shape generically, and :func:`enrich` is the stream-static
broadcast join (J6): the dimension is broadcast once per micro-batch,
so the stream side never shuffles — the correct plan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_dimension_csv(
    spark: SparkSession,
    path: str,
    sep: str = ";",
    header: bool = True,
) -> DataFrame:
    """Read a `;`-delimited, headered, possibly-BOM'd dimension CSV.

    ``encoding=UTF-8`` + Spark's header parsing strips the BOM from the
    first header cell; explicit trim guards stray whitespace.
    """
    df = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("encoding", "UTF-8")
        .option("mode", "FAILFAST")
        .csv(path)
    )
    # Defensive: strip a UTF-8 BOM that survived in the first column name.
    first = df.columns[0]
    if first.startswith("﻿"):
        df = df.withColumnRenamed(first, first.lstrip("﻿"))
    return df


def enrich(
    stream_df: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: broadcast the dimension."""
    return stream_df.join(F.broadcast(dim), on, how)
