"""Multimodal columns: opaque binary payloads + typed metadata.

Design (north star): media travels as an opaque ``binary`` column next
to a typed metadata struct; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects. The decode itself is STUBBED (no image/audio libs in this
environment): :func:`decode_media` raises ``NotImplementedError``
unless the deterministic fake decoder is requested — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.

Synthetic payloads: utf-8 bytes of ``documents.text`` stand in for
media bytes, which keeps the byte-level queries oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table

MEDIA_SCHEMA = (
    "doc_id bigint, payload binary, "
    "meta struct<mime: string, n_bytes: bigint, source: string>"
)


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload + typed metadata struct."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    ``fake=False`` is the production signature and raises
    ``NotImplementedError`` (image/audio codecs are not available in
    this environment). ``fake=True`` runs a deterministic stand-in
    'decoder' (per-payload byte histogram → 4 'features') exercising
    the real batch path: Arrow transfer, per-partition batching,
    binary-in / struct-out schema.
    """
    out_schema = (
        "doc_id bigint, n_bytes bigint, "
        "f0 bigint, f1 bigint, f2 bigint, f3 bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present "
                    "in this environment; pass fake=True for the "
                    "deterministic stand-in decoder"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                # deterministic FAKE features: byte-value histogram mod 4
                hist = [0, 0, 0, 0]
                for byte in b:
                    hist[byte % 4] += 1
                rows.append((doc_id, len(b), *hist))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "f0", "f1", "f2", "f3"]
            )

    return df.select("doc_id", "payload").mapInPandas(batches, out_schema)


@query(
    "multimodal_metadata_stats",
    oracle="""
    SELECT meta_source AS source,
           COUNT(*) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           MAX(n_bytes) AS max_bytes
    FROM (SELECT source AS meta_source,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          FROM documents) t
    GROUP BY meta_source
    """,
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the opaque payload column —
    storage accounting per source (never touches the bytes; at scale
    this reads only the meta struct thanks to column pruning)."""
    d = load_table(spark, sf_dir, "documents")
    m = with_media_columns(d)
    return m.groupBy(F.col("meta.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


@query(
    "multimodal_fake_decode",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ),
    nibbles AS (
      -- byte i's LOW nibble is hex char 2i (1-based); byte%4 depends
      -- only on the low nibble's value mod 4
      SELECT doc_id, substr(h, 2 * i, 1) AS c
      FROM b, UNNEST(range(1, n_bytes + 1)) AS t(i)
    ),
    hist AS (
      SELECT doc_id,
             SUM(CASE WHEN c IN ('0','4','8','C') THEN 1 ELSE 0 END) AS f0,
             SUM(CASE WHEN c IN ('1','5','9','D') THEN 1 ELSE 0 END) AS f1,
             SUM(CASE WHEN c IN ('2','6','A','E') THEN 1 ELSE 0 END) AS f2,
             SUM(CASE WHEN c IN ('3','7','B','F') THEN 1 ELSE 0 END) AS f3
      FROM nibbles
      GROUP BY doc_id
    )
    -- LEFT JOIN keeps zero-byte payloads: the Spark decoder emits
    -- (doc_id, 0, 0,0,0,0) for them, while the UNNEST range is empty
    SELECT b.doc_id, b.n_bytes,
           CAST(COALESCE(f0, 0) AS BIGINT) AS f0,
           CAST(COALESCE(f1, 0) AS BIGINT) AS f1,
           CAST(COALESCE(f2, 0) AS BIGINT) AS f2,
           CAST(COALESCE(f3, 0) AS BIGINT) AS f3
    FROM b LEFT JOIN hist USING (doc_id)
    """,
)
def multimodal_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path with the deterministic fake decoder:
    binary payload in → feature struct out, Arrow-batched. The oracle
    recomputes the byte-histogram-mod-4 features INDEPENDENTLY in SQL
    (hex-nibble counting over the UTF-8 payload), so the driver
    hash-checks the whole Python/Arrow decode plumbing — this was a
    rows-only row until round 3."""
    d = load_table(spark, sf_dir, "documents")
    m = with_media_columns(d)
    return decode_media(m, fake=True)


def frame_sample(
    df: DataFrame, frame_bytes: int = 16, stride_bytes: int = 64
) -> DataFrame:
    """Frame sampling over opaque media payloads: emit the hex of one
    ``frame_bytes``-sized slice every ``stride_bytes`` (the every-k-th-
    frame shape of video sampling), only for FULL frames. Runs as
    Arrow-batched ``mapInPandas`` like :func:`decode_media` — same
    binary-in / rows-out plumbing a real codec-backed sampler uses,
    with ~1/stride output amplification instead of explode-the-bytes.
    """
    out_schema = "doc_id bigint, frame_idx bigint, frame_hex string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                k = 0
                while k * stride_bytes + frame_bytes <= len(b):
                    start = k * stride_bytes
                    rows.append(
                        (doc_id, k, b[start : start + frame_bytes].hex().upper())
                    )
                    k += 1
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_hex"]
            )

    return df.select("doc_id", "payload").mapInPandas(batches, out_schema)


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    )
    SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
           substr(h, 1 + CAST(k AS BIGINT) * 128, 32) AS frame_hex
    FROM b, UNNEST(range(0, 1 + (n - 16) // 64)) AS t(k)
    WHERE n >= 16
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling through the mapInPandas media path
    (16-byte frames, 64-byte stride). The oracle recomputes each
    sampled frame independently by slicing the payload's hex string
    (2 hex chars per byte ⇒ frame k starts at char 1+128k, spans 32),
    so the driver hash-checks the byte-exact slicing of the Python
    sampler — frame boundaries, stride arithmetic, and the full-frames-
    only cutoff included."""
    d = load_table(spark, sf_dir, "documents")
    return frame_sample(with_media_columns(d))


def resize_media(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' opaque media payloads to ≤ ``target_bytes`` by
    deterministic stride decimation (every s-th byte, s = ⌈n/target⌉) —
    the binary-in / binary-out plumbing of an image/audio resampler
    (batch shapes, Arrow transfer, size bookkeeping) with a stand-in
    kernel, exactly like :func:`decode_media`'s fake decoder. A real
    codec drops into the same ``batches`` body."""
    out_schema = (
        "doc_id bigint, n_bytes_in bigint, n_bytes_out bigint, "
        "resized binary"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if not b:
                    continue
                s = (len(b) + target_bytes - 1) // target_bytes
                out = b[::s]
                rows.append((doc_id, len(b), len(out), bytearray(out)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes_in", "n_bytes_out", "resized"],
            )

    return df.select("doc_id", "payload").mapInPandas(batches, out_schema)


@query(
    "multimodal_resize",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    ), p AS (
      SELECT doc_id, h, n, (n + 63) // 64 AS s FROM b WHERE n > 0
    ), bytes AS (
      SELECT doc_id, n, i,
             substr(h, 1 + 2 * CAST(i AS BIGINT) * s, 2) AS byte_hex
      FROM p, UNNEST(range(0, (n + s - 1) // s)) AS t(i)
    )
    SELECT doc_id, n AS n_bytes_in,
           CAST(COUNT(*) AS BIGINT) AS n_bytes_out,
           string_agg(byte_hex, '' ORDER BY i) AS resized_hex
    FROM bytes GROUP BY doc_id, n
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-decimation resize (≤64 output bytes) through the
    mapInPandas media path. The oracle reassembles the decimated
    payload independently from hex slices (byte i of the output is
    input byte i·s, i.e. hex chars [1+2is, +2)), so the driver
    hash-checks the resampler's byte selection, output length
    bookkeeping, and the ⌈n/target⌉ stride arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    resized = resize_media(with_media_columns(d))
    return resized.select(
        "doc_id",
        "n_bytes_in",
        "n_bytes_out",
        F.upper(F.hex("resized")).alias("resized_hex"),
    )
