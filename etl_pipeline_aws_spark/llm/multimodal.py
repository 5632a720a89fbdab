"""Multimodal columns (BASELINE.json north star: "treat image/audio/video
as opaque binary columns with typed metadata").

The engine-side contract: a modality column is ``BinaryType`` payload +
a ``MapType(string,string)`` metadata column, carried losslessly through
Parquet; decode / feature-extraction / frame-sampling run as Arrow-batched
Pandas UDFs over ``mapInPandas`` so each Python batch sees a columnar slice,
never a row at a time.

The container has no image/audio codecs, so the *real* decoders are stubs
behind NotImplementedError (clearly marked); a deterministic fake decoder
exercises the full Spark plumbing — schema, batching, partitioning — and is
oracle-checked end to end (payload bytes are derived from documents.text,
so DuckDB can verify lengths/hashes/frame counts from the text directly).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query

FRAME_BYTES = 32  # fake "video" frame size for frame sampling


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Build the multimodal frame: binary payload (UTF-8 bytes of text —
    deterministic stand-in for image bytes) + typed metadata map."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("format"), F.lit("fake/binary"),
            F.lit("source"), F.col("source"),
            F.lit("lang"), F.col("lang"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes) -> object:
    """REAL image decode — unavailable in this container (no PIL/opencv).

    Stub per the build contract: the Spark-side plumbing around it
    (attach_binary_payload → mapInPandas batches → typed output schema) is
    real and tested with the deterministic fake decoder below."""
    raise NotImplementedError(
        "image codecs not installed; wire PIL/torchvision here on a real cluster"
    )


@query(
    "multimodal_roundtrip",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_bytes,
           sha256(text) AS payload_sha,
           'fake/binary' AS media_format
    FROM documents
    """,
)
def multimodal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary + metadata columns round-tripped through Parquet, then
    feature-extracted: byte length and sha256 of the payload must equal
    what DuckDB computes from the source text (payload is its UTF-8)."""
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    framed = attach_binary_payload(docs)
    zone = os.path.join(tempfile.mkdtemp(prefix="mm_zone_"), "media")
    framed.write.mode("overwrite").parquet(zone)
    back = spark.read.parquet(zone)
    return back.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
        F.element_at("media_meta", "format").alias("media_format"),
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_bytes,
           ascii(substring(text, 1, 1)) AS first_byte,
           CAST(ceil(LENGTH(text) / 32.0) AS BIGINT) AS n_frames
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode step as an Arrow-batched mapInPandas kernel: each batch
    arrives columnar, the fake decoder extracts deterministic 'features'
    (length, first byte, frame count).  Swap `fake_decode` for a real codec
    and the plan — scan → repartition-free mapInPandas → downstream ops —
    is unchanged at 100 TB."""
    framed = attach_binary_payload(load_table(spark, sf_dir, "documents"))

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0]).astype("int32"),
                    "n_frames": payloads.map(
                        lambda b: (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                    ).astype("int64"),
                }
            )

    return framed.mapInPandas(
        fake_decode, schema="doc_id long, n_bytes long, first_byte int, n_frames long"
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(f.frame_idx AS INT) AS frame_idx,
           CAST(LEAST(32, LENGTH(text) - f.frame_idx * 32) AS INT) AS frame_len
    FROM documents,
         LATERAL (SELECT unnest(range(0, CAST(ceil(LENGTH(text) / 32.0) AS INT)))
                  AS frame_idx) f
    WHERE doc_id < 50
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one payload row explodes into per-frame rows
    (mapInPandas, one output row per 32-byte chunk) — the video-to-frames
    shape.  Row explosion happens inside the Arrow batch, no driver loop."""
    framed = attach_binary_payload(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_len = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i in range(0, (n + FRAME_BYTES - 1) // FRAME_BYTES):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_len.append(min(FRAME_BYTES, n - i * FRAME_BYTES))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_len": out_len}
            )

    return framed.mapInPandas(
        sample_frames, schema="doc_id long, frame_idx int, frame_len int"
    )
