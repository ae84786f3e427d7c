"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (SURVEY north-star): a multimodal table carries
``payload BINARY`` + ``media_type STRING`` + metadata struct. Decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — the Spark-side plumbing (schema,
partition-preserving iteration, batch shape) is real; the codec itself is
STUBBED because this container ships no image/audio libraries.

``extract_features`` uses a deterministic fake "decoder" (byte length +
md5) so the pipeline is testable end-to-end and oracle-checkable; swap
``_decode_stub`` for a real PIL/librosa call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, media_type string, n_bytes bigint, content_hash string"


def _decode_stub(payload: bytes) -> dict:
    """Deterministic stand-in for a media decoder.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload)).
    Raising NotImplementedError for codecs keeps the contract honest.
    """
    return {"n_bytes": len(payload), "content_hash": hashlib.md5(payload).hexdigest()}


def decode_real(payload: bytes, media_type: str):
    raise NotImplementedError(
        "media codecs (PIL/librosa/pyav) are not available in this container; "
        "use _decode_stub for plumbing tests"
    )


def as_media_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test harness: treat utf-8 text bytes as an opaque media payload."""
    return df.select(
        F.col(id_col),
        F.lit("image/fake").alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.

    Partition-preserving (no shuffle); at 100 TB each executor decodes its
    own partitions' payloads. Batch size is controlled by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "content_hash": feats.map(lambda d: d["content_hash"]),
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)
