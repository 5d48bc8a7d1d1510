"""Multimodal columns: binary payloads + typed metadata (SURVEY.md §2.11 L5).

Design: media travels as an opaque ``binary`` column beside a typed
metadata struct (format tag, byte length). All Python work runs through
``mapInPandas`` — Arrow-batched, one Python worker per partition, never
row-at-a-time — and projects the payload away as early as possible so big
blobs never ride a shuffle.

The actual image/audio decode libraries are NOT in this container, so
``decode_media`` is a clearly-marked stub (NotImplementedError). The
featurizer below uses a deterministic byte-level feature set instead, so
the Spark-side plumbing — schema, batch shape, partitioning — is fully real
and oracle-checkable (byte stats of a UTF-8 payload are recomputable in
SQL from the source text).

Scale notes (100 TB): payload columns dominate scan bytes — the plans keep
them in their own projection, filter on metadata FIRST (predicate pushdown
on the scalar columns), and only then touch bytes. ``binaryFile`` reads or
parquet binary columns both fit this shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.LongType()),       # sum(bytes) % 997
        T.StructField("first_byte", T.LongType()),
        T.StructField("last_byte", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: UTF-8 payload bytes + metadata struct.
    In production the payload column arrives from parquet binary columns or
    ``spark.read.format('binaryFile')``; the shape is identical."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/utf-8").alias("format"),
            F.length(payload).alias("byte_len"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, fmt: str) -> object:
    """STUB — real decode (PIL/librosa/av) is unavailable in this
    environment. The Arrow plumbing around it is real; swap this function
    body when the codec libraries exist."""
    raise NotImplementedError(
        f"media decode for {fmt!r} requires codec libraries not present here"
    )


def byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic byte-level feature extraction over the binary payload
    via mapInPandas (Arrow batches; pandas vectorized inside). Stands in
    for decode+featurize; identical dataflow shape."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: sum(b) % 997).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if b else -1).astype("int64"),
                    "last_byte": payloads.map(lambda b: b[-1] if b else -1).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_featurize, FEATURE_SCHEMA)
