"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the decode step is a
clearly-marked stub (``decode_image_stub``) — the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real and tested:

- ``attach_binary``      — materialize a binary payload column + metadata
- ``extract_binary_meta``— pure-Column metadata (lengths, magic bytes)
- ``map_binary_batches`` — the mapInPandas harness a real decoder plugs
  into: batched bytes→features with a declared output schema

At scale, binary payloads dominate row size: keep them in their own
column, set ``spark.sql.files.maxPartitionBytes`` low enough that a batch
of payloads fits executor memory, and never groupBy a payload column —
aggregate on the metadata, join back by key.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def attach_binary(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Fixture adapter: deterministic fake payload (UTF-8 bytes of the
    text) standing in for image/audio bytes, plus typed metadata."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def extract_binary_meta(df: DataFrame, *, key_col: str = "doc_id") -> DataFrame:
    """Metadata extraction without touching Python: byte length and a
    magic-prefix hex — the pattern for content-type sniffing at scale."""
    return df.select(
        F.col(key_col),
        F.octet_length("payload").cast("long").alias("byte_len"),
        F.lower(F.substring(F.hex(F.col("payload")), 1, 8)).alias("magic_hex"),
        "media_type",
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB — image decode requires PIL/libjpeg, absent in this container.
    A real deployment replaces this with PIL.Image.open(BytesIO(payload));
    the harness around it (batching, schema, partitioning) is unchanged."""
    raise NotImplementedError(
        "image decode stubbed: no imaging libraries in this environment"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for the decoder so the plumbing is testable:
    'dimensions' derived from payload bytes."""
    return {
        "width": len(payload) % 640,
        "height": (payload[0] if payload else 0) * 4,
        "n_bytes": len(payload),
    }


def map_binary_batches(
    df: DataFrame,
    out_schema: StructType | str,
    decoder: Callable[[bytes], dict] = fake_decode,
    *,
    key_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """The real harness: Arrow-batched bytes→features. ``decoder`` runs
    per payload inside a pandas batch (vectorized transfer, amortized
    Python cost); output schema is declared so Catalyst plans downstream
    ops normally."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, key_col, pdf[key_col].values)
            yield out

    return df.select(key_col, payload_col).mapInPandas(process, schema=out_schema)
