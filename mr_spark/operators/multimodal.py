"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata. The container has no decode libraries, so the decode step is
a clearly-marked deterministic stub — but the Spark-side plumbing (schema,
partitioning, Arrow batch shape, mapInPandas signature) is real and tested.

``documents.text`` stands in for the payload source: we materialize a
``binary`` column (utf-8 bytes) exactly as a real pipeline would carry JPEG
bytes read from object storage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query

FEATURE_DIM = 16


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           source AS container
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque payload: byte length + content digest.
    This is the manifest-building step of a multimodal pipeline — pure
    column expressions, no decode needed."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.col("source").alias("container"),
    )


def decode_image(payload: bytes) -> "object":
    """Decode an image payload → pixel array. STUB: the image libraries
    (Pillow/opencv) are not in this container. A real deployment replaces
    this body with e.g. ``PIL.Image.open(io.BytesIO(payload))``."""
    raise NotImplementedError("image decode requires Pillow/opencv — not in this container")


def _byte_histogram(payload: bytes) -> list[float]:
    """Deterministic fake feature extractor standing in for decode →
    resize → embed: a 16-bin byte histogram, L1-normalized. Keeps the
    Arrow batch shape and output schema identical to a real extractor."""
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, feature array<double>"
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one out. At scale each batch
    is ~10k rows × payload bytes; the per-batch loop is where a vectorized
    decoder (numpy/torch) slots in."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.str.len().astype("int64"),
                "feature": [_byte_histogram(p) for p in payloads],
            }
        )


@query("image_features_stub", oracle=None)  # Pandas-UDF pipeline → rows-only
def image_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches). The decode step is stubbed (see decode_image) with a
    deterministic byte-histogram; partitioning: payload-bearing rows are
    repartitioned so batches are balanced regardless of upstream file
    layout — at 100 TB this is the step that sizes GPU/decoder batches."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    balanced = payloads.repartition("doc_id")
    return balanced.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)
