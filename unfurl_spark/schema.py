"""Spark schemas for the interleaved-document engine (BASELINE input_hint)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN = StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
])

# input: one row per document, ordered span sequence
DOCUMENTS_RAW = StructType([
    StructField("doc_id", StringType(), nullable=False),
    StructField("spans", ArrayType(SPAN), nullable=False),
])

# output of the extract stage: same shape + per-doc lineage metrics
EXTRACTED = StructType([
    StructField("doc_id", StringType(), nullable=False),
    StructField("spans", ArrayType(SPAN), nullable=False),
    StructField("n_input_bytes", LongType()),
    StructField("ok", StringType()),  # 'ok' | error class name
])

# checkpoint/metrics table: one row per (partition, attempt)
METRICS = StructType([
    StructField("run_id", StringType()),
    StructField("partition_id", IntegerType()),
    StructField("attempt", IntegerType()),
    StructField("n_docs", LongType()),
    StructField("n_bytes", LongType()),
    StructField("n_failures", LongType()),
    StructField("wall_sec", StringType()),
])

OUTPUT_SPAN_KINDS = ("title", "description", "og_image", "jsonld",
                     "body_text", "media")
