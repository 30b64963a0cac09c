"""Streaming exact-dedup (dropDuplicatesWithinWatermark): an availableNow
drain keeps exactly one row per fingerprint and matches the batch
earliest-keeper twin on fingerprint set."""

import pytest
from pyspark.sql import functions as F

from unfurl_spark.streaming.windows import (
    batch_dedup_exact_keepers,
    stream_dedup_exact,
)


@pytest.fixture()
def doc_stream_dir(spark, tmp_path):
    rows = []
    base = 1_700_000_000
    for i in range(300):
        text = f"document body {i % 100}"   # 3 copies of each of 100 texts
        rows.append((f"d{i:04d}", base + i * 60, text))
    df = spark.createDataFrame(rows, "doc_id string, epoch long, text string") \
        .select("doc_id", F.col("epoch").cast("timestamp").alias("ts"),
                "text")
    src = str(tmp_path / "src")
    df.coalesce(2).write.parquet(src)
    return src


def test_stream_dedup_matches_batch_keepers(spark, doc_stream_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_dedup_exact(spark, doc_stream_dir, out, ckpt,
                           watermark="24 hours")
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # one survivor per distinct text
    assert got.count() == 100
    assert got.select("fp").distinct().count() == 100

    batch = batch_dedup_exact_keepers(
        spark.read.parquet(doc_stream_dir))
    # same fingerprint set as the batch keeper twin (the stream keeps the
    # first ARRIVAL, which in a single drain is micro-batch dependent, so
    # compare on fp not doc_id)
    sfp = {r.fp for r in got.select("fp").collect()}
    bfp = {r.fp for r in batch.select("fp").collect()}
    assert sfp == bfp
