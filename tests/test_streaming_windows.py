"""Watermarked windowed aggregation + stateful sessionization: the
streaming results must equal their batch twins after an availableNow
drain (exactly-once file source, closed windows/sessions only)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from unfurl_spark.streaming.windows import (
    batch_sessionize,
    batch_windowed_counts,
    sessionize,
    stream_windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def event_files(spark, tmp_path):
    """events.parquet split into several files — a file-source backlog."""
    src = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    in_dir = str(tmp_path / "in")
    src.repartition(4).write.parquet(in_dir)
    return in_dir, src


def test_windowed_counts_match_batch(spark, event_files, tmp_path):
    in_dir, src = event_files
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_windowed_counts(spark, in_dir, out, ckpt,
                               window="6 hours", watermark="1 hour")
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    exp = batch_windowed_counts(src, window="6 hours")
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch twin exactly, and the drain must close all but
    # the final watermark horizon
    j = got.alias("g").join(
        exp.alias("e"), ["window_start", "window_end", "event_type"],
        "left")
    assert got.count() > 0
    assert j.filter(
        (F.col("g.n_events") != F.col("e.n_events"))
        | (F.col("g.sum_value") != F.col("e.sum_value"))).count() == 0


def test_windowed_counts_resume_no_duplicates(spark, event_files,
                                              tmp_path):
    in_dir, src = event_files
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_windowed_counts(spark, in_dir, out, ckpt,
                               window="6 hours", watermark="1 hour")
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    # restart with the same checkpoint and no new files → nothing re-emitted
    q = stream_windowed_counts(spark, in_dir, out, ckpt,
                               window="6 hours", watermark="1 hour")
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1


def test_stateful_sessionize_matches_batch_twin(spark, event_files,
                                                tmp_path):
    in_dir, src = event_files
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    events = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .format("parquet").load(in_dir)
              .select("user_id", "ts"))
    q = (sessionize(events, gap_minutes=120)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    exp = batch_sessionize(src.select("user_id", "ts"), gap_minutes=120)
    assert got.count() > 0
    # one availableNow drain may arrive as several micro-batches, so the
    # stream can close sessions the single-pass batch twin leaves open —
    # every batch-closed session must appear in the stream output exactly
    g = {(r["user_id"], r["session_id"]): (r["n_events"],
                                           r["session_start"],
                                           r["session_end"])
         for r in got.collect()}
    for r in exp.collect():
        key = (r["user_id"], r["session_id"])
        assert key in g, f"missing closed session {key}"
        assert g[key][0] == r["n_events"]
        assert g[key][1] == r["session_start"]
        assert g[key][2] == r["session_end"]


def test_sessionize_group_larger_than_arrow_batch(spark, tmp_path):
    """A user with more events than one Arrow batch (2048) arrives at the
    stateful kernel as SEVERAL pandas chunks in arbitrary order — the
    kernel must sort globally, not per chunk (per-chunk sort produced
    negative gaps and phantom session splits)."""
    import random

    from pyspark.sql import Row

    random.seed(11)
    # 5000 events, one user, 10-minute steps with three 3-hour gaps;
    # write in SHUFFLED order so chunk order cannot accidentally be sorted
    base = 1_600_000_000
    ts = []
    t = base
    for i in range(5000):
        t += 600 + (10800 if i in (1500, 3000, 4500) else 0)
        ts.append(t)
    random.shuffle(ts)
    rows = [Row(user_id=7, ts=__import__("datetime").datetime.utcfromtimestamp(x))
            for x in ts]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(rows).coalesce(1).write.parquet(in_dir)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = (spark.readStream.schema("user_id long, ts timestamp")
              .format("parquet").load(in_dir))
    q = (sessionize(events, gap_minutes=120)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {r["session_id"]: r["n_events"]
           for r in spark.read.parquet(out).collect()}
    exp = {r["session_id"]: r["n_events"]
           for r in batch_sessionize(
               spark.read.parquet(in_dir), gap_minutes=120).collect()}
    assert got == exp and len(got) == 3
