"""Structured Streaming: incremental extraction with exactly-once resume."""

import shutil

from unfurl_spark.sources.synthetic import write_corpus
from unfurl_spark.streaming.stream import stream_extract


def test_stream_extract_incremental(spark, tmp_path):
    c1 = write_corpus(str(tmp_path / "c1"), 120, seed=1)
    c2 = write_corpus(str(tmp_path / "c2"), 80, seed=2)
    inp = tmp_path / "in"
    inp.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    shutil.copy(c1["documents_raw"], inp / "part-001.parquet")
    q = stream_extract(spark, str(inp), out, ckpt)
    q.awaitTermination(300)
    first = spark.read.parquet(out)
    assert first.count() == 120
    assert first.filter("ok <> 'ok'").count() == 0

    # drop a new file; restart from the same checkpoint → only the new
    # file is processed (no duplicates)
    shutil.copy(c2["documents_raw"], inp / "part-002.parquet")
    q2 = stream_extract(spark, str(inp), out, ckpt)
    q2.awaitTermination(300)
    final = spark.read.parquet(out)
    assert final.count() == 200

    # third restart with no new data → nothing re-processed
    q3 = stream_extract(spark, str(inp), out, ckpt)
    q3.awaitTermination(300)
    assert spark.read.parquet(out).count() == 200
