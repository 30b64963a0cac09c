"""Driver multimodal job: bucketed idempotent writes, per-bucket
metrics with ok-taxonomy counts, and restart-resume — the same
operational envelope the extraction job has."""

from pyspark.sql import functions as F

from unfurl_spark.plans.driver import run_media_job
from unfurl_spark.sources.synthetic import write_corpus


def test_media_job_decode_resume(spark, tmp_path):
    corpus = write_corpus(str(tmp_path / "corpus"), 120, seed=7)
    out = str(tmp_path / "out")

    s1 = run_media_job(spark, corpus["media_payloads"], out,
                       ops=("decode", "features"), n_buckets=6,
                       buckets_per_job=3, run_id="r1")
    assert sorted(s1["processed_buckets"]) == list(range(6))
    assert s1["n_media"] > 0
    # corpus media = real PNGs (decode) + PDFs (no pixel codec)
    assert s1["n_decoded"] > 0
    assert s1["n_codec_unavailable"] > 0
    assert s1["n_errors"] == 0
    assert s1["n_media"] == (s1["n_decoded"] + s1["n_codec_unavailable"])

    meta = spark.read.parquet(f"{out}/media_meta")
    feats = spark.read.parquet(f"{out}/media_features")
    assert meta.count() == s1["n_media"]
    assert feats.count() == s1["n_media"]
    pngs = meta.filter(F.col("container") == "png")
    assert pngs.filter(F.col("ok") != "ok").count() == 0
    assert pngs.filter(F.col("width").isNull()).count() == 0

    # restart: every bucket committed → nothing to do, output unchanged
    s2 = run_media_job(spark, corpus["media_payloads"], out,
                       ops=("decode", "features"), n_buckets=6,
                       buckets_per_job=3, run_id="r2")
    assert s2["processed_buckets"] == []
    assert sorted(s2["resumed_buckets"]) == list(range(6))
    assert spark.read.parquet(f"{out}/media_meta").count() == s1["n_media"]


def test_media_job_partial_resume(spark, tmp_path):
    corpus = write_corpus(str(tmp_path / "corpus"), 80, seed=9)
    out = str(tmp_path / "out")
    s1 = run_media_job(spark, corpus["media_payloads"], out,
                       ops=("decode",), n_buckets=4, buckets_per_job=4,
                       run_id="p1")
    total = s1["n_media"]
    # wipe metrics for buckets 2,3 to simulate a crash between chunks
    m = spark.read.parquet(f"{out}/media_metrics") \
             .filter(F.col("bucket") < 2).cache()
    m.count()
    m.write.mode("overwrite").parquet(f"{out}/media_metrics")
    s2 = run_media_job(spark, corpus["media_payloads"], out,
                       ops=("decode",), n_buckets=4, buckets_per_job=4,
                       run_id="p2")
    assert sorted(s2["resumed_buckets"]) == [0, 1]
    assert sorted(s2["processed_buckets"]) == [2, 3]
    # idempotent overwrite: total row count is stable
    assert spark.read.parquet(f"{out}/media_meta").count() == total


def test_media_job_resume_is_op_aware(spark, tmp_path):
    """A decode-only first run must NOT satisfy a later run that adds
    features: buckets re-run so media_features is complete, and the
    re-run is itself idempotent."""
    corpus = write_corpus(str(tmp_path / "corpus"), 60, seed=11)
    out = str(tmp_path / "out")
    s1 = run_media_job(spark, corpus["media_payloads"], out,
                       ops=("decode",), n_buckets=4, buckets_per_job=4,
                       run_id="o1")
    total = s1["n_media"]
    import os
    assert not os.path.exists(f"{out}/media_features")

    s2 = run_media_job(spark, corpus["media_payloads"], out,
                       ops=("decode", "features"), n_buckets=4,
                       buckets_per_job=4, run_id="o2")
    # decode-only commits don't cover features → all buckets reprocess
    assert sorted(s2["processed_buckets"]) == [0, 1, 2, 3]
    assert s2["resumed_buckets"] == []
    feats = spark.read.parquet(f"{out}/media_features")
    assert feats.count() == total
    assert "ok" in feats.columns  # lineage column persisted

    # now the superset run IS resumable, and so is the decode-only one
    s3 = run_media_job(spark, corpus["media_payloads"], out,
                       ops=("decode", "features"), n_buckets=4,
                       buckets_per_job=4, run_id="o3")
    assert s3["processed_buckets"] == []
    s4 = run_media_job(spark, corpus["media_payloads"], out,
                       ops=("decode",), n_buckets=4, buckets_per_job=4,
                       run_id="o4")
    assert s4["processed_buckets"] == []
