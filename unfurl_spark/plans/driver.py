"""Production job driver — ``spark-submit --py-files unfurl_spark.zip
unfurl_spark/plans/driver.py --input ... --output ...``.

Implements the engine contract's operational envelope (BASELINE.json
north_rule): salted repartitioning, AQE-coalesced shuffles, and
**per-partition checkpointed lineage + metrics** so any bucket can resume
idempotently:

* documents are assigned to B deterministic buckets by
  ``pmod(xxhash64(doc_id), B)``;
* output is written partitioned by bucket with dynamic partition overwrite
  (a re-run of a bucket replaces, never duplicates);
* after each chunk of buckets commits, one metrics row per bucket
  (docs, bytes, failures, wall sec) is appended to the metrics table and a
  done-marker recorded; a restarted run anti-joins the done set and only
  processes the remainder.

Table format goes through ``sources/tables.py``: Iceberg
(`overwritePartitions` / `append`) when the catalog jars are present,
parquet dynamic-partition-overwrite otherwise — the same idempotence
contract either way.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _done_buckets(spark: SparkSession, metrics_dir: str,
                  n_buckets: int) -> set[int]:
    """Committed buckets for THIS bucketing scheme.  Rows written under a
    different --buckets value are ignored: bucket ids from another modulus
    name different document sets, so honoring them would skip or duplicate
    docs.  A full re-run under the new modulus rewrites every partition
    (dynamic overwrite), which self-heals the layout."""
    try:
        m = spark.read.parquet(metrics_dir)
    except Exception:  # noqa: BLE001 — first run, no metrics yet
        return set()
    if "n_buckets" not in m.columns:  # pre-versioned metrics: invalidate
        return set()
    rows = (m.filter((F.col("status") == "committed")
                     & (F.col("n_buckets") == n_buckets))
            .select("bucket").distinct().collect())
    return {r["bucket"] for r in rows}


def _done_media_buckets(spark: SparkSession, metrics_dir: str,
                        n_buckets: int, ops) -> set[int]:
    """Committed media buckets whose recorded op set COVERS the requested
    one.  A first run with ops=(decode,) must not mark buckets done for a
    later run that adds features/resize/frames — the extra tables would be
    silently left missing data.  Metrics rows carry the comma-joined op
    set; a bucket resumes only when every requested op was committed."""
    required = set(ops) | {"decode"}
    try:
        m = spark.read.parquet(metrics_dir)
    except Exception:  # noqa: BLE001 — first run, no metrics yet
        return set()
    if "n_buckets" not in m.columns:  # pre-versioned metrics: invalidate
        return set()
    m = m.filter((F.col("status") == "committed")
                 & (F.col("n_buckets") == n_buckets))
    if "ops" not in m.columns:
        # legacy rows with no op lineage: only honorable when nothing
        # beyond the always-on decode pass is requested
        if required <= {"decode"}:
            return {r["bucket"]
                    for r in m.select("bucket").distinct().collect()}
        return set()
    done_ops: dict[int, set[str]] = {}
    for r in m.select("bucket", "ops").distinct().collect():
        done_ops.setdefault(r["bucket"], set()).update(
            o for o in (r["ops"] or "").split(",") if o)
    return {b for b, s in done_ops.items() if required <= s}


def _chunk_stats(spark: SparkSession, data_dir: str, chunk: list[int],
                 agg_exprs: list, zero_cols: dict):
    """Per-bucket stats for a committed chunk, read back from the data
    table.  Total over two edge cases: a bucket with ZERO rows still gets
    a committed metrics row (else resume would reprocess it forever), and
    a data dir with no parquet files yet (every bucket in the first chunk
    empty) must not crash schema inference."""
    buckets = spark.createDataFrame([(int(b),) for b in chunk],
                                    "bucket int")
    try:
        agg = (spark.read.parquet(data_dir)
               .filter(F.col("bucket").isin(chunk))
               .groupBy("bucket").agg(*agg_exprs))
    except Exception:  # noqa: BLE001 — empty table, no schema
        agg = None
    if agg is None:
        out = buckets
        for name, zero in zero_cols.items():
            out = out.withColumn(name, F.lit(zero))
        return out
    out = buckets.join(agg, "bucket", "left")
    for name, zero in zero_cols.items():
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(zero)))
    return out


def run_context_prepass(spark: SparkSession, input_path: str,
                        output_dir: str,
                        context_store: dict | None = None) -> int:
    """Pre-flight stage: scan the corpus for remote JSON-LD @context URLs
    the offline store cannot satisfy and write the fetch-list table
    (context_url, n_docs, sample_doc_id) under <output>/context_fetch_list.
    An out-of-band fetcher turns that list into store entries before the
    main run — executors never touch the network.  Returns the number of
    unresolved context URLs found."""
    from unfurl_spark.operators.context_prepass import context_fetch_list
    from unfurl_spark.sources.tables import read_table

    docs = read_table(spark, input_path).select("doc_id", "spans")
    out = context_fetch_list(docs, context_store)
    path = os.path.join(output_dir, "context_fetch_list")
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def run_media_job(spark: SparkSession, media_path: str, output_dir: str,
                  ops: tuple = ("decode",), n_buckets: int = 16,
                  buckets_per_job: int = 4,
                  run_id: str | None = None) -> dict:
    """Multimodal stage with the same operational envelope as the
    extraction job: media payloads bucketed by ``pmod(xxhash64(
    media_ref), B)``, per-bucket idempotent overwrite, per-bucket
    metrics + done-markers, restart resumes the remainder.

    ``ops`` ⊆ {decode, features, resize, frames}: decode always writes
    ``<out>/media_meta`` (container/dims/ok lineage — the cheap
    header+codec pass); the others add their own bucketed tables.
    """
    from unfurl_spark.functions.multimodal import (decode_media,
                                                   extract_features,
                                                   resize_images,
                                                   sample_frames)
    from unfurl_spark.sources.tables import (append_metrics, read_table,
                                             write_bucketed)

    run_id = run_id or f"media-{int(time.time())}"
    out_metrics = os.path.join(output_dir, "media_metrics")
    bucket_of = F.pmod(F.xxhash64("media_ref"),
                       F.lit(n_buckets)).cast("int")

    media = read_table(spark, media_path).withColumn("bucket", bucket_of)
    done = _done_media_buckets(spark, out_metrics, n_buckets, ops)
    todo = [b for b in range(n_buckets) if b not in done]
    summary = {"run_id": run_id, "resumed_buckets": sorted(done),
               "processed_buckets": [], "n_media": 0, "n_decoded": 0,
               "n_codec_unavailable": 0, "n_errors": 0}

    extra = {"features": lambda df: extract_features(df),
             "resize": lambda df: resize_images(df),
             "frames": lambda df: sample_frames(df)}

    for i in range(0, len(todo), buckets_per_job):
        chunk = todo[i:i + buckets_per_job]
        t0 = time.time()
        part = media.filter(F.col("bucket").isin(chunk)) \
                    .select("media_ref", "ctype", "payload")
        meta = decode_media(part).withColumn("bucket", bucket_of)
        write_bucketed(meta, os.path.join(output_dir, "media_meta"))
        for op in ops:
            if op in extra:
                out = extra[op](part).withColumn("bucket", bucket_of)
                write_bucketed(out,
                               os.path.join(output_dir, f"media_{op}"))
        wall = time.time() - t0

        stats = (_chunk_stats(
                    spark, os.path.join(output_dir, "media_meta"), chunk,
                    [F.count("*").alias("n_media"),
                     F.sum(F.when(F.col("ok") == "ok", 1).otherwise(0))
                      .alias("n_decoded"),
                     F.sum(F.when(F.col("ok") == "codec:unavailable", 1)
                           .otherwise(0)).alias("n_codec_unavailable"),
                     F.sum(F.when(F.col("ok").startswith("err:"), 1)
                           .otherwise(0)).alias("n_errors")],
                    {"n_media": 0, "n_decoded": 0,
                     "n_codec_unavailable": 0, "n_errors": 0})
                 .withColumn("run_id", F.lit(run_id))
                 .withColumn("status", F.lit("committed"))
                 .withColumn("n_buckets", F.lit(n_buckets))
                 .withColumn("ops", F.lit(
                     ",".join(sorted(set(ops) | {"decode"}))))
                 .withColumn("wall_sec", F.lit(round(wall, 3))))
        append_metrics(stats, out_metrics)
        agg = stats.agg(F.sum("n_media"), F.sum("n_decoded"),
                        F.sum("n_codec_unavailable"),
                        F.sum("n_errors")).collect()[0]
        summary["processed_buckets"].extend(chunk)
        summary["n_media"] += agg[0] or 0
        summary["n_decoded"] += agg[1] or 0
        summary["n_codec_unavailable"] += agg[2] or 0
        summary["n_errors"] += agg[3] or 0

    return summary


def run_job(spark: SparkSession, input_path: str, output_dir: str,
            oembed_path: str | None = None, media_path: str | None = None,
            n_buckets: int = 16, buckets_per_job: int = 4,
            run_id: str | None = None,
            side_mode: str = "broadcast") -> dict:
    # absolute import: this file doubles as a spark-submit entry script
    # (no parent package when launched via --py-files + script path)
    from unfurl_spark.operators.pipeline import (extract_spans,
                                                 extract_spans_media_join,
                                                 extract_spans_twopass)
    from unfurl_spark.sources.tables import (append_metrics, read_table,
                                             write_bucketed)

    run_id = run_id or f"run-{int(time.time())}"
    out_data = os.path.join(output_dir, "spans")
    out_metrics = os.path.join(output_dir, "metrics")

    docs = read_table(spark, input_path).withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))
    oembed_df = read_table(spark, oembed_path) if oembed_path else None
    media_df = read_table(spark, media_path) if media_path else None

    done = _done_buckets(spark, out_metrics, n_buckets)
    todo = [b for b in range(n_buckets) if b not in done]
    summary = {"run_id": run_id, "resumed_buckets": sorted(done),
               "processed_buckets": [], "n_docs": 0, "n_failures": 0}

    for i in range(0, len(todo), buckets_per_job):
        chunk = todo[i:i + buckets_per_job]
        t0 = time.time()
        part = docs.filter(F.col("bucket").isin(chunk))
        sel = part.select("doc_id", "spans",
                          *(["status"] if "status" in docs.columns else []))
        if side_mode == "join":
            # 10^12-doc regime: side tables too large to broadcast —
            # oembed via two-pass href join, media payloads via
            # explode + equi-join (pipeline.py)
            if media_df is not None:
                extracted = extract_spans_media_join(
                    sel, media_df, oembed_df=oembed_df, join_oembed=True)
            elif oembed_df is not None:
                extracted = extract_spans_twopass(sel, oembed_df)
            else:
                extracted = extract_spans(sel)
        else:
            extracted = extract_spans(
                sel, oembed_df=oembed_df, media_df=media_df)
        # bucket is a pure function of doc_id — recompute instead of
        # joining back against the input table (that join is a full extra
        # shuffle of the span payload at scale)
        result = extracted.withColumn(
            "bucket",
            F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))

        # idempotent data commit: replace exactly these buckets
        # (Iceberg overwritePartitions / parquet dynamic overwrite)
        write_bucketed(result, out_data)
        wall = time.time() - t0

        # lineage metrics, one row per bucket (appended after data commit)
        stats = (_chunk_stats(
                    spark, out_data, chunk,
                    [F.count("*").alias("n_docs"),
                     F.sum("n_input_bytes").alias("n_bytes"),
                     F.sum(F.when(F.col("ok") != "ok", 1).otherwise(0))
                      .alias("n_failures")],
                    {"n_docs": 0, "n_bytes": 0, "n_failures": 0})
                 .withColumn("run_id", F.lit(run_id))
                 .withColumn("status", F.lit("committed"))
                 .withColumn("n_buckets", F.lit(n_buckets))
                 .withColumn("wall_sec", F.lit(round(wall, 3)))
                 .withColumn("docs_per_sec",
                             F.round(F.col("n_docs") / F.lit(wall), 1)))
        append_metrics(stats, out_metrics)
        agg = stats.agg(F.sum("n_docs"), F.sum("n_failures")).collect()[0]
        summary["processed_buckets"].extend(chunk)
        summary["n_docs"] += agg[0] or 0
        summary["n_failures"] += agg[1] or 0

    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--oembed")
    ap.add_argument("--media")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--buckets-per-job", type=int, default=4)
    ap.add_argument("--run-id")
    ap.add_argument("--side-mode", choices=("broadcast", "join"),
                    default="broadcast",
                    help="side-table strategy: broadcast (fits executors) "
                         "or join (10^12-doc regime, no broadcast)")
    ap.add_argument("--context-prepass", action="store_true",
                    help="run ONLY the remote-context fetch-list pre-pass "
                         "and exit (writes <output>/context_fetch_list)")
    ap.add_argument("--media-job",
                    help="run the multimodal stage instead of extraction: "
                         "comma list of ops from decode,features,resize,"
                         "frames (decode always included); --input is the "
                         "media payload table")
    ap.add_argument("--master")
    args = ap.parse_args()

    from unfurl_spark.operators.pipeline import session

    spark = session(app="unfurl_spark_driver", master=args.master)
    if args.media_job:
        ops = tuple(o.strip() for o in args.media_job.split(",") if o.strip())
        summary = run_media_job(spark, args.input, args.output, ops=ops,
                                n_buckets=args.buckets,
                                buckets_per_job=args.buckets_per_job,
                                run_id=args.run_id)
        print(json.dumps(summary))
        spark.stop()
        return
    if args.context_prepass:
        n = run_context_prepass(spark, args.input, args.output)
        print(json.dumps({"unresolved_context_urls": n,
                          "fetch_list": os.path.join(
                              args.output, "context_fetch_list")}))
        spark.stop()
        return
    summary = run_job(spark, args.input, args.output,
                      oembed_path=args.oembed, media_path=args.media,
                      n_buckets=args.buckets,
                      buckets_per_job=args.buckets_per_job,
                      run_id=args.run_id, side_mode=args.side_mode)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
