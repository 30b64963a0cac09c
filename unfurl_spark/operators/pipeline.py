"""The Spark extract pipeline — fused P1+P4+C1-C15 over Arrow batches.

Replaces the reference's per-page async middleware chain
(unfurl/src/index.ts:171-188) with the idiomatic Spark plan (SURVEY.md §3):

    read (doc_id, spans)
      → salted repartition by xxhash64(doc_id)        # giant-doc skew defusal
      → mapInPandas(fused tokenize+normalize+extract)  # Arrow-batched, no
                                                       # per-row Python UDFs
      → spans + per-doc lineage columns

Sub-request documents (oembed payloads, JSON-LD remote contexts, media
payloads) are *broadcast side tables* — executors never touch the network
(the reference's two HTTP crossings, unfurl-html/src/index.ts:92-122 and
:146-172, become dictionary lookups).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import EXTRACTED

# One Arrow batch should stay well under executor memory even with 100×
# skew-tail documents (FIXTURES.md): 64 docs × ~1 MB typical ≈ 64 MB.
DEFAULT_ARROW_BATCH = 64


def session(app: str = "unfurl_spark", master: str | None = None,
            shuffle_partitions: int = 32) -> SparkSession:
    """Engine session defaults: AQE on, Arrow on, bounded batches."""
    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(DEFAULT_ARROW_BATCH))
        .config("spark.python.worker.faulthandler.enabled", "true")
        .getOrCreate()
    )


def extract_spans(
    df: DataFrame,
    oembed_df: DataFrame | None = None,
    context_store: dict | None = None,
    media_df: DataFrame | None = None,
    num_partitions: int | None = None,
    salt: bool = True,
) -> DataFrame:
    """(doc_id, spans[, status]) → (doc_id, spans, n_input_bytes, ok).

    ``oembed_df``: (ref, status, ctype, body) side table, broadcast to
    executors.  ``media_df``: (media_ref, ctype, payload) side table for
    media/pdf spans.  ``context_store``: {url: @context doc}.
    """
    spark = df.sparkSession
    sc = spark.sparkContext

    oembed_store = None
    if oembed_df is not None:
        oembed_store = {
            r["ref"]: (r["status"], r["ctype"], r["body"])
            for r in oembed_df.select("ref", "status", "ctype", "body")
            .collect()
        }
    media_store = None
    if media_df is not None:
        media_store = {
            r["media_ref"]: (r["ctype"], bytes(r["payload"]))
            for r in media_df.select("media_ref", "ctype", "payload")
            .collect()
        }
    b_oembed = sc.broadcast(oembed_store)
    b_media = sc.broadcast(media_store)
    b_ctx = sc.broadcast(context_store)

    has_status = "status" in df.columns
    cols = ["doc_id", "spans"] + (["status"] if has_status else [])
    narrow = df.select(*cols)

    if salt:
        # uniform redistribution by doc hash: a run of giant documents in
        # one input file cannot pin a single task (AQE cannot split a
        # skewed UDF stage input on its own — SURVEY.md §4)
        n = num_partitions or spark.sparkContext.defaultParallelism
        narrow = narrow.repartition(n, F.xxhash64("doc_id"))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..functions.engine import document_spans

        oe = b_oembed.value
        med = b_media.value
        ctx = b_ctx.value
        for pdf in batches:
            out_rows = []
            statuses = pdf["status"] if "status" in pdf.columns else None
            for i in range(len(pdf)):
                doc_id = pdf["doc_id"].iloc[i]
                spans = pdf["spans"].iloc[i]
                status = int(statuses.iloc[i]) if statuses is not None else 200
                in_spans = [dict(s) for s in spans]
                n_bytes = sum(len(s.get("text") or "") for s in in_spans)
                try:
                    spans_out = document_spans(
                        doc_id, in_spans, status=status,
                        oembed_store=oe, context_store=ctx,
                        media_store=med)
                    ok = "ok"
                except Exception as e:  # noqa: BLE001 — per-doc isolation
                    spans_out = []
                    ok = type(e).__name__
                out_rows.append((doc_id, spans_out, n_bytes, ok))
            yield pd.DataFrame(
                out_rows, columns=["doc_id", "spans", "n_input_bytes", "ok"])

    return narrow.mapInPandas(run, schema=EXTRACTED)
