"""The Spark extract pipeline — fused P1+P4+C1-C15 over Arrow batches.

Replaces the reference's per-page async middleware chain
(unfurl/src/index.ts:171-188) with the idiomatic Spark plan (SURVEY.md §3):

    read (doc_id, spans)
      → JVM flatten (nested spans never cross into Python or the shuffle)
      → salted repartition by xxhash64(doc_id)        # giant-doc skew defusal
      → mapInArrow(fused tokenize+normalize+extract)   # columnar both ways,
                                                       # no per-row Python
      → spans + per-doc lineage columns

Sub-request documents (oembed payloads, JSON-LD remote contexts, media
payloads) are side tables — executors never touch the network (the
reference's two HTTP crossings, unfurl-html/src/index.ts:92-122 and
:146-172, become table lookups).  Two scale regimes: broadcast stores
(`extract_spans`) when the tables fit executors, distributed shuffle
joins (`extract_spans_twopass`, `extract_spans_media_join`) when at
10^12 documents they cannot — outputs bit-identical either way.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import EXTRACTED

# One Arrow batch should stay well under executor memory even with 100×
# skew-tail documents (FIXTURES.md): 2048 docs × ~100 KB tail ≈ 200 MB peak
# per concurrent task; typical docs are ~1-2 KB (≈4 MB/batch).  Measured at
# local[32] on the 100k-doc bench: 2048-row batches beat 1024 by ~15%
# (fewer JVM↔Python crossings) and 4096 by ~8% (cache pressure); 256-row
# batches cost ~1.7× in per-batch crossing overhead.  Truly giant documents
# are byte-capped upstream (S3 projection) before the Python stage.
DEFAULT_ARROW_BATCH = 2048

# Per-worker-process cache of deserialized broadcast values.  PySpark
# re-reads a broadcast's pickle file on EVERY task (the Broadcast object is
# recreated with each task's closure); for multi-MB side tables that costs
# as much as the actual kernel work.  Worker processes are reused across
# tasks, so a module-level cache keyed by the broadcast file path amortizes
# the load to once per worker.
_WORKER_BROADCAST_CACHE: dict = {}


def _bvalue(b):
    if b is None:
        return None
    key = getattr(b, "_path", None) or id(b)
    if key not in _WORKER_BROADCAST_CACHE:
        _WORKER_BROADCAST_CACHE[key] = b.value
    return _WORKER_BROADCAST_CACHE[key]


def session_configs(profile: str = "local", master: str | None = None,
                    shuffle_partitions: int = 32,
                    checkpoint_dir: str | None = None) -> dict[str, str]:
    """The engine's Spark config set as a pure, testable function of the
    deployment profile (SCALE.md "Input layout" / "Side tables").

    ``profile="local"`` — this sandbox: single JVM, one shared memory bus,
    a handful of small parquet files.  ``profile="cluster"`` — the
    north-rule deployment: 1000 executors reading ~400k × 256 MB Iceberg
    parquet files over a network.  The two differ exactly where the
    hardware differs:

    * ``maxPartitionBytes`` — local 1 MB keeps the scan of a single
      ~160 MB test file as parallel as the box; at 100 TB a 1 MB split
      size would mean ~10^8 scheduler tasks (driver listing/scheduling
      blow-up), so cluster uses 256 MB, matching the table's file size
      (one split per file, ~400k tasks).
    * shuffle compression — local shuffle bytes never cross a network
      (tmpfs, measured ~5% pure CPU loss from lz4) so it's off; cluster
      shuffles ~100 TB worker-to-worker, compression stays on (default).
    * ``spark.local.dir`` — local uses /dev/shm to keep /tmp jitter out
      of the scaling signal; cluster leaves it to the site's node-local
      NVMe configuration.
    * checkpoint dir — cluster jobs set a durable (DFS) checkpoint dir so
      the driver's resumable bucket loop (plans/driver.py) and any
      truncated lineage survive executor loss; meaningless on one box.
    * executor shape — cluster pins the SCALE.md arithmetic (16 cores ×
      16 GB; ~5 GB steady-state per executor leaves 3× headroom for the
      skew tail); local mode has no executors to shape.
    """
    import os

    common = {
        # moderate heap: measured on this box, a 48g heap made G1 regions
        # huge and scan+shuffle stages 3-4× slower/noisier than 16g; 16g
        # comfortably holds 32 concurrent document-batch tasks
        "spark.driver.memory": "16g",
        "spark.driver.maxResultSize": "8g",
        # pin the SQL timezone: pandas-side kernels (the stateful
        # sessionizer) read tz-naive timestamps rendered in the SESSION
        # zone and re-emit them as UTC instants — on a non-UTC host the
        # default (JVM local zone) would shift every emitted timestamp
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # skew backstop for the media join's hot media_refs (SCALE.md)
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch":
            str(DEFAULT_ARROW_BATCH),
        "spark.python.worker.faulthandler.enabled": "true",
    }
    if profile == "cluster":
        common.update({
            # one split per ~256 MB Iceberg data file: ~400k tasks at
            # 100 TB, not the ~10^8 a 1 MB split size would produce
            "spark.sql.files.maxPartitionBytes": "256m",
            "spark.executor.memory": "16g",
            "spark.executor.cores": "16",
            # kernel stage is CPU-bound; default parallelism follows cores
            "spark.executor.memoryOverhead": "4g",
            # pyspark workers (the mapInArrow kernels) live outside the
            # JVM heap: SCALE.md's ~5 GB/executor steady state
            "spark.executor.pyspark.memory": "6g",
            "spark.shuffle.compress": "true",
            "spark.shuffle.spill.compress": "true",
            # large shuffles: fewer, bigger fetch requests
            "spark.reducer.maxSizeInFlight": "96m",
            "spark.shuffle.file.buffer": "1m",
            # decommission/retry hygiene for thousand-executor fleets
            "spark.stage.maxConsecutiveAttempts": "8",
            "spark.checkpoint.dir": checkpoint_dir or "/tmp/unfurl-ckpt",
        })
    else:
        common["spark.sql.files.maxPartitionBytes"] = "1m"
        if master and master.startswith("local"):
            if os.path.isdir("/dev/shm"):
                # local-mode-ONLY shuffle files on tmpfs: a real cluster
                # writes shuffle to node-local NVMe (RAM-backed tmpfs would
                # blow up at scale); on this box /tmp jitter (2× trial
                # variance, measured) would otherwise dominate the scaling
                # signal
                common["spark.local.dir"] = "/dev/shm/spark-tmp"
            # shuffle blocks never cross a network in local mode and tmpfs
            # bytes are free — lz4 is pure CPU overhead here (~5% measured)
            common["spark.shuffle.compress"] = "false"
            common["spark.shuffle.spill.compress"] = "false"
        if checkpoint_dir:
            common["spark.checkpoint.dir"] = checkpoint_dir
    return common


def session(app: str = "unfurl_spark", master: str | None = None,
            shuffle_partitions: int = 32, profile: str | None = None,
            checkpoint_dir: str | None = None) -> SparkSession:
    """Engine session defaults: AQE on, Arrow on, bounded batches.

    ``profile`` defaults by master: ``local[...]``/unset → "local"
    (sandbox values), anything else (yarn, k8s://, spark://) →
    "cluster" (SCALE.md deployment values).  See ``session_configs``.
    """
    if profile is None:
        profile = ("local" if master is None or master.startswith("local")
                   else "cluster")
    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    for k, v in session_configs(profile, master=master,
                                shuffle_partitions=shuffle_partitions,
                                checkpoint_dir=checkpoint_dir).items():
        b = b.config(k, v)
    return b.getOrCreate()


def dedup_on_key(df: DataFrame, key: str) -> DataFrame:
    """Deterministic one-row-per-key dedup for side tables: keep the
    lexicographically greatest struct of the remaining columns.  Unlike
    ``dropDuplicates`` (arbitrary row) or the old collect-order dict build
    (last row wins in a nondeterministic order), this picks the SAME row in
    the broadcast and shuffle-join regimes, preserving the bit-identical
    contract even when a side table carries duplicate keys."""
    cols = [c for c in df.columns if c != key]
    return (df.groupBy(key)
              .agg(F.max(F.struct(*cols)).alias("_s"))
              .select(key, *[F.col(f"_s.{c}").alias(c) for c in cols]))


class SideTables:
    """Broadcast handles for the record-scoped lookup tables.  Build ONCE
    per job and pass to every ``extract_spans`` call — the driver-side
    collect + pickle of these tables is seconds of single-threaded work."""

    __slots__ = ("oembed", "media", "contexts")

    def __init__(self, oembed, media, contexts):
        self.oembed = oembed
        self.media = media
        self.contexts = contexts


def broadcast_side_tables(spark: SparkSession,
                          oembed_df: DataFrame | None = None,
                          media_df: DataFrame | None = None,
                          context_store: dict | None = None) -> SideTables:
    sc = spark.sparkContext
    oembed_store = None
    if oembed_df is not None:
        oembed_df = dedup_on_key(
            oembed_df.select("ref", "status", "ctype", "body"), "ref")
        t = oembed_df.select("ref", "status", "ctype", "body").toArrow()
        oembed_store = dict(zip(
            t.column("ref").to_pylist(),
            zip(t.column("status").to_pylist(), t.column("ctype").to_pylist(),
                t.column("body").to_pylist()),
        ))
    media_store = None
    if media_df is not None:
        media_df = dedup_on_key(
            media_df.select("media_ref", "ctype", "payload"), "media_ref")
        t = media_df.select("media_ref", "ctype", "payload").toArrow()
        media_store = dict(zip(
            t.column("media_ref").to_pylist(),
            zip(t.column("ctype").to_pylist(),
                t.column("payload").to_pylist()),
        ))
    return SideTables(sc.broadcast(oembed_store), sc.broadcast(media_store),
                      sc.broadcast(context_store))


def narrow_columns(df: DataFrame, assume_sorted: bool = False
                   ) -> DataFrame:
    """JVM-side flattening BEFORE the exchange: the nested spans column
    never crosses into Python (nested array<struct> → Arrow → object
    conversion is the dominant cost otherwise) and never crosses the
    shuffle either — profiled on this box, shuffle-writing the raw
    nested rows costs ~2× the whole flatten+scan, while flat strings
    serialize at memcpy speed.  The flatten is cheap columnar work in
    the scan stage (its parallelism is file splits — kept fine-grained
    via spark.sql.files.maxPartitionBytes)."""
    has_status = "status" in df.columns
    pre = df.select(
        "doc_id",
        # coalesce, not just cast: a schema-mandated-but-absent status
        # column (streaming read schema over status-less files) arrives
        # as NULL, and int(None) downstream would fail EVERY doc
        (F.coalesce(F.col("status").cast("int"), F.lit(200))
         if has_status else F.lit(200))
        .alias("status"),
        "spans",
    )
    if assume_sorted:
        # writers that guarantee offset order (our importer/generator/driver)
        # skip the reshape+sort copy entirely
        ordered = F.col("spans")
    else:
        # native sort_array over an offset-first struct reshape — no lambda
        # comparator, whole-stage-friendly.  (coalesce(offset,0), pos)
        # reproduces the library kernel's semantics exactly (engine.
        # document_spans: stable sort by `offset or 0`): NULL offsets tie
        # with 0 instead of sorting NULLS FIRST, and equal offsets keep
        # input order instead of tie-breaking on kind/text.
        ordered = F.sort_array(F.transform(
            "spans",
            lambda s, i: F.struct(
                F.coalesce(s["offset"], F.lit(0)).alias("offset"),
                i.alias("pos"), s["kind"].alias("kind"),
                s["text"].alias("text"), s["media_ref"].alias("media_ref"),
            )))
    return pre.select(
        "doc_id",
        "status",
        F.element_at(ordered, 1)["media_ref"].alias("url"),
        F.array_join(
            F.transform(
                F.filter(ordered, lambda s: s["kind"] == F.lit("html")),
                lambda s: F.coalesce(s["text"], F.lit(""))),
            "").alias("html"),
        F.transform(
            F.filter(ordered, lambda s: s["kind"].isin("media", "pdf")),
            lambda s: s["media_ref"]).alias("media_refs"),
        F.transform(
            F.filter(ordered, lambda s: s["kind"].isin("media", "pdf")),
            lambda s: s["kind"]).alias("media_kinds"),
    )


def extract_spans(
    df: DataFrame,
    oembed_df: DataFrame | None = None,
    context_store: dict | None = None,
    media_df: DataFrame | None = None,
    num_partitions: int | None = None,
    salt: bool = True,
    side: SideTables | None = None,
    assume_sorted: bool = False,
) -> DataFrame:
    """(doc_id, spans[, status]) → (doc_id, spans, n_input_bytes, ok).

    ``oembed_df``: (ref, status, ctype, body) side table, broadcast to
    executors.  ``media_df``: (media_ref, ctype, payload) side table for
    media/pdf spans.  ``context_store``: {url: @context doc}.  Pass a
    prebuilt ``side`` (broadcast_side_tables) to amortize the driver-side
    collect across calls.
    """
    spark = df.sparkSession

    if side is None:
        side = broadcast_side_tables(spark, oembed_df, media_df,
                                     context_store)
    b_oembed, b_media, b_ctx = side.oembed, side.media, side.contexts

    narrow = narrow_columns(df, assume_sorted=assume_sorted)

    if salt:
        # uniform redistribution by doc hash: a run of giant documents in
        # one input file cannot pin a single Python-stage task (AQE cannot
        # split a skewed UDF stage input on its own — SURVEY.md §4)
        n = num_partitions or spark.sparkContext.defaultParallelism
        narrow = narrow.repartition(n, F.xxhash64("doc_id"))

    def run(batches: Iterator) -> Iterator:
        import pyarrow as pa

        from ..functions.engine import flat_document_spans

        oe = _bvalue(b_oembed)
        med = _bvalue(b_media)
        ctx = _bvalue(b_ctx)
        span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                            ("media_ref", pa.string()),
                            ("offset", pa.int32())])
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            statuses = batch.column(1).to_pylist()
            urls = batch.column(2).to_pylist()
            htmls = batch.column(3).to_pylist()
            media_refs = batch.column(4).to_pylist()
            media_kinds = batch.column(5).to_pylist()
            # columnar accumulators: one flat span table + list offsets —
            # built once per batch, zero pandas/object-row intermediates
            kinds: list = []
            texts: list = []
            refs: list = []
            offs: list = []
            list_offsets = [0]
            n_bytes_col: list = []
            ok_col: list = []
            for i in range(len(doc_ids)):
                html = htmls[i] or ""
                n_bytes_col.append(len(html))
                try:
                    spans_out = flat_document_spans(
                        urls[i] or str(doc_ids[i]), html,
                        int(statuses[i]), list(media_refs[i] or ()),
                        oembed_store=oe, context_store=ctx,
                        media_store=med,
                        media_kinds=list(media_kinds[i] or ()))
                    ok_col.append("ok")
                except Exception as e:  # noqa: BLE001 — per-doc isolation
                    spans_out = []
                    ok_col.append(type(e).__name__)
                for s in spans_out:
                    kinds.append(s["kind"])
                    texts.append(s["text"])
                    refs.append(s["media_ref"])
                    offs.append(s["offset"])
                list_offsets.append(len(kinds))
            struct = pa.StructArray.from_arrays(
                [pa.array(kinds, pa.string()), pa.array(texts, pa.string()),
                 pa.array(refs, pa.string()), pa.array(offs, pa.int32())],
                fields=list(span_t))
            spans_arr = pa.ListArray.from_arrays(
                pa.array(list_offsets, pa.int32()), struct)
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, pa.string()), spans_arr,
                 pa.array(n_bytes_col, pa.int64()),
                 pa.array(ok_col, pa.string())],
                names=["doc_id", "spans", "n_input_bytes", "ok"])

    return narrow.mapInArrow(run, schema=EXTRACTED)


# --------------------------------------------------------------------------
# two-pass oembed resolution — the 10^12-doc regime

EXTRACTED_HREF = ("doc_id string, spans array<struct<kind:string,"
                  "text:string,media_ref:string,offset:int>>, "
                  "n_input_bytes long, ok string, oembed_href string")


def _span_batch(pa, span_t, doc_ids, spans_lists, n_bytes, oks,
                extra_arrays=(), extra_names=()):
    """Columnar output assembly shared by the extract runners."""
    kinds: list = []
    texts: list = []
    refs: list = []
    offs: list = []
    list_offsets = [0]
    for spans_out in spans_lists:
        for s in spans_out:
            kinds.append(s["kind"])
            texts.append(s["text"])
            refs.append(s["media_ref"])
            offs.append(s["offset"])
        list_offsets.append(len(kinds))
    struct = pa.StructArray.from_arrays(
        [pa.array(kinds, pa.string()), pa.array(texts, pa.string()),
         pa.array(refs, pa.string()), pa.array(offs, pa.int32())],
        fields=list(span_t))
    spans_arr = pa.ListArray.from_arrays(
        pa.array(list_offsets, pa.int32()), struct)
    return pa.RecordBatch.from_arrays(
        [pa.array(doc_ids, pa.string()), spans_arr,
         pa.array(n_bytes, pa.int64()), pa.array(oks, pa.string()),
         *extra_arrays],
        names=["doc_id", "spans", "n_input_bytes", "ok", *extra_names])


def extract_spans_twopass(
    df: DataFrame,
    oembed_df: DataFrame,
    context_store: dict | None = None,
    media_df: DataFrame | None = None,
    num_partitions: int | None = None,
    assume_sorted: bool = False,
) -> DataFrame:
    """``extract_spans`` for the regime where the oembed corpus is too
    large to broadcast (at 10^12 documents the sub-request table is
    billions of rows).

    Plan: pass 1 runs the fused kernel with NO oembed store and emits
    the discovered oembed href per doc.  The small fraction of docs
    that reference an oembed document (~few %) shuffle-join the oembed
    table on href — a plain distributed equi-join, no driver-side
    collect, no broadcast — and re-run the kernel with the joined
    payload passed per-row.  Everything else ships straight through.
    Output is bit-identical to the broadcast path
    (tests/test_twopass_oembed.py).
    """
    import pyarrow as pa  # noqa: F401 — ensure importable at plan time

    spark = df.sparkSession
    side = broadcast_side_tables(spark, None, media_df, context_store)
    b_media, b_ctx = side.media, side.contexts

    narrow = narrow_columns(df, assume_sorted=assume_sorted)
    n = num_partitions or spark.sparkContext.defaultParallelism
    salted = narrow.repartition(n, F.xxhash64("doc_id"))

    span_t_def = [("kind", "string"), ("text", "string"),
                  ("media_ref", "string"), ("offset", "int32")]

    def run_pass1(batches: Iterator) -> Iterator:
        import pyarrow as pa

        from ..functions.engine import flat_document_spans

        med = _bvalue(b_media)
        ctx = _bvalue(b_ctx)
        span_t = pa.struct([(k, getattr(pa, t)()) for k, t in span_t_def])
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            statuses = batch.column(1).to_pylist()
            urls = batch.column(2).to_pylist()
            htmls = batch.column(3).to_pylist()
            media_refs = batch.column(4).to_pylist()
            media_kinds = batch.column(5).to_pylist()
            spans_lists, n_bytes, oks, hrefs = [], [], [], []
            for i in range(len(doc_ids)):
                html = htmls[i] or ""
                n_bytes.append(len(html))
                href_out: list = []
                try:
                    spans_out = flat_document_spans(
                        urls[i] or str(doc_ids[i]), html,
                        int(statuses[i]), list(media_refs[i] or ()),
                        context_store=ctx, media_store=med,
                        href_out=href_out,
                        media_kinds=list(media_kinds[i] or ()))
                    oks.append("ok")
                except Exception as e:  # noqa: BLE001 — per-doc isolation
                    spans_out = []
                    oks.append(type(e).__name__)
                spans_lists.append(spans_out)
                hrefs.append(href_out[0] if href_out else None)
            yield _span_batch(pa, span_t, doc_ids, spans_lists, n_bytes,
                              oks, (pa.array(hrefs, pa.string()),),
                              ("oembed_href",))

    pass1 = salted.mapInArrow(run_pass1, schema=EXTRACTED_HREF)

    plain = (pass1.filter(F.col("oembed_href").isNull())
             .drop("oembed_href"))

    # docs that DID discover an oembed link: re-derive their flat inputs
    # and equi-join the oembed corpus on href — both sides shuffle on the
    # join key; at scale this is the standard sort-merge/AQE path and the
    # oembed table never touches the driver
    need = pass1.filter(F.col("oembed_href").isNotNull()) \
                .select("doc_id", "oembed_href")
    oembed_side = dedup_on_key(
        oembed_df.withColumnRenamed("ref", "oembed_href")
                 .withColumnRenamed("status", "o_status")
                 .select("oembed_href", "o_status", "ctype", "body"),
        "oembed_href")
    rejoin = (narrow.join(need, "doc_id")
              .join(oembed_side, "oembed_href", "left")
              .select("doc_id", "status", "url", "html", "media_refs",
                      "media_kinds", "o_status", "ctype", "body"))

    def run_pass2(batches: Iterator) -> Iterator:
        import pyarrow as pa

        from ..functions.engine import flat_document_spans

        med = _bvalue(b_media)
        ctx = _bvalue(b_ctx)
        span_t = pa.struct([(k, getattr(pa, t)()) for k, t in span_t_def])
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            statuses = batch.column(1).to_pylist()
            urls = batch.column(2).to_pylist()
            htmls = batch.column(3).to_pylist()
            media_refs = batch.column(4).to_pylist()
            media_kinds = batch.column(5).to_pylist()
            o_status = batch.column(6).to_pylist()
            o_ctype = batch.column(7).to_pylist()
            o_body = batch.column(8).to_pylist()
            spans_lists, n_bytes, oks = [], [], []
            for i in range(len(doc_ids)):
                html = htmls[i] or ""
                n_bytes.append(len(html))
                payload = None
                if o_body[i] is not None:
                    payload = (o_status[i], o_ctype[i], o_body[i])
                try:
                    spans_out = flat_document_spans(
                        urls[i] or str(doc_ids[i]), html,
                        int(statuses[i]), list(media_refs[i] or ()),
                        context_store=ctx, media_store=med,
                        oembed_payload=payload,
                        media_kinds=list(media_kinds[i] or ()))
                    oks.append("ok")
                except Exception as e:  # noqa: BLE001 — per-doc isolation
                    spans_out = []
                    oks.append(type(e).__name__)
                spans_lists.append(spans_out)
            yield _span_batch(pa, span_t, doc_ids, spans_lists, n_bytes,
                              oks)

    second = rejoin.mapInArrow(run_pass2, schema=EXTRACTED)
    return plain.unionByName(second)


def extract_spans_media_join(
    df: DataFrame,
    media_df: DataFrame,
    oembed_df: DataFrame | None = None,
    context_store: dict | None = None,
    num_partitions: int | None = None,
    assume_sorted: bool = False,
    join_oembed: bool = False,
) -> DataFrame:
    """``extract_spans`` for the regime where the media-payload corpus
    is too large to broadcast (binary image/pdf payloads at 10^12 docs).
    With ``join_oembed=True`` the oembed side goes through the two-pass
    shuffle join as well — zero broadcast side tables anywhere.

    Plan: the fused kernel runs with NO media store, emitting media
    spans as empty-text placeholders in their correct positions.  The
    (doc_id, media_ref) pairs explode out, equi-join the media table on
    media_ref (both sides shuffle on the key — payload bytes never touch
    the driver), a second Arrow stage runs the header readers per
    payload, and the extracted JSON re-aggregates into the placeholder
    spans by (doc_id, media_ref) — the zip/explode/group/ordered-reagg
    generic form (SURVEY §2.3).  Output is bit-identical to the
    broadcast path (tests/test_twopass_oembed.py).
    """
    spark = df.sparkSession
    if join_oembed and oembed_df is not None:
        base = extract_spans_twopass(df, oembed_df,
                                     context_store=context_store,
                                     num_partitions=num_partitions,
                                     assume_sorted=assume_sorted)
    else:
        base = extract_spans(df, oembed_df=oembed_df,
                             context_store=context_store,
                             num_partitions=num_partitions,
                             assume_sorted=assume_sorted)

    narrow = narrow_columns(df, assume_sorted=assume_sorted)
    # distinct BEFORE the join: a doc repeating a media_ref must not fan the
    # payload join out into a cross product (the broadcast dict naturally
    # dedupes); the media side gets the same deterministic one-row-per-ref
    # rule the broadcast store uses
    pairs = (narrow
             .select("doc_id",
                     F.explode(F.arrays_zip("media_refs", "media_kinds"))
                     .alias("mk"))
             .select("doc_id",
                     F.col("mk.media_refs").alias("media_ref"),
                     F.col("mk.media_kinds").alias("media_kind"))
             # ONE row per (doc, ref) even when the doc uses the ref under
             # both 'media' and 'pdf' kinds — two rows would double every
             # overlay match below.  'pdf' wins (max: 'pdf' > 'media') so
             # pdf_text is computed whenever any use needs it; the overlay
             # reads media_text/pdf_text by span kind, so a merged row
             # serves both.
             .groupBy("doc_id", "media_ref")
             .agg(F.max("media_kind").alias("media_kind"))
             .join(dedup_on_key(
                       media_df.select("media_ref", "ctype", "payload"),
                       "media_ref"),
                   "media_ref", "left")
             .select("doc_id", "media_ref", "media_kind", "ctype",
                     "payload"))

    def run_media(batches: Iterator) -> Iterator:
        import json as _json

        import pyarrow as pa

        from ..functions.engine import scrape_document
        from ..functions.pdftext import pdf_text as _pdf_text

        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            refs = batch.column(1).to_pylist()
            mkinds = batch.column(2).to_pylist()
            ctypes = batch.column(3).to_pylist()
            payloads = batch.column(4).to_pylist()
            texts = []
            pdf_texts = []
            errs = []
            for ref, mkind, ctype, payload in zip(refs, mkinds, ctypes,
                                                  payloads):
                extracted = ""
                body_text = "" if mkind == "pdf" else None
                err = None
                if payload is not None:
                    try:
                        snippet = scrape_document(
                            ref, 200, {"content-type": ctype}, None,
                            body_bytes=payload,
                            plugins=("exif", "exiftool"))
                        extracted = _json.dumps(
                            snippet, default=str, sort_keys=True,
                            ensure_ascii=False)
                        if mkind == "pdf":
                            body_text = _pdf_text(payload)
                    except Exception as e:  # noqa: BLE001 — per-ref record
                        # the broadcast path runs this scrape inside the
                        # per-doc try, so a throwing payload fails the whole
                        # doc — record the error so re-aggregation can
                        # reproduce that (ok=<ExcName>, spans=[])
                        extracted = ""
                        err = type(e).__name__
                texts.append(extracted)
                pdf_texts.append(body_text)
                errs.append(err)
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, pa.string()),
                 pa.array(refs, pa.string()),
                 pa.array(texts, pa.string()),
                 pa.array(pdf_texts, pa.string()),
                 pa.array(errs, pa.string())],
                names=["doc_id", "media_ref", "media_text", "pdf_text",
                       "media_err"])

    media_text = pairs.mapInArrow(
        run_media, schema="doc_id string, media_ref string, "
                          "media_text string, pdf_text string, "
                          "media_err string")

    # ordered re-aggregation: explode the placeholder spans, overlay the
    # joined media text onto kind='media' rows, rebuild the array sorted
    # by the original offset (the generic zip/explode/group form)
    exploded = base.select(
        "doc_id", "n_input_bytes", "ok",
        F.posexplode_outer("spans").alias("pos", "s"))
    merged = (exploded
              .join(media_text,
                    (exploded["doc_id"] == media_text["doc_id"])
                    & (exploded["s"]["media_ref"]
                       == media_text["media_ref"])
                    & (exploded["s"]["kind"].isin("media", "body_text")),
                    "left")
              .select(
                  exploded["doc_id"],
                  "n_input_bytes", "ok", "pos",
                  media_text["media_err"].alias("media_err"),
                  F.struct(
                      exploded["s"]["kind"].alias("kind"),
                      F.when(exploded["s"]["kind"] == "media",
                             F.coalesce(media_text["media_text"],
                                        exploded["s"]["text"]))
                      # pdf body_text placeholders carry the pdf's ref;
                      # html body_text spans have a NULL ref and never
                      # match the join, so coalesce keeps their text
                      .when(exploded["s"]["kind"] == "body_text",
                            F.coalesce(media_text["pdf_text"],
                                       exploded["s"]["text"]))
                      .otherwise(exploded["s"]["text"]).alias("text"),
                      exploded["s"]["media_ref"].alias("media_ref"),
                      exploded["s"]["offset"].alias("offset"),
                  ).alias("s")))
    # first_err: the error of the EARLIEST failing media span — the
    # broadcast path processes refs in span order inside the per-doc try,
    # so the first throwing ref is the doc's recorded failure
    rebuilt = (merged
               .filter(F.col("pos").isNotNull())
               .groupBy("doc_id")
               .agg(F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "s"))),
                        lambda x: x["s"]).alias("spans"),
                    F.min(F.when(F.col("media_err").isNotNull(),
                                 F.struct("pos", "media_err")))
                    .alias("_err")))
    # docs whose span array was empty never explode — restore them with
    # an empty array via a left join on the pass-1 doc list
    empty = F.array().cast(
        "array<struct<kind:string,text:string,media_ref:string,"
        "offset:int>>")
    return (base.select("doc_id", "n_input_bytes", "ok")
            .join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.when(F.col("_err").isNotNull(), empty)
                    .otherwise(F.coalesce(F.col("spans"), empty))
                    .alias("spans"),
                    "n_input_bytes",
                    F.coalesce(F.col("_err")["media_err"], F.col("ok"))
                    .alias("ok")))
