"""narrow_columns edge semantics vs the library kernel (engine.document_spans):
NULL status, NULL/tied offsets — the Spark flatten must reproduce the pure
function's ordering and defaults exactly."""

from pyspark.sql import Row

from unfurl_spark.operators.pipeline import extract_spans, narrow_columns


def _doc(doc_id, spans, status=None):
    mk = [Row(kind=k, text=t, media_ref=m, offset=o) for k, t, m, o in spans]
    if status is None:
        return Row(doc_id=doc_id, spans=mk)
    return Row(doc_id=doc_id, spans=mk, status=status)


def test_null_status_defaults_to_200_not_typeerror(spark):
    """A schema-mandated-but-absent status column arrives as NULL in
    streaming reads; every doc used to fail with ok='TypeError'."""
    df = spark.createDataFrame([
        Row(doc_id="d1",
            spans=[Row(kind="html", text="<title>T</title>",
                       media_ref="http://x/", offset=0)],
            status=None),
    ], "doc_id string, spans array<struct<kind:string,text:string,"
       "media_ref:string,offset:int>>, status int")
    out = extract_spans(df, salt=False).collect()
    assert out[0].ok == "ok"
    assert any(s.kind == "title" and s.text == "T" for s in out[0].spans)


def test_tied_and_null_offsets_match_kernel_order(spark):
    """engine.document_spans sorts stably by `offset or 0`. The Spark
    sort_array struct must not tie-break on kind/text (input order wins)
    nor sort NULL offsets before 0 (they tie with 0)."""
    from unfurl_spark.functions.engine import document_spans

    spans = [("html", "<title>B", "http://x/", 0),
             ("html", "A</title>", None, 0),     # tied offset: stays 2nd
             ("html", "<meta>", None, None)]     # null offset: ties as 0
    df = spark.createDataFrame([_doc("d1", spans)])
    got = narrow_columns(df, assume_sorted=False).collect()[0]
    kernel = document_spans(
        "d1", [{"kind": k, "text": t, "media_ref": m, "offset": o}
               for k, t, m, o in spans], 200)
    # same html reassembly as the kernel (stable: B then A then meta)
    assert got.html == "<title>BA</title><meta>"
    assert any(s["kind"] == "title" and s["text"] == "BA"
               for s in kernel)
    out = extract_spans(df, salt=False).collect()[0]
    assert [ (s.kind, s.text) for s in out.spans ] == \
        [ (s["kind"], s["text"]) for s in kernel ]


def test_oracle_check_canon_is_total():
    """canon() must order rows with None/mixed cells and inf floats
    instead of raising — a nullable output column used to abort the
    whole gate."""
    import math
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from oracle_check import canon, norm_cell

    cols, ms = canon([{"a": 1, "b": "x"}, {"a": None, "b": "y"},
                      {"a": float("nan"), "b": None},
                      {"a": 1.5, "b": "x"}])
    assert cols == ["a", "b"] and len(ms) == 4
    assert norm_cell(float("inf")) == "Inf"
    assert norm_cell(float("-inf")) == "-Inf"
