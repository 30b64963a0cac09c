"""Remote-context pre-pass: unresolved @context URLs surface in the
fetch-list table, and a doc with an unknown context degrades exactly like
the reference's failed-documentLoader path (graph dropped, everything
else intact)."""

from unfurl_spark.functions.engine import scrape_html
from unfurl_spark.operators.context_prepass import context_fetch_list

SPAN_T = ("array<struct<kind:string,text:string,media_ref:string,"
          "offset:int>>")

_KNOWN_CTX = "https://known.example/ctx"
_UNKNOWN_CTX = "https://unknown.example/ctx"
_STORE = {_KNOWN_CTX: {"@context": {"@vocab": "http://schema.org/"}}}


def _page(ctx_url: str) -> str:
    return (
        '<html><head><title>T</title>'
        '<script type="application/ld+json">'
        '{"@context": "%s", "@id": "https://ex.com/a",'
        ' "@type": "NewsArticle", "headline": "Graph Headline"}'
        "</script></head><body><p>body text content</p></body></html>"
        % ctx_url)


def test_unknown_context_degrades_like_no_store():
    url = "https://ex.com/a"
    with_unknown = scrape_html(url, 200, _page(_UNKNOWN_CTX),
                               context_store=_STORE)
    no_store = scrape_html(url, 200, _page(_UNKNOWN_CTX),
                           context_store=None)
    assert with_unknown == no_store
    # whereas the resolvable context DOES enrich the result
    with_known = scrape_html(url, 200, _page(_KNOWN_CTX),
                             context_store=_STORE)
    assert with_known != with_unknown
    assert with_known["headline"] == "T"  # page still extracts either way
    assert with_unknown["headline"] == "T"


def test_fetch_list_emits_unresolved_only(spark):
    rows = [
        ("d1", [("html", _page(_UNKNOWN_CTX), "https://ex.com/1", 0)]),
        ("d2", [("html", _page(_UNKNOWN_CTX), "https://ex.com/2", 0)]),
        ("d3", [("html", _page(_KNOWN_CTX), "https://ex.com/3", 0)]),
        ("d4", [("html", "<html><body><p>no jsonld</p></body></html>",
                 "https://ex.com/4", 0)]),
    ]
    df = spark.createDataFrame(rows, f"doc_id string, spans {SPAN_T}")
    out = {r.context_url: (r.n_docs, r.sample_doc_id)
           for r in context_fetch_list(df, _STORE, num_partitions=4)
           .collect()}
    assert out == {_UNKNOWN_CTX: (2, "d1")}


def test_fetch_list_schema_and_plan(spark):
    df = spark.createDataFrame(
        [("d1", [("html", _page(_UNKNOWN_CTX), "u", 0)])],
        f"doc_id string, spans {SPAN_T}")
    out = context_fetch_list(df, _STORE, num_partitions=2)
    assert [f.name for f in out.schema.fields] == [
        "context_url", "n_docs", "sample_doc_id"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan   # Arrow stage, no row-UDFs
    assert plan.count("MapInArrow") == 1


def test_driver_context_prepass_flag(spark, tmp_path):
    """--context-prepass writes the fetch-list table under the output dir."""
    from unfurl_spark.plans.driver import run_context_prepass

    df = spark.createDataFrame(
        [("d1", [("html", _page(_UNKNOWN_CTX), "u1", 0)]),
         ("d2", [("html", _page(_KNOWN_CTX), "u2", 0)])],
        f"doc_id string, spans {SPAN_T}")
    src = str(tmp_path / "docs")
    df.write.parquet(src)
    out = str(tmp_path / "out")
    n = run_context_prepass(spark, src, out, _STORE)
    assert n == 1
    got = spark.read.parquet(out + "/context_fetch_list").collect()
    assert got[0].context_url == _UNKNOWN_CTX and got[0].n_docs == 1
