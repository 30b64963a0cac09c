"""Engine vs the construction-time oracle on the seeded synthetic corpus
(FIXTURES.md §5 provenance class 2): span-sequence equality
(kind, text, media_ref, order) per document, pure Python (no Spark)."""

from unfurl_spark.functions.engine import document_spans
from unfurl_spark.sources.synthetic import generate_corpus


def test_synthetic_span_equality():
    c = generate_corpus(500, seed=42)
    oe = {r["ref"]: (r["status"], r["ctype"], r["body"])
          for r in c["oembed_docs"]}
    med = {r["media_ref"]: (r["ctype"], r["payload"])
           for r in c["media_payloads"]}
    exp = {r["doc_id"]: r["spans"] for r in c["expected_spans"]}

    fails = []
    for d in c["documents_raw"]:
        got = document_spans(d["doc_id"], d["spans"], status=d["status"],
                             oembed_store=oe, media_store=med)
        if got != exp[d["doc_id"]]:
            fails.append(d["doc_id"])
    assert not fails, f"{len(fails)} docs mismatched: {fails[:5]}"


def test_determinism_across_seeds():
    a = generate_corpus(50, seed=7)
    b = generate_corpus(50, seed=7)
    assert a == b
    c = generate_corpus(50, seed=8)
    assert c != a
