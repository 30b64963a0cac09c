"""Span-sequence invariant on reference-derived fixtures (FIXTURES.md §5
provenance class 1): expected spans converted from the reference's own
snapshots (headline→title, description→description, image[].url→og_image
media_refs, in emit order) must equal the engine's output spans."""

import snapdiff
from snap_parse import UNDEFINED, parse_snap_file, url_of

from unfurl_spark.functions.engine import flat_document_spans
from unfurl_spark.sources.fixtures import (
    build_filename,
    fixture_urls,
    load_context_store,
    load_fixture,
    make_request,
)

SNAP = "/root/reference/packages/unfurl-html/src/__snapshots__/index.spec.ts.snap"


def snapshot_expected_spans(snip: dict) -> list[tuple]:
    """Reference snapshot → expected (kind, text, media_ref) prefix
    (title/description/og_image portion of the span contract)."""
    out = []
    headline = snip.get("headline")
    if headline and headline is not UNDEFINED:
        out.append(("title", headline, None))
    desc = snip.get("description")
    if desc and desc is not UNDEFINED:
        out.append(("description", desc, None))
    for img in snip.get("image") or []:
        if isinstance(img, dict):
            d = img.get("description")
            out.append(("og_image",
                        d if d not in (None, UNDEFINED) else "",
                        img.get("url")))
    return out


def test_fixture_span_parity():
    snaps = {url_of(n): v for n, v in parse_snap_file(SNAP).items()}
    context_store = load_context_store()
    request = make_request()
    checked, failures = 0, []
    for url in fixture_urls():
        snip = snaps.get(url)
        page = load_fixture(url)
        if snip is None or page is None or not isinstance(snip, dict):
            continue
        if build_filename(url) in snapdiff._PRUNED:
            continue
        ct = page["headers"].get("content-type") or ""
        if isinstance(ct, list):
            ct = ct[0]
        if not ct.split(";")[0].strip().lower() == "text/html":
            continue

        def oembed_store_lookup():
            class _Store(dict):
                def __contains__(self, href):
                    return request(href, "application/json") is not None

                def __getitem__(self, href):
                    sub = request(href, "application/json")
                    c = sub["headers"].get("content-type") or ""
                    if isinstance(c, list):
                        c = c[0]
                    return (sub["status"], c, sub["body"])
            return _Store()

        spans = flat_document_spans(
            page["url"], page["body"].decode("utf-8", "replace"),
            page["status"], [],
            oembed_store=oembed_store_lookup(),
            context_store=context_store)
        got = [(s["kind"], s["text"], s["media_ref"]) for s in spans
               if s["kind"] in ("title", "description", "og_image")]
        want = snapshot_expected_spans(snip)
        checked += 1
        if got != want:
            failures.append((url, want[:3], got[:3]))
    assert checked >= 100
    assert not failures, failures[:3]
