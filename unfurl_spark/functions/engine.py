"""Per-document extraction kernel — the fused P1+P4+C1-C15 stage.

One pure function, ``scrape_document``, reproduces the reference's whole
middleware chain for a single page (unfurl/src/index.ts:171-188 +
unfurl-html/src/index.ts:41-87): MIME dispatch, HTML tokenize, JSON-LD
normalize, oembed lookup, field extraction, media/pdf metadata, link
fallback.  It is deliberately free of I/O: sub-request documents (oembed
payloads, remote JSON-LD contexts) arrive as arguments, so on Spark they
come from broadcast/joined side tables and the kernel runs Arrow-batched
with no executor network access.
"""

from __future__ import annotations

import json

from .coerce import content_type_of, extract_mime
from .extract import extract_website, to_array
from .htmlmeta import parse_html
from .jsonld_lite import normalize_jsonld

CONTENT_TYPE_JSON = "application/json"
CONTENT_TYPE_OEMBED = "application/json+oembed"


def find_oembed_href(metadata: dict | None) -> str | None:
    """First ``application/json+oembed`` alternate link
    (unfurl-html/src/index.ts:96-99)."""
    if not metadata:
        return None
    for alt in metadata.get("alternate", []):
        if alt.get("type") == "application/json+oembed":
            return alt.get("href")
    return None


def parse_oembed(status: int, ctype: str, body: str | bytes | None) -> dict | None:
    """Gate + parse an oembed sub-request payload
    (unfurl-html/src/index.ts:101-122): 200 + json type + object payload."""
    mime = extract_mime(ctype or "")
    if status != 200 or mime not in (CONTENT_TYPE_JSON, CONTENT_TYPE_OEMBED):
        return None
    if body is None:
        return None
    try:
        if isinstance(body, bytes):
            body = body.decode("utf-8")
        data = json.loads(body)
    except Exception:
        return None
    if isinstance(data, dict):
        return data
    return None


def scrape_html(url: str, status: int, html_text: str,
                oembed: dict | None = None,
                context_store: dict | None = None,
                oembed_lookup=None) -> dict:
    """The HTML plugin for one page (unfurl-html/src/index.ts:41-87).

    ``oembed_lookup(href) -> (status, ctype, body) | None`` emulates the
    record-scoped sub-request from a pre-joined side table.
    """
    metadata = parse_html(html_text, url)
    if metadata is None:
        return {"type": "website", "url": url}

    docs = (to_array(metadata.get("jsonld"))
            + to_array(metadata.get("rdfa"))
            + to_array(metadata.get("microdata")))
    graph = normalize_jsonld(docs, url, context_store)

    if oembed is None and status == 200 and oembed_lookup is not None:
        href = find_oembed_href(metadata)
        if href:
            sub = oembed_lookup(href)
            if sub is not None:
                oembed = parse_oembed(*sub)
    elif status != 200:
        oembed = None

    return extract_website(url, metadata, graph, oembed)


def scrape_document(url: str, status: int, headers: dict,
                    body_text: str | None,
                    body_bytes: bytes | None = None,
                    oembed: dict | None = None,
                    context_store: dict | None = None,
                    oembed_lookup=None,
                    plugins: tuple = ("html",)) -> dict:
    """Full middleware chain for one page.  ``plugins`` mirrors the
    reference's per-package test configs: ("html",) / ("exif",) /
    ("exiftool",) / or the product chain ("html", "exif", "exiftool")."""
    mime = content_type_of(headers or {})

    for plugin in plugins:
        if plugin == "html" and mime == "text/html":
            return scrape_html(url, status, body_text or "", oembed,
                               context_store, oembed_lookup)
        if plugin == "exif" and mime.startswith("image/"):
            from .media import exif_image
            return exif_image(url, body_bytes or b"", mime)
        if plugin == "exiftool":
            from .media import exiftool_image, exiftool_pdf, exiftool_video
            if mime == "application/pdf":
                return exiftool_pdf(url, body_bytes or b"")
            if mime.startswith("image/"):
                return exiftool_image(url, body_bytes or b"")
            if mime.startswith("video/"):
                return exiftool_video(url, body_bytes or b"")

    return {"type": "link", "url": url}
