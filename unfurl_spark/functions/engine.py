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


def document_spans(doc_id: str, spans: list[dict],
                   status: int = 200,
                   oembed_store: dict | None = None,
                   context_store: dict | None = None,
                   media_store: dict | None = None) -> list[dict]:
    """One interleaved input row → the ordered output span sequence
    (SURVEY.md §2.6): title, description, og_image*, jsonld*, body_text*,
    media*.  Pure function — runs Arrow-batched inside mapInPandas.

    ``spans`` is the input span list (kind ∈ html|pdf|media); the first
    span's media_ref is the page URL.  ``oembed_store`` maps discovery href
    → (status, ctype, body); ``media_store`` maps media_ref → (ctype,
    payload bytes) for media/pdf spans.
    """
    if not spans:
        return []
    ordered = sorted(spans, key=lambda s: s.get("offset") or 0)
    url = ordered[0].get("media_ref") or doc_id
    html_text = "".join(
        s.get("text") or "" for s in ordered if s.get("kind") == "html")
    media = [(s.get("media_ref"), s.get("kind")) for s in ordered
             if s.get("kind") in ("media", "pdf")]
    return flat_document_spans(url, html_text, status,
                               [r for r, _ in media],
                               oembed_store, context_store, media_store,
                               media_kinds=[k for _, k in media])


def flat_document_spans(url: str, html_text: str, status: int,
                        media_refs: list,
                        oembed_store: dict | None = None,
                        context_store: dict | None = None,
                        media_store: dict | None = None,
                        oembed_payload: tuple | None = None,
                        href_out: list | None = None,
                        media_kinds: list | None = None) -> list[dict]:
    """Flat-column kernel: (url, reassembled html, status, media refs) →
    ordered output spans.  This is the shape the Spark stage feeds after
    JVM-side span flattening (operators/pipeline.py).

    Oembed resolution has two scale regimes: ``oembed_store`` is the
    broadcast-dictionary path (side table fits executors);
    ``oembed_payload`` is the shuffle-join path — the caller joined the
    oembed document to this row and passes its (status, ctype, body)
    directly (extract_spans_twopass).  ``href_out``, when a list, has
    the discovered oembed href appended — pass 1 of the two-pass plan
    uses it to decide which docs join the oembed table.
    """
    from .content import classify_blocks
    from .htmlmeta import parse_html_full

    out: list[dict] = []

    def emit(kind: str, text: str | None, media_ref: str | None = None):
        out.append({"kind": kind, "text": text, "media_ref": media_ref,
                    "offset": len(out)})

    if html_text:
        metadata, raw_blocks = parse_html_full(html_text, url)
        oembed = None
        jsonld_blocks: list[str] = []
        if metadata is not None:
            jsonld_blocks = metadata.get("jsonld_blocks", [])
            if status == 200 and (oembed_store is not None
                                  or oembed_payload is not None
                                  or href_out is not None):
                href = find_oembed_href(metadata)
                if href is not None:
                    if href_out is not None:
                        href_out.append(href)
                    if oembed_payload is not None:
                        oembed = parse_oembed(*oembed_payload)
                    elif oembed_store is not None and href in oembed_store:
                        oembed = parse_oembed(*oembed_store[href])
            docs = (to_array(metadata.get("jsonld"))
                    + to_array(metadata.get("rdfa"))
                    + to_array(metadata.get("microdata")))
            graph = normalize_jsonld(docs, url, context_store)
        else:
            graph = None
        site = extract_website(url, metadata, graph, oembed)
        if site.get("headline"):
            emit("title", site["headline"])
        if site.get("description"):
            emit("description", site["description"])
        for img in site.get("image") or []:
            emit("og_image", img.get("description") or "", img.get("url"))
        for block in jsonld_blocks:
            emit("jsonld", block)
        for block in classify_blocks(raw_blocks):
            emit("body_text", block)

    kinds = media_kinds if media_kinds is not None \
        else ["media"] * len(media_refs)
    for ref, mkind in zip(media_refs, kinds):
        extracted = None
        body_text = None
        if media_store is not None and ref in media_store:
            ctype, payload = media_store[ref]
            snippet = scrape_document(
                ref, 200, {"content-type": ctype}, None,
                body_bytes=payload, plugins=("exif", "exiftool"))
            extracted = json.dumps(
                snippet, default=str, sort_keys=True, ensure_ascii=False)
            if mkind == "pdf":
                from .pdftext import pdf_text
                body_text = pdf_text(payload)
        emit("media", extracted or "", ref)
        if mkind == "pdf":
            # PDF main content (north-rule "PDF/layout parse"): the span
            # is ALWAYS present for pdf-kind refs — empty text when the
            # payload is unavailable (pass 1 of the shuffle-join regime
            # fills it from the joined payload, bit-identically)
            emit("body_text", body_text or "", ref)

    return out


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
