"""Fixture corpus importer.

Reads the reference's content-addressed page cache
(``packages/test/fixtures/<filenamify(url)>/{meta.json,body}``, with
``accept!...`` subdirs for sub-requests — packages/test/src/index.ts:174-237)
into the engine's tabular shapes:

* pages        — (doc_id=url, status, headers, ctype, body)
* oembed_docs  — sub-request side table keyed by discovery href
* contexts     — remote JSON-LD context documents (broadcast store)

and converts each page into the interleaved span row
(doc_id, spans: [{kind, text, media_ref, offset}]) per BASELINE input_hint.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

DEFAULT_FIXTURE_DIR = "/root/reference/packages/test/fixtures"
DEFAULT_TEST_SRC = "/root/reference/packages/test/src/index.ts"

_RESERVED = re.compile(r'[<>:"/\\|?*\x00-\x1f]')


def filenamify(value: str, replacement: str = "!", max_length: int = 100) -> str:
    """The ``filenamify`` npm package's default transform (the reference's
    cache key, packages/test/src/index.ts:174-182): replace reserved chars,
    strip trailing periods, collapse repeated replacements, strip outer
    replacements, truncate to 100."""
    value = re.sub(r"^\.+", replacement, value)
    value = _RESERVED.sub(replacement, value)
    value = re.sub(r"\.+$", "", value)
    value = re.sub(re.escape(replacement) + "{2,}", replacement, value)
    if len(value) > 1:
        value = value.strip(replacement)
    return value[:max_length]


def build_filename(url: str, accept: str | None = None) -> str:
    if accept:
        return f"{filenamify(url)}/{filenamify('accept:' + accept)}"
    return filenamify(url)


def fixture_urls(test_src: str = DEFAULT_TEST_SRC) -> list[str]:
    """The 118-entry FIXTURE_URLS list (packages/test/src/index.ts:11-162)."""
    text = Path(test_src).read_text()
    m = re.search(r"FIXTURE_URLS\s*=\s*\[(.*?)\];", text, re.DOTALL)
    if not m:
        return []
    return re.findall(r'"([^"]+)"', m.group(1))


def load_fixture(url: str, accept: str | None = None,
                 fixture_dir: str = DEFAULT_FIXTURE_DIR) -> dict | None:
    """Emulate the fixture-backed ``request``: returns
    {url(final), status, headers, body(bytes)} or None on cache miss."""
    path = Path(fixture_dir) / build_filename(url, accept)
    meta_path = path / "meta.json"
    if not meta_path.is_file():
        return None
    meta = json.loads(meta_path.read_text())
    body_path = path / "body"
    body = body_path.read_bytes() if body_path.is_file() else b""
    return {
        "url": meta.get("url", url),
        "status": meta.get("status", 0),
        "headers": meta.get("headers", {}),
        "body": body,
    }


def make_request(fixture_dir: str = DEFAULT_FIXTURE_DIR):
    """A ``request(url, accept)`` closure over the fixture cache."""
    def request(url: str, accept: str | None = None) -> dict | None:
        return load_fixture(url, accept, fixture_dir)
    return request


def load_context_store(fixture_dir: str = DEFAULT_FIXTURE_DIR) -> dict:
    """All cached ``accept:application/ld+json`` sub-requests → the static
    remote-context store (keyed by both requested-dir-derived and final
    URLs; the expander probes scheme/slash variants)."""
    store: dict = {}
    root = Path(fixture_dir)
    for sub in root.glob("*/accept!application!ld+json"):
        meta_path = sub / "meta.json"
        body_path = sub / "body"
        if not meta_path.is_file() or not body_path.is_file():
            continue
        meta = json.loads(meta_path.read_text())
        ctype = (meta.get("headers", {}).get("content-type") or "").split(
            ";", 1)[0].strip().lower()
        if meta.get("status") != 200 or ctype not in (
                "application/json", "application/ld+json"):
            continue
        try:
            doc = json.loads(body_path.read_text())
        except Exception:
            continue
        if not isinstance(doc, dict):
            doc = {}
        final_url = meta.get("url", "")
        if final_url:
            store[final_url] = doc
        # also key by the original request dir name → recover original URL
        name = sub.parent.name
        guess = _unfilenamify_url(name)
        if guess:
            store[guess] = doc
    return store


def _unfilenamify_url(name: str) -> str | None:
    """Best-effort inverse of filenamify for simple URLs (scheme!host!path)."""
    m = re.match(r"^(https?)!(.+)$", name)
    if not m:
        return None
    scheme, rest = m.groups()
    return f"{scheme}://{rest.replace('!', '/')}"


def page_to_spans(page: dict, doc_id: str | None = None) -> dict:
    """One fetched page → the interleaved input row (FIXTURES.md §1).

    The first span's media_ref doubles as the page URL; html/pdf bodies are
    text spans (pdf/media payloads referenced, bytes carried separately)."""
    url = page["url"]
    ctype = (page.get("headers", {}).get("content-type") or "")
    if isinstance(ctype, list):
        ctype = ctype[0] if ctype else ""
    mime = ctype.split(";", 1)[0].strip().lower()
    if mime == "text/html":
        from ..functions.charset import decode_html
        kind = "html"
        # byte-level boundary: BOM / content-type / meta-prescan charset
        # sniff, matching the reference's raw-byte stream into htmlparser2
        text = decode_html(page["body"], ctype)
        spans = [{"kind": kind, "text": text, "media_ref": url, "offset": 0}]
    elif mime == "application/pdf":
        spans = [{"kind": "pdf", "text": "", "media_ref": url, "offset": 0}]
    else:
        spans = [{"kind": "media", "text": "", "media_ref": url, "offset": 0}]
    return {
        "doc_id": doc_id or url,
        "spans": spans,
        "status": page.get("status", 0),
        "content_type": mime,
    }
