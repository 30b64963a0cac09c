"""Deterministic synthetic interleaved-document corpus (seeded).

Generates the engine's input tables AND the expected output spans from the
same seed, so the oracle is constructed independently of the engine
(FIXTURES.md §5).  Shapes per FIXTURES.md: ~80% pure-html docs (some split
into 2-4 consecutive chunks), ~15% html+media, ~5% pdf; 0.1% giant-doc skew
tail (~100× body) to exercise salted repartitioning.

Every metadata source class is exercised: og:*, twitter:*, sailthru, meta
description/keywords, canonical/icons, JSON-LD NewsArticle, oembed
discovery + side table, relative URL resolution, HTML entities, 404-status
oembed gating.
"""

from __future__ import annotations

import html as _html
import json
import random
import struct
import zlib

WORDS = (
    "engine spark arrow batch column vector shuffle partition broadcast "
    "salt skew join scan filter project window aggregate span document "
    "metadata title description image video audio icon embed author "
    "provider article keyword language pipeline checkpoint lineage metric "
    "throughput latency parser tokenizer graph node value content block "
    "density boilerplate paragraph sentence corpus fixture oracle parity"
).split()


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _png_bytes(width: int, height: int) -> bytes:
    """A real, decodable RGB PNG (filter 0, zlib level 1): a
    deterministic (width, height)-seeded gradient, so the multimodal
    decode/resize/feature path sees true pixels, while staying cheap
    enough to synthesize by the tens of thousands in bench corpora."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = bytes((x * 3 + k + width * 7 + height) % 256
                for x in range(width) for k in range(3))
    raw = (b"\x00" + row) * height  # filter-0 scanlines
    idat = zlib.compress(raw, 1)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def _pdf_bytes(title: str, author: str,
               body_lines: list[str] | None = None) -> bytes:
    """A real single-page PDF: Info dict (metadata parity) + a
    FlateDecode content stream showing ``body_lines`` — so the pipeline's
    PDF text extraction runs against true content-stream structure."""
    lines = body_lines if body_lines is not None else [title]

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT", "/F1 11 Tf", "1 0 0 1 72 720 Tm"]
    for ln in lines:
        ops.append(f"({esc(ln)}) Tj")
        ops.append("0 -14 Td")
    ops.append("ET")
    content = zlib.compress("\n".join(ops).encode("latin-1", "replace"), 6)
    head = (
        "%PDF-1.4\n1 0 obj\n<< /Title ({t}) /Author ({a}) "
        "/Producer (unfurl-synth) /Creator (synthgen) >>\nendobj\n"
        "2 0 obj\n<< /Length {n} /Filter /FlateDecode >>\nstream\n"
        .format(t=title, a=author, n=len(content)).encode()
    )
    return (head + content + b"\nendstream\nendobj\n"
            b"trailer\n<< /Info 1 0 R >>\n%%EOF\n")


def _media_json(snippet: dict) -> str:
    return json.dumps(snippet, default=str, sort_keys=True,
                      ensure_ascii=False)


def _exif_image_snippet(url: str, ctype: str, width: int, height: int) -> dict:
    return {
        "type": "image", "url": url, "encodingFormat": ctype,
        "dateModified": None, "dateCreated": None,
        "width": width, "height": height,
        "camera": {"make": None, "model": None, "lensMake": None,
                   "lensModel": None, "software": None, "orientation": None},
    }


def _pdf_snippet(url: str, title: str, author: str) -> dict:
    return {
        "type": "document", "url": url, "encodingFormat": "application/pdf",
        "producer": {"name": "unfurl-synth"}, "author": {"name": author},
        "creator": {"name": "synthgen"}, "headline": title,
        "dateCreated": None, "dateModified": None,
    }


def generate_corpus(n_docs: int, seed: int = 42) -> dict:
    """→ {documents_raw, oembed_docs, media_payloads, expected_spans}
    as lists of plain dict rows (write with Spark/pandas/pyarrow)."""
    docs, oembeds, media, expected = [], [], [], []

    for i in range(n_docs):
        rng = random.Random((seed << 20) ^ i)
        doc_id = f"doc-{i:08d}"
        roll = rng.random()
        if roll < 0.05:
            _gen_pdf(rng, i, doc_id, docs, media, expected)
        else:
            _gen_html(rng, i, doc_id, docs, oembeds, media, expected,
                      with_media=(roll >= 0.80),
                      giant=(rng.random() < 0.001))

    return {
        "documents_raw": docs,
        "oembed_docs": oembeds,
        "media_payloads": media,
        "expected_spans": expected,
    }


def _spans_row(parts: list[tuple[str, str | None, str | None]]) -> list[dict]:
    return [
        {"kind": k, "text": t, "media_ref": r, "offset": o}
        for o, (k, t, r) in enumerate(parts)
    ]


def _gen_pdf(rng, i, doc_id, docs, media, expected) -> None:
    url = f"https://files.example.com/{i}/paper.pdf"
    title = _words(rng, 4)
    author = _words(rng, 2)
    body = [title] + [_words(rng, 8) for _ in range(rng.randint(2, 5))]
    media.append({"media_ref": url, "ctype": "application/pdf",
                  "payload": _pdf_bytes(title, author, body)})
    docs.append({"doc_id": doc_id,
                 "spans": _spans_row([("pdf", "", url)]), "status": 200})
    expected.append({"doc_id": doc_id, "spans": _spans_row([
        ("media", _media_json(_pdf_snippet(url, title, author)), url),
        ("body_text", "\n".join(body), url)])})


def _gen_html(rng, i, doc_id, docs, oembeds, media, expected,
              with_media: bool, giant: bool) -> None:
    host = f"site{i % 97}.example.com"
    base = f"https://{host}/article/{i}"
    status = 404 if rng.random() < 0.03 else 200

    # --- choose winning values per precedence (the oracle's knowledge) ---
    og_title = _words(rng, 5).title() if rng.random() < 0.7 else None
    tw_title = _words(rng, 4).title() if rng.random() < 0.6 else None
    html_title = _words(rng, 3).title()
    sc_desc = _words(rng, 12) if rng.random() < 0.3 else None  # schema desc
    og_desc = _words(rng, 10) if rng.random() < 0.6 else None
    meta_desc = _words(rng, 8) if rng.random() < 0.8 else None

    # oembed (top title precedence), only effective when status == 200
    oe_title = None
    oe_href = None
    if rng.random() < 0.25:
        oe_href = f"https://oembed.example.com/svc?url={base}"
        oe_title = _words(rng, 6).title()
        oembeds.append({
            "ref": oe_href, "status": 200, "ctype": "application/json",
            "body": json.dumps({"type": "rich", "title": oe_title,
                                "html": "<iframe/>", "width": 640,
                                "height": 360}),
        })

    # og:image array: absolute + relative variants
    n_img = rng.choice([0, 0, 1, 1, 2, 3])
    og_images = []
    for k in range(n_img):
        if rng.random() < 0.3:
            rel = f"/img/{i}-{k}.jpg"
            og_images.append((rel, f"https://{host}/img/{i}-{k}.jpg"))
        else:
            absu = f"https://cdn.example.com/img/{i}-{k}.jpg"
            og_images.append((absu, absu))

    # JSON-LD NewsArticle block (exact text is the expected jsonld span)
    jsonld_text = None
    if rng.random() < 0.4:
        jsonld_text = json.dumps({
            "@context": {"@vocab": "http://schema.org/"},
            "@type": "NewsArticle",
            "headline": _words(rng, 5).title(),
            **({"description": sc_desc} if sc_desc else {}),
            "datePublished": "2020-01-%02dT10:00:00Z" % (1 + i % 28),
        }, ensure_ascii=False)
    elif sc_desc:
        jsonld_text = json.dumps(
            {"@context": {"@vocab": "http://schema.org/"},
             "@type": "WebPage", "description": sc_desc},
            ensure_ascii=False)

    # body content blocks (>=10 words, no links) + boilerplate decoys
    n_para = (rng.randint(2, 5) * (100 if giant else 1))
    paras = [_words(rng, rng.randint(12, 40)) for _ in range(n_para)]

    # --- assemble the html ---
    e = _html.escape
    head = [f"<title>{e(html_title)}</title>",
            '<meta charset="utf-8">']
    if meta_desc:
        head.append(f'<meta name="description" content="{e(meta_desc)}">')
    if og_title:
        head.append(f'<meta property="og:title" content="{e(og_title)}">')
    if tw_title:
        head.append(f'<meta name="twitter:title" content="{e(tw_title)}">')
    if og_desc:
        head.append(
            f'<meta property="og:description" content="{e(og_desc)}">')
    for src, _resolved in og_images:
        head.append(f'<meta property="og:image" content="{e(src)}">')
    if oe_href:
        head.append(f'<link rel="alternate" type="application/json+oembed" '
                    f'href="{e(oe_href)}">')
    head.append(f'<link rel="canonical" href="{e(base)}">')
    if jsonld_text:
        head.append('<script type="application/ld+json">'
                    + jsonld_text + "</script>")

    nav = ("<nav><ul>"
           + "".join(f'<li><a href="/s/{k}">{_words(rng, 2)}</a></li>'
                     for k in range(6))
           + "</ul></nav>")
    body = [nav]
    media_refs = []
    if with_media:
        for k in range(rng.randint(1, 3)):
            ref = f"https://cdn.example.com/media/{i}-{k}.png"
            w, h = rng.randint(16, 96), rng.randint(16, 96)
            media_refs.append((ref, "image/png", w, h))
            media.append({"media_ref": ref, "ctype": "image/png",
                          "payload": _png_bytes(w, h)})
    for p in paras:
        body.append(f"<p>{e(p)}</p>")
    body.append('<footer><a href="/about">about</a> · '
                '<a href="/tos">terms</a></footer>')

    html_doc = ("<!DOCTYPE html><html><head>" + "".join(head)
                + "</head><body>" + "".join(body) + "</body></html>")

    # chunk into 1-4 consecutive html spans
    n_chunks = rng.choice([1, 1, 1, 2, 3, 4])
    cuts = sorted(rng.sample(range(1, len(html_doc)), n_chunks - 1)) \
        if n_chunks > 1 else []
    pieces = []
    prev = 0
    for c in cuts + [len(html_doc)]:
        pieces.append(html_doc[prev:c])
        prev = c
    parts = [("html", pieces[0], base)] + [
        ("html", p, None) for p in pieces[1:]]
    for ref, _ct, _w, _h in media_refs:
        parts.append(("media", "", ref))
    docs.append({"doc_id": doc_id, "spans": _spans_row(parts),
                 "status": status})

    # --- expected output spans, by construction ---
    exp: list[tuple[str, str | None, str | None]] = []
    title = None
    if status == 200 and oe_title:
        title = oe_title
    title = title or og_title or tw_title or html_title
    if title:
        exp.append(("title", title, None))
    desc = sc_desc or og_desc or meta_desc
    if desc:
        exp.append(("description", desc, None))
    for _src, resolved in og_images:
        exp.append(("og_image", "", resolved))
    if jsonld_text:
        exp.append(("jsonld", jsonld_text, None))
    for p in paras:
        exp.append(("body_text", p, None))
    for ref, ct, w, h in media_refs:
        exp.append(("media",
                    _media_json(_exif_image_snippet(ref, ct, w, h)), ref))
    expected.append({"doc_id": doc_id, "spans": _spans_row(exp)})


def write_corpus(out_dir: str, n_docs: int, seed: int = 42) -> dict:
    """Write the four tables as parquet via pyarrow; returns paths."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = generate_corpus(n_docs, seed)
    os.makedirs(out_dir, exist_ok=True)
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    schemas = {
        "documents_raw": pa.schema([("doc_id", pa.string()),
                                    ("spans", pa.list_(span_t)),
                                    ("status", pa.int32())]),
        "oembed_docs": pa.schema([("ref", pa.string()),
                                  ("status", pa.int32()),
                                  ("ctype", pa.string()),
                                  ("body", pa.string())]),
        "media_payloads": pa.schema([("media_ref", pa.string()),
                                     ("ctype", pa.string()),
                                     ("payload", pa.binary())]),
        "expected_spans": pa.schema([("doc_id", pa.string()),
                                     ("spans", pa.list_(span_t))]),
    }
    paths = {}
    for name, rows in corpus.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        table = pa.Table.from_pylist(rows, schema=schemas[name])
        # small row groups so a Spark scan parallelizes — a single giant
        # row group serializes the whole read into one task
        pq.write_table(table, path, row_group_size=1024)
        paths[name] = path
    return paths
