"""PDF text extraction — the "PDF/layout parse" arm of main-content
extraction, pure stdlib (re + zlib).

The reference stops at PDF *metadata* (packages/unfurl-exiftool/src/
index.ts:25-66 shells out for Info-dict fields); a training-data
pipeline needs the body text.  This module walks the classic COS
structure without an xref table (robust against the truncated/appended
files a crawl corpus is full of): scan ``N G obj`` objects, inflate
FlateDecode streams, run a PDF content-stream text machine over every
stream that shows text (BT/Tj/TJ), and emit text blocks.

Scope (honest boundaries, all surfaced as empty/partial text rather
than errors — extraction must be total):
- Simple fonts read as Latin-1-ish byte strings (WinAnsi/Standard/
  MacRoman agree with Latin-1 on the ASCII range that dominates real
  text); composite/Identity-H CID text decodes to high-bit garbage and
  is dropped by a printability gate instead of emitted as noise.
- FlateDecode (the format used by effectively every text PDF since
  1.2) and uncompressed streams; LZW/DCT/JBIG2 streams are skipped.
- Object streams (PDF 1.5 ObjStm) are unpacked too — text PDFs from
  modern producers keep content streams outside ObjStm, but page
  dictionaries often live inside.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# COS object scan

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")

# PDF string escapes (7.3.4.2)
_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _iter_objects(data: bytes):
    """Yield (obj_bytes) for every ``N G obj ... endobj`` body, in file
    order (file order ≈ page order for real-world linear producers)."""
    for m in _OBJ_RE.finditer(data):
        start = m.end()
        end = data.find(b"endobj", start)
        if end < 0:
            end = len(data)
        yield data[start:end]


def _stream_payload(obj: bytes) -> bytes | None:
    """Raw stream bytes of an object, or None.  The declared /Length is
    ignored (it is often an indirect ref); ``endstream`` delimits."""
    m = _STREAM_RE.search(obj)
    if not m:
        return None
    end = obj.rfind(b"endstream")
    if end < 0:
        end = len(obj)
    raw = obj[m.end():end]
    # trailing EOL before endstream belongs to the delimiter
    if raw.endswith(b"\r\n"):
        raw = raw[:-2]
    elif raw.endswith(b"\n") or raw.endswith(b"\r"):
        raw = raw[:-1]
    return raw


# /Filter value: a single name or an array of names.  The Flate match is
# name-boundary-aware — a bare ``/Fl`` abbreviation counts, but dict keys
# that merely START with /Fl (e.g. ``/Flags 4``) must not send an
# uncompressed stream to zlib and silently drop its text.
_FILTER_VAL_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z]*)")
_FLATE_NAME_RE = re.compile(rb"/Fl(?:ateDecode)?(?![0-9A-Za-z])")


def _inflate(obj: bytes, raw: bytes) -> bytes | None:
    head = obj[:_STREAM_RE.search(obj).start()]
    m = _FILTER_VAL_RE.search(head)
    if m and _FLATE_NAME_RE.search(m.group(1)):
        try:
            return zlib.decompressobj().decompress(raw, 1 << 26)
        except zlib.error:
            return None
    if b"/Filter" not in head:
        return raw  # uncompressed stream
    return None  # LZW/DCT/CCITT/indirect-ref filter — not text


def _unpack_objstm(obj: bytes, decoded: bytes):
    """PDF 1.5 object streams: header of (num, offset) pairs, then the
    packed objects — yield each packed object body."""
    head = obj[:_STREAM_RE.search(obj).start()]
    mn = re.search(rb"/N\s+(\d+)", head)
    mf = re.search(rb"/First\s+(\d+)", head)
    if not (b"/ObjStm" in head and mn and mf):
        return
    n, first = int(mn.group(1)), int(mf.group(1))
    nums = re.findall(rb"\d+", decoded[:first])
    offs = [int(x) for x in nums[1::2]][:n]
    for i, off in enumerate(offs):
        end = offs[i + 1] if i + 1 < len(offs) else len(decoded) - first
        yield decoded[first + off:first + end]


# ---------------------------------------------------------------------------
# content-stream text machine

_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\((?:[^()\\]|\\.)*\))*\)"   # ( string ) 1-level nest
    rb"|<[0-9A-Fa-f\s]*>"                           # <hex string>
    rb"|/[^\s/<>\[\]()]*"                           # /Name
    rb"|[-+]?\d*\.?\d+"                             # number
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+")                             # operator


def _pdf_string_bytes(tok: bytes) -> bytes:
    if tok.startswith(b"<"):
        hexs = re.sub(rb"\s", b"", tok[1:-1])
        if len(hexs) % 2:
            hexs += b"0"
        try:
            return bytes.fromhex(hexs.decode("ascii"))
        except ValueError:
            return b""
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1:i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
                continue
            m = re.match(rb"[0-7]{1,3}", body[i + 1:i + 4])
            if m:
                out.append(int(m.group(0), 8) & 0xFF)
                i += 1 + len(m.group(0))
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                continue
            i += 1
            continue
        out += c
        i += 1
    return bytes(out)


def _printable_ratio(s: str) -> float:
    if not s:
        return 0.0
    good = sum(1 for ch in s if ch.isprintable() or ch in "\n\t ")
    return good / len(s)


def _run_text_machine(content: bytes) -> str:
    """Execute the text-positioning subset of the content-stream
    operator set: Tj/TJ/'/\" show text; Td/TD/T*/Tm drive line breaks.
    Returns the stream's text with newlines at line moves."""
    lines: list[bytearray] = []
    cur = bytearray()
    stack: list = []  # operand stack (strings/numbers/arrays)
    font_size = 10.0  # current Tf size, drives the word-gap heuristic
    last_show = 0     # glyph count of the previous show on this line

    def newline():
        nonlocal cur, last_show
        if cur:
            lines.append(cur)
        cur = bytearray()
        last_show = 0

    def show(raw: bytes):
        nonlocal last_show
        cur.extend(raw)
        last_show = len(raw)

    in_array: list | None = None
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        c0 = tok[:1]
        if tok == b"[":
            in_array = []
            continue
        if tok == b"]":
            stack.append(in_array or [])
            in_array = None
            continue
        if c0 in b"(<":
            val = _pdf_string_bytes(tok)
            (in_array if in_array is not None else stack).append(val)
            continue
        if c0 in b"/+-.0123456789":
            try:
                num = float(tok)
            except ValueError:
                num = tok
            (in_array if in_array is not None else stack).append(num)
            continue
        # operator
        if tok == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif tok == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, float) and el < -180:
                        show(b" ")  # large negative kern = word gap
        elif tok in (b"'", b'"'):
            newline()
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif tok in (b"T*",):
            newline()
        elif tok == b"Td" or tok == b"TD":
            ty = stack[-1] if stack and isinstance(stack[-1], float) else 0
            tx = (stack[-2] if len(stack) > 1
                  and isinstance(stack[-2], float) else 0)
            if ty != 0:
                newline()
            elif cur and tx > (0.38 * last_show + 0.2) * font_size:
                # TeX-style producers advance per word with no literal
                # spaces: a horizontal move larger than the previous
                # show's estimated width (~0.38 em/glyph) plus a space
                # margin is a word gap
                show(b" ")
        elif tok == b"Tf":
            if stack and isinstance(stack[-1], float) and stack[-1] > 0:
                font_size = stack[-1]
        elif tok == b"Tm":
            newline()
        elif tok in (b"BT", b"ET"):
            newline()
        if tok.isalpha() or tok in (b"'", b'"', b"T*"):
            stack.clear()
    newline()
    text = "\n".join(ln.decode("latin-1") for ln in lines if ln)
    # TeX OT1/Type1 text fonts put ligatures at 0x0B-0x0F ("con\x0cgures"
    # → "configures"); 0x0B/0x0C/0x0E/0x0F are never legitimate prose.
    # 0x0D is ambiguous — it is ALSO a carriage return (a raw EOL inside
    # a PDF literal string means line feed, spec 7.3.4.2) — so map it to
    # 'fl' only in the TeX shape (letters on both sides) and to a
    # newline otherwise.
    for raw, lig in (("\x0b", "ff"), ("\x0c", "fi"),
                     ("\x0e", "ffi"), ("\x0f", "ffl")):
        text = text.replace(raw, lig)
    if "\x0d" in text:
        text = re.sub(r"(?<=[A-Za-z])\x0d(?=[A-Za-z])", "fl", text)
        text = text.replace("\x0d", "\n")
    return text


# word-ish run that must survive the printability gate
_TEXTY = re.compile(r"[A-Za-z0-9]{2}")


def pdf_text_blocks(data: bytes, max_streams: int = 512) -> list[str]:
    """All text blocks (one per text-bearing content stream ≈ page),
    file order.  Total: malformed input yields [], never raises."""
    blocks: list[str] = []
    try:
        if not data.startswith(b"%PDF-"):
            return []
        if re.search(rb"/Encrypt\s", data[-2048:]) or b"/Encrypt" in \
                data[data.rfind(b"trailer"):][:512]:
            return []  # encrypted: strings are ciphertext
        n = 0
        for obj in _iter_objects(data):
            if n >= max_streams:
                break
            raw = _stream_payload(obj)
            if raw is None:
                continue
            decoded = _inflate(obj, raw)
            if decoded is None:
                continue
            n += 1
            candidates = [decoded]
            candidates.extend(_unpack_objstm(obj, decoded))
            for cand in candidates:
                if b"BT" not in cand or not (b"Tj" in cand or b"TJ" in cand
                                             or b"'" in cand):
                    continue
                text = _run_text_machine(cand)
                # drop CID/garbage streams, keep real prose
                if (len(text) >= 3 and _printable_ratio(text) >= 0.85
                        and _TEXTY.search(text)):
                    blocks.append(text)
    except Exception:  # total by contract
        return blocks
    return blocks


_PAGE_NO = re.compile(r"^\s*(?:[-–—\s]*\d{1,4}[-–—\s]*|[ivxlcdm]{1,7})\s*$",
                      re.IGNORECASE)


def strip_page_boilerplate(blocks: list[str]) -> list[str]:
    """Layout pass over per-page text blocks: drop running headers /
    footers (lines repeating on ≥ a third of pages, 3+ occurrences)
    and bare page-number lines.  Single-page documents pass through
    untouched — repetition is only evidence across pages."""
    if len(blocks) < 3:
        return [b for b in blocks if b]
    from collections import Counter
    freq = Counter()
    for b in blocks:
        lines = b.split("\n")
        # headers/footers live at the page edges
        for ln in {ln.strip() for ln in lines[:3] + lines[-3:]}:
            if ln:
                freq[ln] += 1
    floor = max(3, (len(blocks) + 2) // 3)
    running = {ln for ln, n in freq.items() if n >= floor}
    out = []
    for b in blocks:
        lines = b.split("\n")
        n = len(lines)
        # bare page-number lines live at the page EDGES — matching
        # anywhere would delete real prose ('Mill', 'civil', a bare year)
        kept = [ln for i, ln in enumerate(lines)
                if ln.strip() not in running
                and not ((i < 2 or i >= n - 2) and _PAGE_NO.match(ln))]
        if any(ln.strip() for ln in kept):
            out.append("\n".join(kept))
    return out


def pdf_text(data: bytes) -> str:
    """Whole-document main content: per-page blocks with running
    headers/footers and page numbers stripped, joined by blank lines."""
    return "\n\n".join(strip_page_boilerplate(pdf_text_blocks(data)))
