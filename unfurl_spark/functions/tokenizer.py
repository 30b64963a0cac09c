"""Single-pass document tokenizer — the whole-document twin of
``HTMLParser.feed(html); close()`` with ``convert_charrefs=True``.

The stdlib parser is built for INCREMENTAL feeding: every event pays for
line/column tracking (updatepos), partial-input checks ("could this tag
continue in the next chunk?"), and buffer re-slicing.  An extraction
engine always has the complete document, so this module re-derives the
same event stream — byte-equivalent callbacks, validated against the
stdlib path over the reference's full fixture corpus and hypothesis
markup in tests/test_fast_tokenizer.py — from one tight scan loop.  The
attribute / tag-name / close-construct REGEXES ARE THE STDLIB'S OWN
(imported from html.parser / _markupbase), so tokenization corner cases
(tolerant attr syntax, charref unescaping in values, bogus comments,
cdata content elements, marked sections) match by construction.

Dispatch mirrors html.parser.HTMLParser.goahead (end=True) at
python3.11/html/parser.py:133-250 with handle_comment/decl/pi elided —
the driven handler (htmlmeta.MetaHandler) does not override them.
"""

from __future__ import annotations

import re
import sys
from html import unescape as _unescape
from html.parser import (
    attrfind_tolerant,
    commentclose,
    endtagfind,
    locatestarttagend_tolerant,
    piclose,
    tagfind_tolerant,
)

_CDATA_CLOSE = {
    # stdlib set_cdata_mode's exact `interesting` pattern INCLUDING the
    # `\s*>` suffix: without it a truncated `</script` (no `>`) or a
    # near-miss `</scriptx>` would end cdata here while the stdlib
    # driver drops the unterminated tail — a byte-equivalence break
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}
_ENDTAG_GT = re.compile(">")
# _markupbase's marked-section machinery (same patterns)
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MARKEDCLOSE = re.compile(r"]\s*]\s*>")
_MSMARKEDCLOSE = re.compile(r"]\s*>")
_ATTR_CHARS = frozenset("abcdefghijklmnopqrstuvwxyz=/"
                        "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
# fast-path tag shapes: one regex, no attribute machinery.  _FAST_TAG
# recognizes the overwhelmingly common start-tag form — simple tag name,
# zero or more `name="value"` attributes (double-quoted, charref-free,
# whitespace-separated), optional self-close — whose stdlib parse is
# provably identical: tagfind_tolerant yields the same name, the
# attrfind_tolerant loop yields the same (name, value) pairs in order
# (our name/value character classes are strict subsets of the stdlib's),
# the '&'-free value makes unescape the identity, and the tail resolves
# to end == '>' or '/>'.  Anything else falls through to the stdlib-
# regex path in _starttag.  Equivalence is asserted by the A/B tests
# (full fixture corpus + hypothesis) in tests/test_fast_tokenizer.py.
_FAST_TAG = re.compile(
    r'<([a-zA-Z][a-zA-Z0-9]*)'
    r'((?:\s+[a-zA-Z][-a-zA-Z0-9_:.]*="[^"<>&]*")*)'
    r'\s*(/?)>')
_FAST_ATTR = re.compile(r'([a-zA-Z][-a-zA-Z0-9_:.]*)="([^"]*)"')
_SIMPLE_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)>")

# tag / attribute names come from a tiny vocabulary, but str.lower()
# allocates a fresh string every call (~600k allocations per 4k docs
# profiled) — memoize raw → interned-lowercase.  Bounded: a hostile
# document minting unlimited distinct names flushes the cache instead
# of growing it.
_LC_CACHE: dict[str, str] = {}


def _lc(s: str) -> str:
    v = _LC_CACHE.get(s)
    if v is None:
        if len(_LC_CACHE) >= 4096:
            _LC_CACHE.clear()
        v = _LC_CACHE[s] = sys.intern(s.lower())
    return v


def _starttag(h, rawdata: str, i: int, n: int):
    """parse_starttag + check_for_whole_start_tag (end-of-input → -1)."""
    m = locatestarttagend_tolerant.match(rawdata, i)
    j = m.end()
    nxt = rawdata[j:j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/":
        if rawdata.startswith("/>", j):
            endpos = j + 2
        else:
            return -1, None  # stdlib: '/' not followed by '>' → boundary
    elif nxt == "":
        return -1, None
    elif nxt in _ATTR_CHARS:
        return -1, None
    else:
        endpos = j if j > i else i + 1

    attrs = []
    m = tagfind_tolerant.match(rawdata, i + 1)
    k = m.end()
    tag = _lc(m.group(1))
    while k < endpos:
        am = attrfind_tolerant.match(rawdata, k)
        if not am:
            break
        attrname, rest, attrvalue = am.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif attrvalue[:1] == "'" == attrvalue[-1:] or \
                attrvalue[:1] == '"' == attrvalue[-1:]:
            attrvalue = attrvalue[1:-1]
        if attrvalue and "&" in attrvalue:
            attrvalue = _unescape(attrvalue)
        attrs.append((_lc(attrname), attrvalue))
        k = am.end()

    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        h.handle_data(rawdata[i:endpos])
        return endpos, None
    if end.endswith("/>"):
        h.handle_startendtag(tag, attrs)
        return endpos, None
    h.handle_starttag(tag, attrs)
    if tag in ("script", "style"):
        return endpos, tag
    return endpos, None


def _endtag(h, rawdata: str, i: int, cdata_elem):
    """parse_endtag, including cdata re-entry and bogus-comment skips."""
    m = _ENDTAG_GT.search(rawdata, i + 1)
    if not m:
        return -1, cdata_elem
    gtpos = m.end()
    m2 = endtagfind.match(rawdata, i)
    if not m2:
        if cdata_elem is not None:
            h.handle_data(rawdata[i:gtpos])
            return gtpos, cdata_elem
        nm = tagfind_tolerant.match(rawdata, i + 2)
        if not nm:
            if rawdata[i:i + 3] == "</>":
                return i + 3, cdata_elem
            pos = rawdata.find(">", i + 2)  # bogus comment, no callback
            return (pos + 1 if pos != -1 else -1), cdata_elem
        tagname = _lc(nm.group(1))
        gtpos = rawdata.find(">", nm.end())
        h.handle_endtag(tagname)
        return gtpos + 1, cdata_elem
    elem = _lc(m2.group(1))
    if cdata_elem is not None and elem != cdata_elem:
        h.handle_data(rawdata[i:gtpos])
        return gtpos, cdata_elem
    h.handle_endtag(elem)
    return gtpos, None  # clear_cdata_mode


def _declaration(rawdata: str, i: int, n: int) -> int:
    """'<!' constructs: doctype / marked section / bogus comment — the
    handler callbacks are no-ops, only the resume offset matters."""
    if rawdata.startswith("<![", i):
        nm = _DECLNAME.match(rawdata, i + 3)
        if i + 3 == n:
            return -1
        if not nm:
            # _markupbase._scan_name error path
            raise NotImplementedError(
                "expected name token in marked section")
        if nm.end() == n:
            return -1
        sect = nm.group().strip().lower()
        if sect in ("temp", "cdata", "ignore", "include", "rcdata"):
            cm = _MARKEDCLOSE.search(rawdata, i + 3)
        elif sect in ("if", "else", "endif"):
            cm = _MSMARKEDCLOSE.search(rawdata, i + 3)
        else:
            raise AssertionError(
                "unknown status keyword %r in marked section"
                % rawdata[i + 3:nm.end()])
        return cm.end() if cm else -1
    if rawdata[i:i + 9].lower() == "<!doctype":
        gtpos = rawdata.find(">", i + 9)
        return gtpos + 1 if gtpos != -1 else -1
    pos = rawdata.find(">", i + 2)  # bogus comment
    return pos + 1 if pos != -1 else -1


def drive(h, rawdata: str) -> None:
    """Emit the full event stream for one complete document."""
    i, n = 0, len(rawdata)
    cdata_elem = None
    handle_data = h.handle_data
    find = rawdata.find
    startswith = rawdata.startswith
    while i < n:
        if cdata_elem is None:
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                chunk = rawdata[i:j]
                handle_data(_unescape(chunk) if "&" in chunk else chunk)
            i = j
            if i == n:
                break
        else:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if not m:
                return  # unterminated cdata: stdlib drops the tail
            j = m.start()
            if i < j:
                handle_data(rawdata[i:j])  # cdata: no charref conversion
            i = j
        c = rawdata[i + 1] if i + 1 < n else ""
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            m = _FAST_TAG.match(rawdata, i)
            if m:
                tag = _lc(m.group(1))
                astr = m.group(2)
                attrs = ([(_lc(an), av)
                          for an, av in _FAST_ATTR.findall(astr)]
                         if astr else ())
                if m.group(3):
                    h.handle_startendtag(tag, attrs)
                else:
                    h.handle_starttag(tag, attrs)
                    if tag in ("script", "style"):
                        cdata_elem = tag
                i = m.end()
                continue
            k, new_cdata = _starttag(h, rawdata, i, n)
            if new_cdata is not None:
                cdata_elem = new_cdata
        elif c == "/":
            if cdata_elem is None:
                m = _SIMPLE_END.match(rawdata, i)
                if m:
                    h.handle_endtag(_lc(m.group(1)))
                    i = m.end()
                    continue
            k, cdata_elem = _endtag(h, rawdata, i, cdata_elem)
        elif startswith("<!--", i):
            m = commentclose.search(rawdata, i + 4)
            k = m.end() if m else -1
        elif c == "?":
            m = piclose.search(rawdata, i + 2)
            k = m.end() if m else -1
        elif c == "!":
            k = _declaration(rawdata, i, n)
        elif i + 1 < n:
            handle_data("<")
            k = i + 1
        else:
            break  # lone trailing '<' — emitted by the tail block below
        if k < 0:
            # goahead(end=1) recovery for unterminated constructs
            k = find(">", i + 1)
            if k < 0:
                k = find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            if cdata_elem is None:
                chunk = rawdata[i:k]
                handle_data(_unescape(chunk) if "&" in chunk else chunk)
            else:
                handle_data(rawdata[i:k])
        i = k
    if i < n and cdata_elem is None:
        chunk = rawdata[i:n]
        handle_data(_unescape(chunk) if "&" in chunk else chunk)
