"""Byte-level charset sniffing for HTML payloads.

The reference streams raw bytes into htmlparser2 (unfurl-html/src/index.ts:223),
which means non-UTF-8 pages survive end-to-end; a fixed utf-8 decode mangles
latin-1/shift-jis/gbk documents.  This module is the boundary where bytes
become str, following the WHATWG encoding-sniffing order:

1. BOM (UTF-8 / UTF-16 LE / UTF-16 BE) — authoritative.
2. ``charset=`` parameter of the transport content-type.
3. HTML5 prescan of the first 1024 bytes: ``<meta charset=...>`` and
   ``<meta http-equiv="content-type" content="...charset=...">``.
4. Fallback: UTF-8.

Unknown/unsupported labels degrade to UTF-8 with errors="replace" — never
raise (per-doc isolation is the pipeline contract).
"""

from __future__ import annotations

import codecs
import re

# WHATWG encoding labels → python codec names (subset: the labels that
# appear in real transport headers / meta prescans; everything else falls
# through codecs.lookup which handles the standard aliases).
_LABELS = {
    "unicode-1-1-utf-8": "utf-8",
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
    "latin1": "latin-1",
    "us-ascii": "latin-1",   # WHATWG maps ascii → windows-1252 superset
    "windows-1252": "cp1252",
    "x-cp1252": "cp1252",
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "gb2312": "gbk",
    "gb_2312": "gbk",
    "gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-jp": "euc_jp",
    "euc-kr": "euc_kr",
    "ks_c_5601-1987": "euc_kr",
    "iso-2022-jp": "iso2022_jp",
    "koi8-r": "koi8_r",
    "koi8-u": "koi8_u",
    "windows-1251": "cp1251",
    "windows-1250": "cp1250",
    "windows-1254": "cp1254",
    "windows-1256": "cp1256",
    "iso-8859-2": "iso8859-2",
    "iso-8859-9": "cp1254",  # WHATWG: iso-8859-9 label decodes as windows-1254
    "iso-8859-15": "iso8859-15",
    "tis-620": "cp874",
    "utf-16": "utf-16-le",   # label without BOM: WHATWG says LE
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

_CT_CHARSET = re.compile(rb"""charset\s*=\s*["']?([A-Za-z0-9._\-]+)""",
                         re.IGNORECASE)
_META_CHARSET = re.compile(
    rb"""<meta\s[^>]*?charset\s*=\s*["']?([A-Za-z0-9._\-]+)""",
    re.IGNORECASE | re.DOTALL)


def resolve_label(label: str | bytes | None) -> str | None:
    """WHATWG-ish encoding label → python codec name, or None if unknown."""
    if label is None:
        return None
    if isinstance(label, bytes):
        try:
            label = label.decode("ascii")
        except UnicodeDecodeError:
            return None
    label = label.strip().strip("\"'").lower()
    if not label:
        return None
    codec = _LABELS.get(label)
    if codec is None:
        try:
            codec = codecs.lookup(label).name
        except LookupError:
            return None
    return codec


def sniff_charset(data: bytes, content_type: str | None = None) -> str:
    """Detect the charset of an HTML byte payload (never raises)."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    # the plain 'utf-16' codec consumes the BOM it detects (the -le/-be
    # variants would emit a stray U+FEFF as leading document text)
    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    if content_type:
        m = _CT_CHARSET.search(content_type.encode("ascii", "ignore"))
        if m:
            codec = resolve_label(m.group(1))
            if codec:
                return codec
    head = data[:1024]
    m = _META_CHARSET.search(head)
    if m and m.group(1).lower() != b"content-type":
        # matches both <meta charset=X> and the http-equiv content attr
        codec = resolve_label(m.group(1))
        if codec:
            return codec
    return "utf-8"


def decode_html(data: bytes | str | None,
                content_type: str | None = None) -> str:
    """Bytes → str via the sniffed charset; str passes through unchanged."""
    if data is None:
        return ""
    if isinstance(data, str):
        return data
    codec = sniff_charset(data, content_type)
    try:
        return data.decode(codec, "replace")
    except LookupError:  # defensive: resolve_label already filtered
        return data.decode("utf-8", "replace")
