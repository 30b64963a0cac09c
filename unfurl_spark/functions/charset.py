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

# The COMPLETE WHATWG Encoding Standard label registry
# (https://encoding.spec.whatwg.org/#names-and-labels): every label the
# spec defines, keyed python-codec → spec labels.  Two spec encodings have
# no python codec and use sentinels handled in decode_html:
# ``replacement`` (whole stream → one U+FFFD) and ``x-user-defined``
# (0x80+n → U+F780+n private-use).
# Deliberate python-codec choices where the spec encoding is a superset of
# the same-named python codec: EUC-KR is windows-949 (cp949), Big5 carries
# the HKSCS extensions (big5hkscs).  Shift_JIS stays python shift_jis (the
# spec index ≈ windows-31j/cp932; the delta is NEC/IBM extension glyphs
# only, and the snapshot-parity corpus pins the current behavior).
_ENCODINGS: dict[str, tuple[str, ...]] = {
    "utf-8": ("unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8",
              "utf-8", "utf8", "x-unicode20utf8"),
    "cp866": ("866", "cp866", "csibm866", "ibm866"),
    "iso8859-2": ("csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2",
                  "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2",
                  "latin2"),
    "iso8859-3": ("csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3",
                  "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3",
                  "latin3"),
    "iso8859-4": ("csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4",
                  "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4",
                  "latin4"),
    "iso8859-5": ("csisolatincyrillic", "cyrillic", "iso-8859-5",
                  "iso-ir-144", "iso8859-5", "iso88595", "iso_8859-5",
                  "iso_8859-5:1988"),
    "iso8859-6": ("arabic", "asmo-708", "csiso88596e", "csiso88596i",
                  "csisolatinarabic", "ecma-114", "iso-8859-6",
                  "iso-8859-6-e", "iso-8859-6-i", "iso-ir-127",
                  "iso8859-6", "iso88596", "iso_8859-6",
                  "iso_8859-6:1987"),
    "iso8859-7": ("csisolatingreek", "ecma-118", "elot_928", "greek",
                  "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7",
                  "iso88597", "iso_8859-7", "iso_8859-7:1987",
                  "sun_eu_greek"),
    "iso8859-8": ("csiso88598e", "csisolatinhebrew", "hebrew",
                  "iso-8859-8", "iso-8859-8-e", "iso-ir-138", "iso8859-8",
                  "iso88598", "iso_8859-8", "iso_8859-8:1988", "visual",
                  # ISO-8859-8-I: same bytes, logical order
                  "csiso88598i", "iso-8859-8-i", "logical"),
    "iso8859-10": ("csisolatin6", "iso-8859-10", "iso-ir-157",
                   "iso8859-10", "iso885910", "l6", "latin6"),
    "iso8859-13": ("iso-8859-13", "iso8859-13", "iso885913"),
    "iso8859-14": ("iso-8859-14", "iso8859-14", "iso885914"),
    "iso8859-15": ("csisolatin9", "iso-8859-15", "iso8859-15",
                   "iso885915", "iso_8859-15", "l9"),
    "iso8859-16": ("iso-8859-16",),
    "koi8_r": ("cskoi8r", "koi", "koi8", "koi8-r", "koi8_r"),
    "koi8_u": ("koi8-ru", "koi8-u"),
    "mac_roman": ("csmacintosh", "mac", "macintosh", "x-mac-roman"),
    "cp874": ("dos-874", "iso-8859-11", "iso8859-11", "iso885911",
              "tis-620", "windows-874"),
    "cp1250": ("cp1250", "windows-1250", "x-cp1250"),
    "cp1251": ("cp1251", "windows-1251", "x-cp1251"),
    "cp1252": ("ansi_x3.4-1968", "ascii", "cp1252", "cp819",
               "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100",
               "iso8859-1", "iso88591", "iso_8859-1", "iso_8859-1:1987",
               "l1", "latin1", "us-ascii", "windows-1252", "x-cp1252"),
    "cp1253": ("cp1253", "windows-1253", "x-cp1253"),
    "cp1254": ("cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148",
               "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989",
               "l5", "latin5", "windows-1254", "x-cp1254"),
    "cp1255": ("cp1255", "windows-1255", "x-cp1255"),
    "cp1256": ("cp1256", "windows-1256", "x-cp1256"),
    "cp1257": ("cp1257", "windows-1257", "x-cp1257"),
    "cp1258": ("cp1258", "windows-1258", "x-cp1258"),
    "mac_cyrillic": ("x-mac-cyrillic", "x-mac-ukrainian"),
    "gbk": ("chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312",
            "gb_2312-80", "gbk", "iso-ir-58", "x-gbk"),
    "gb18030": ("gb18030",),
    "big5hkscs": ("big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5"),
    "euc_jp": ("cseucpkdfmtjapanese", "euc-jp", "x-euc-jp"),
    "iso2022_jp": ("csiso2022jp", "iso-2022-jp"),
    "shift_jis": ("csshiftjis", "ms932", "ms_kanji", "shift-jis",
                  "shift_jis", "sjis", "windows-31j", "x-sjis"),
    "cp949": ("cseuckr", "csksc56011987", "euc-kr", "iso-ir-149",
              "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601",
              "ksc_5601", "windows-949"),
    "replacement": ("csiso2022kr", "hz-gb-2312", "iso-2022-cn",
                    "iso-2022-cn-ext", "iso-2022-kr", "replacement"),
    "utf-16-be": ("unicodefffe", "utf-16be"),
    # label without a BOM: WHATWG says LE (incl. the bare "utf-16" label)
    "utf-16-le": ("csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
                  "unicodefeff", "utf-16", "utf-16le"),
    "x-user-defined": ("x-user-defined",),
}

_LABELS = {label: codec
           for codec, labels in _ENCODINGS.items() for label in labels}

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
    if codec == "replacement":
        # WHATWG replacement encoding: the entire stream decodes to one
        # U+FFFD (defense against ISO-2022-KR/HZ escape smuggling)
        return "�" if data else ""
    if codec == "x-user-defined":
        return "".join(chr(b) if b < 0x80 else chr(0xF780 + b - 0x80)
                       for b in data)
    try:
        return data.decode(codec, "replace")
    except LookupError:  # defensive: resolve_label already filtered
        return data.decode("utf-8", "replace")
