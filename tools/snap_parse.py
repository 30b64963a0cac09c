"""Jest snapshot (.snap) → Python objects.

Parses the reference's golden files
(packages/*/src/__snapshots__/index.spec.ts.snap) — Jest pretty-format v1:
``exports[`name N`] = `\nObject {...}\n`;`` with Object/Array literals,
quoted strings, bare undefined/NaN/true/false/numbers, and Dates serialized
as bare ISO strings.  Produces the expected-output oracle for span parity.
"""

from __future__ import annotations

import re

UNDEFINED = "__undefined__"


class SnapDate(str):
    """Marker type: a Date serialized by pretty-format."""


_ENTRY = re.compile(
    r"exports\[`(.*?) (\d+)`\] = `\n(.*?)\n`;\n", re.DOTALL)

_ISO = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z$")
_NUM = re.compile(r"^-?(\d+\.?\d*|\.\d+)(e[+-]?\d+)?$", re.IGNORECASE)


def parse_snap_file(path: str) -> dict[str, object]:
    """→ {test name: parsed value} (test name includes 'should read <url>')."""
    text = open(path, encoding="utf-8").read()
    out = {}
    for m in _ENTRY.finditer(text):
        name, _idx, body = m.groups()
        # template-literal unescape: jest escapes ` $ \ with a backslash
        body = re.sub(r"\\([`$\\])", r"\1", body)
        out[name] = _Parser(body).parse_value()
    return out


def url_of(test_name: str) -> str | None:
    m = re.search(r"should read (.+)$", test_name)
    return m.group(1) if m else None


class _Parser:
    def __init__(self, text: str):
        self.t = text
        self.i = 0

    def _ws(self):
        while self.i < len(self.t) and self.t[self.i] in " \t\n\r":
            self.i += 1

    def parse_value(self):
        self._ws()
        t, i = self.t, self.i
        if t.startswith("Object {", i):
            self.i = i + len("Object {")
            return self._parse_object()
        if t.startswith("Array [", i):
            self.i = i + len("Array [")
            return self._parse_array()
        if t.startswith('"', i):
            return self._parse_string()
        # bare token up to , } ] or newline
        j = i
        while j < len(t) and t[j] not in ",\n}]":
            j += 1
        tok = t[i:j].strip()
        self.i = j
        if tok == "undefined":
            return UNDEFINED
        if tok == "null":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "NaN":
            return float("nan")
        if tok == "Infinity":
            return float("inf")
        if tok == "-Infinity":
            return float("-inf")
        if _ISO.match(tok):
            return SnapDate(tok)
        if _NUM.match(tok):
            f = float(tok)
            return int(f) if f == int(f) and "e" not in tok.lower() else f
        return tok

    def _parse_string(self) -> str:
        # pretty-format escapes only " and \ inside strings; newlines literal
        assert self.t[self.i] == '"'
        self.i += 1
        out = []
        t = self.t
        while self.i < len(t):
            c = t[self.i]
            if c == "\\" and self.i + 1 < len(t) and t[self.i + 1] in '"\\':
                out.append(t[self.i + 1])
                self.i += 2
                continue
            if c == '"':
                self.i += 1
                return "".join(out)
            out.append(c)
            self.i += 1
        return "".join(out)

    def _parse_object(self) -> dict:
        obj = {}
        while True:
            self._ws()
            if self.t.startswith("}", self.i):
                self.i += 1
                return obj
            key = self._parse_string()
            self._ws()
            assert self.t[self.i] == ":", self.t[self.i: self.i + 40]
            self.i += 1
            obj[key] = self.parse_value()
            self._ws()
            if self.t.startswith(",", self.i):
                self.i += 1

    def _parse_array(self) -> list:
        arr = []
        while True:
            self._ws()
            if self.t.startswith("]", self.i):
                self.i += 1
                return arr
            arr.append(self.parse_value())
            self._ws()
            if self.t.startswith(",", self.i):
                self.i += 1
