"""Main-content extraction (boilerplate strip) — the ``body_text`` spans.

New capability required by the engine contract (absent from the reference,
SURVEY.md §7 step 7): shallow-text-feature block classification in the
spirit of Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features" (WSDM 2010) — number of words and link density per block, with
the neighbor-block smoothing rule from that paper.  Pure Python, one pass,
Arrow-batched alongside the metadata tokenizer.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "td", "th",
    "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
    "figcaption", "summary", "dd", "dt",
}
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe",
              "object", "option", "select", "textarea", "head"}
_BOILER_TAGS = {"nav", "header", "footer", "aside", "form", "menu"}
_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}

_WS = re.compile(r"\s+")
_WORD = re.compile(r"\S+")

# Classification thresholds (WSDM'10 densitometric classifier, simplified
# to the two dominant features: word count and link density).
MIN_WORDS = 10
MAX_LINK_DENSITY = 0.333333
NEIGHBOR_MIN_WORDS = 4  # short block kept when sandwiched between content


class _Block:
    __slots__ = ("parts", "n_link_chars", "n_anchor_depth", "boiler_ctx")

    def __init__(self, boiler_ctx: bool):
        self.parts: list[str] = []
        self.n_link_chars = 0
        self.boiler_ctx = boiler_ctx


class _ContentParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool]] = []  # (text, link_chars, boiler)
        self._cur: _Block | None = None
        self._skip_depth = 0
        self._boiler_depth = 0
        self._anchor_depth = 0

    def _flush(self):
        if self._cur is None:
            return
        text = _WS.sub(" ", "".join(self._cur.parts)).strip()
        if text:
            self.blocks.append((text, self._cur.n_link_chars,
                                self._cur.boiler_ctx))
        self._cur = None

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BOILER_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS or tag in ("br", "tr", "table", "ul", "ol"):
            self._flush()

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag in _SKIP_TAGS:
            self._skip_depth -= 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if tag in _BOILER_TAGS and self._boiler_depth > 0:
            self._boiler_depth -= 1
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1
        if tag in _BLOCK_TAGS or tag in ("tr", "table", "ul", "ol", "body",
                                         "html"):
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        if not data.strip():
            return
        if self._cur is None:
            self._cur = _Block(self._boiler_depth > 0)
        self._cur.parts.append(data)
        if self._anchor_depth:
            self._cur.n_link_chars += len(data)

    def finalize(self):
        self._flush()
        return self.blocks


def extract_content_blocks(html_text: str) -> list[str]:
    """→ ordered list of main-content text blocks (boilerplate removed)."""
    parser = _ContentParser()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        return []
    raw = parser.finalize()

    feats = []
    for text, link_chars, boiler in raw:
        n_words = len(_WORD.findall(text))
        link_density = link_chars / len(text) if text else 1.0
        is_content = (not boiler
                      and n_words >= MIN_WORDS
                      and link_density <= MAX_LINK_DENSITY)
        feats.append([text, n_words, link_density, boiler, is_content])

    # neighbor smoothing: short low-link blocks between two content blocks
    for i, f in enumerate(feats):
        if f[4] or f[3] or f[2] > MAX_LINK_DENSITY:
            continue
        if f[1] >= NEIGHBOR_MIN_WORDS:
            prev_ok = any(g[4] for g in feats[max(0, i - 1):i])
            next_ok = any(g[4] for g in feats[i + 1:i + 2])
            if prev_ok and next_ok:
                f[4] = True

    return [f[0] for f in feats if f[4]]
