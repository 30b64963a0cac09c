"""Main-content classification (boilerplate strip) — the ``body_text`` spans.

New capability required by the engine contract (absent from the reference,
SURVEY.md §7 step 7): shallow-text-feature block classification in the
spirit of Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features" (WSDM 2010) — number of words and link density per block, with a
neighbor-block smoothing rule.

Block *segmentation* happens inside the metadata tokenizer's single parse
pass (functions/htmlmeta.py, ``collect_content=True``) so each document is
parsed exactly once; this module holds the densitometric classifier.
"""

from __future__ import annotations

import re

from .htmlmeta import parse_html_full

_WORD = re.compile(r"\S+")

# Classification thresholds (WSDM'10 densitometric classifier, simplified
# to the two dominant features: word count and link density).
MIN_WORDS = 10
MAX_LINK_DENSITY = 0.333333
NEIGHBOR_MIN_WORDS = 4  # short block kept when sandwiched between content


def classify_blocks(raw: list[tuple[str, int, bool]]) -> list[str]:
    """(text, link_chars, in_boiler_container) triples → content blocks."""
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


def extract_content_blocks(html_text: str) -> list[str]:
    """→ ordered list of main-content text blocks (boilerplate removed)."""
    _result, blocks = parse_html_full(html_text, "", collect_content=True)
    return classify_blocks(blocks)
