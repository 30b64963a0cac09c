"""Snapshot-parity harness: run the engine over the reference's fixture
corpus and diff against its Jest golden files.

Usage:  python tools/snapdiff.py [html|exif|exiftool] [--verbose] [url-substr]
"""

from __future__ import annotations

import math
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from snap_parse import UNDEFINED, SnapDate, parse_snap_file, url_of  # noqa: E402

from unfurl_spark.functions.charset import decode_html  # noqa: E402
from unfurl_spark.functions.coerce import extract_mime  # noqa: E402
from unfurl_spark.functions.engine import parse_oembed, scrape_document  # noqa: E402
from unfurl_spark.sources.fixtures import (  # noqa: E402
    fixture_urls,
    load_context_store,
    load_fixture,
    make_request,
)

SNAP_PATHS = {
    "html": "/root/reference/packages/unfurl-html/src/__snapshots__/index.spec.ts.snap",
    "exif": "/root/reference/packages/unfurl-exif/src/__snapshots__/index.spec.ts.snap",
    "exiftool": "/root/reference/packages/unfurl-exiftool/src/__snapshots__/index.spec.ts.snap",
}
PLUGINS = {"html": ("html",), "exif": ("exif",), "exiftool": ("exiftool",)}


def norm(v):
    """Canonical form for comparison: drop undefined/None object entries,
    int-normalize numbers, tag NaN and dates."""
    if v is UNDEFINED or v is None:
        return None
    if isinstance(v, SnapDate):
        return {"__date__": str(v)}
    if isinstance(v, datetime):
        ms = v.microsecond // 1000
        return {"__date__": v.strftime("%Y-%m-%dT%H:%M:%S") + f".{ms:03d}Z"}
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "__NaN__"
        if math.isinf(v):
            return "__Inf__" if v > 0 else "__-Inf__"
        if v == int(v) and abs(v) < 2**53:
            return int(v)
        return v
    if isinstance(v, dict):
        out = {}
        for k, val in v.items():
            n = norm(val)
            if n is None and (val is UNDEFINED or val is None):
                # JS undefined and missing keys are indistinguishable for
                # parity; null never occurs in reference outputs
                continue
            out[k] = n
        return out
    if isinstance(v, list):
        return [norm(x) for x in v]
    return v


def diff(a, b, path=""):
    """Yield (path, expected, actual) leaf differences."""
    if isinstance(a, dict) and isinstance(b, dict):
        for k in sorted(set(a) | set(b)):
            yield from diff(a.get(k), b.get(k), f"{path}.{k}")
        return
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            yield (path + ".length", len(a), len(b))
        for i in range(min(len(a), len(b))):
            yield from diff(a[i], b[i], f"{path}[{i}]")
        return
    if a != b:
        yield (path, a, b)


_PRUNED = set()
try:
    _PRUNED = {
        line.split("/")[-2]
        for line in open("/root/reference/.MISSING_LARGE_BLOBS")
        if line.strip()
    }
except OSError:
    pass


def run_url(url: str, suite: str, context_store, request) -> dict | None:
    page = load_fixture(url)
    if page is None:
        return None
    from unfurl_spark.sources.fixtures import build_filename
    if build_filename(url) in _PRUNED:
        return None  # body blob pruned from the checkout — cannot reproduce
    body = page["body"]
    ctype = (page["headers"].get("content-type") or "")
    if isinstance(ctype, list):
        ctype = ctype[0] if ctype else ""
    mime = extract_mime(ctype)

    def oembed_lookup(href):
        sub = request(href, "application/json")
        if sub is None:
            return None
        ct = sub["headers"].get("content-type") or ""
        if isinstance(ct, list):
            ct = ct[0] if ct else ""
        return (sub["status"], ct, sub["body"])

    return scrape_document(
        url=page["url"],
        status=page["status"],
        headers=page["headers"],
        body_text=decode_html(body, ctype) if mime == "text/html" else None,
        body_bytes=body,
        context_store=context_store,
        oembed_lookup=oembed_lookup,
        plugins=PLUGINS[suite],
    )


def main():
    args = [a for a in sys.argv[1:]]
    suite = "html"
    verbose = False
    url_filter = None
    for a in args:
        if a in SNAP_PATHS:
            suite = a
        elif a == "--verbose":
            verbose = True
        else:
            url_filter = a

    snaps = parse_snap_file(SNAP_PATHS[suite])
    by_url = {url_of(name): val for name, val in snaps.items()}
    context_store = load_context_store()
    request = make_request()

    urls = fixture_urls()
    passed, failed, missing = 0, [], 0
    for url in urls:
        if url_filter and url_filter not in url:
            continue
        expected = by_url.get(url)
        if expected is None:
            missing += 1
            continue
        try:
            actual = run_url(url, suite, context_store, request)
        except Exception as e:  # noqa: BLE001
            failed.append((url, [("<exception>", "", repr(e))]))
            continue
        if actual is None:
            missing += 1
            continue
        d = list(diff(norm(expected), norm(actual)))
        if not d:
            passed += 1
        else:
            failed.append((url, d))

    total = passed + len(failed)
    print(f"suite={suite}  pass {passed}/{total}  (missing fixtures: {missing})")
    for url, d in failed[: None if verbose else 20]:
        print(f"\nFAIL {url}  ({len(d)} diffs)")
        for p, e, a in d[: None if verbose else 6]:
            print(f"  {p}\n    expected: {e!r}\n    actual:   {a!r}")


if __name__ == "__main__":
    main()
