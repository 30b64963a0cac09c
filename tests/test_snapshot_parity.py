"""Product-level oracle: span/snippet parity against the reference's own
golden snapshot suites (BASELINE.md correctness corpus).

Every runnable fixture (118 URLs minus uncached/pruned) must match the
reference output exactly for all three plugin configurations.
"""

import pytest

import snapdiff
from snapdiff import SNAP_PATHS, diff, norm, run_url
from snap_parse import parse_snap_file, url_of

from unfurl_spark.sources.fixtures import (
    build_filename,
    fixture_urls,
    load_context_store,
    load_fixture,
    make_request,
)


@pytest.fixture(scope="module")
def env():
    return load_context_store(), make_request()


@pytest.mark.parametrize("suite", ["html", "exif", "exiftool"])
def test_snapshot_parity(suite, env):
    context_store, request = env
    snaps = {url_of(n): v for n, v in
             parse_snap_file(SNAP_PATHS[suite]).items()}
    total, passed, skipped = 0, 0, 0
    failures = []
    for url in fixture_urls():
        expected = snaps.get(url)
        if expected is None:
            skipped += 1
            continue
        if load_fixture(url) is None or build_filename(url) in snapdiff._PRUNED:
            skipped += 1
            continue
        total += 1
        actual = run_url(url, suite, context_store, request)
        d = list(diff(norm(expected), norm(actual)))
        if d:
            failures.append((url, d[:3]))
        else:
            passed += 1
    assert not failures, (
        f"{suite}: {passed}/{total} passed, failures: {failures[:5]}")
    assert total >= 115  # the corpus minus uncached/pruned fixtures
