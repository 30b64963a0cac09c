"""Registry-backed oembed endpoint discovery (functions/oembed_providers).

The five corpus providers must produce byte-exact discovery hrefs (the
snapshot parity suite depends on them as fixture-cache keys); non-corpus
registry entries must match their public scheme globs; a full
providers.json dump must drop in via load_registry."""

from unfurl_spark.functions import oembed_providers as op


def test_corpus_providers_byte_exact():
    cases = {
        "https://www.instagram.com/p/BG0m4IDGaqk/":
            "https://api.instagram.com/oembed?type=json&url="
            "https%3A%2F%2Fwww.instagram.com%2Fp%2FBG0m4IDGaqk%2F",
        "https://soundcloud.com/lifeofdesiigner/desiigner-panda":
            "https://soundcloud.com/oembed?type=json&url="
            "https%3A%2F%2Fsoundcloud.com%2Flifeofdesiigner%2F"
            "desiigner-panda",
        "https://www.flickr.com/photos/forestwander-nature-pictures"
        "/3715853334/":
            "https://www.flickr.com/services/oembed?url="
            "https%3A%2F%2Fwww.flickr.com%2Fphotos%2F"
            "forestwander-nature-pictures%2F3715853334%2F",
        "https://www.kickstarter.com/projects/1115015686/help-me-feed"
        "-the-people":
            "https://www.kickstarter.com/services/oembed?url="
            "https%3A%2F%2Fwww.kickstarter.com%2Fprojects%2F1115015686"
            "%2Fhelp-me-feed-the-people",
        "https://www.ted.com/talks/a_talk":
            "https://www.ted.com/services/v1/oembed.json?url="
            "https%3A%2F%2Fwww.ted.com%2Ftalks%2Fa_talk",
    }
    for url, expected in cases.items():
        assert op.discovery_href(url) == expected, url


def test_non_corpus_provider_matches():
    href = op.discovery_href("https://www.youtube.com/watch?v=dQw4w9WgXcQ")
    assert href is not None
    assert href.startswith("https://www.youtube.com/oembed?format=json&url=")
    assert "dQw4w9WgXcQ" in href
    assert op.discovery_href("https://vimeo.com/76979871") is not None
    assert op.discovery_href(
        "https://twitter.com/someone/status/1234567890") is not None


def test_unmatched_url_returns_none():
    assert op.discovery_href("https://example.com/article") is None
    assert op.discovery_href("https://instagram.com/about/") is None


def test_load_registry_roundtrip():
    bundled = op.PROVIDERS
    try:
        n = op.load_registry([
            {"provider_name": "Example", "endpoints": [{
                "schemes": ["https://media.example.net/*"],
                # registry dumps often carry the bare endpoint — the
                # loader appends the format/url query itself
                "url": "https://media.example.net/oembed"}]},
        ])
        assert n == 1
        href = op.discovery_href("https://media.example.net/v/42")
        assert href == ("https://media.example.net/oembed?format=json&url="
                        "https%3A%2F%2Fmedia.example.net%2Fv%2F42")
        assert op.discovery_href("https://www.ted.com/talks/x") is None
    finally:
        op.load_registry(bundled)
    assert op.discovery_href("https://www.ted.com/talks/x") is not None


def test_scheme_star_stays_inside_authority():
    """A host-segment `*` must not span `/` — a foreign host whose PATH
    contains `.youtube.com/` is not claimed by the youtube scheme, and a
    scheme match covers the WHOLE url (both ends anchored)."""
    assert op.discovery_href(
        "http://evil.example.com/a.youtube.com/watch?v=x") is None
