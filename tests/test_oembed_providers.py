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
    bundled = op.DEFAULT_REGISTRY
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


def test_extended_registry_long_tail():
    """The bundled registry now carries the public dump's long tail:
    providers beyond the original 42 resolve discovery hrefs."""
    from unfurl_spark.functions.oembed_providers import discovery_href

    cases = {
        "https://music.apple.com/us/album/x/123":
            "https://embed.music.apple.com/api/v1/oembed",
        "https://www.behance.net/gallery/999/title":
            "https://www.behance.net/services/oembed",
        "https://rumble.com/v12345-some-video.html":
            "https://rumble.com/api/Media/oembed.json",
        "https://odysee.com/@chan/video-name":
            "https://odysee.com/$/oembed",
        "https://song.link/i/12345":
            "https://song.link/oembed",
        "https://coub.com/view/abc123":
            "https://coub.com/api/oembed.json",
        "https://infogram.com/my-chart-1a2b3c":
            "https://infogram.com/oembed",
    }
    for url, endpoint in cases.items():
        href = discovery_href(url)
        assert href is not None, url
        assert href.startswith(endpoint), (url, href)
        assert "url=" in href

    # endpoint bases without url= are normalized to a discovery prefix
    assert "?format=json&url=" in discovery_href(
        "https://www.behance.net/gallery/999/title")

    # corpus providers keep first-match priority (byte-exact prefixes)
    assert discovery_href(
        "https://www.youtube.com/watch?v=dQw4w9WgXcQ").startswith(
        "https://www.youtube.com/oembed?format=json&url=")


def test_host_gate_equivalent_to_full_scan():
    """The netloc pre-gate must be a pure accelerator: for URLs derived
    from every registry glob (matching, mutated-host, path-mangled,
    schemeless, userinfo/port variants) the gated first-match result is
    byte-identical to scanning all compiled matchers in order."""
    from unfurl_spark.functions import oembed_providers as P

    def full_scan(url):
        for m in P._MATCHERS:
            if m.pattern.match(url):
                return m.prefix + P.quote(url, safe=P._ENC_SAFE)
        return None

    urls = []
    for prov in P.DEFAULT_REGISTRY:
        for ep in prov.get("endpoints", []):
            for glob in ep.get("schemes", []):
                concrete = glob.replace("*", "abc123")
                urls += [
                    concrete,
                    concrete + "/tail?x=1#f",
                    glob.replace("*", ""),
                    concrete.replace("://", "://evil.com@", 1),
                    concrete.replace("://", "://", 1).replace(
                        "/", ":8443/", 1) if "/" in concrete else concrete,
                    "HTTPS://" + concrete.split("://", 1)[-1],
                    concrete.split("://", 1)[-1],        # schemeless
                    "https://unrelated.example/" + concrete,
                ]
                # query/fragment/userinfo-smuggled hosts: a wildcard in
                # the authority must never be satisfied by a suffix that
                # only appears after ?, # or @ (host-spoofing vector)
                if "://*" in glob:
                    suffix = glob.split("://*", 1)[1]
                    for sep in ("?x=", "#", ""):
                        urls.append("https://evil.com" + sep + suffix)
                    urls.append("https://evil.com?y=" + suffix
                                + "@evil.net/z")
    urls += ["", "not a url", "https://", "https://[::1]/x",
             "ftp://instagram.com/p/x", "https://com/p/x",
             "https://instagram.com.evil.net/p/abc"]
    assert len(urls) > 1000
    for url in urls:
        assert P.discovery_href(url) == full_scan(url), url
