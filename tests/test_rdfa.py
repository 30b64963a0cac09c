"""RDFa Lite chains: vocab scoping, typeof subjects, about/resource ids,
property→literal/IRI/text-content, and nesting — the declared-tree half of
the Result contract (SURVEY §1.3) beyond the flat og:* harvest."""

from unfurl_spark.functions.htmlmeta import parse_html

URL = "https://ex.com/page"
OG = "http://ogp.me/ns#"
SCHEMA = "http://schema.org/"


def _rdfa(html: str):
    return (parse_html(html, URL) or {}).get("rdfa")


def test_flat_og_meta_unchanged():
    html = ('<html><head><meta property="og:title" content="T">'
            "</head><body></body></html>")
    nodes = _rdfa(html)
    assert nodes and nodes[0]["@id"] == URL
    assert nodes[0][OG + "title"] == ["T"]


def test_typeof_with_property_chains_to_parent():
    html = ('<html><body vocab="http://schema.org/" typeof="Article">'
            '<div property="author" typeof="Person">'
            '<span property="name">Alice</span></div>'
            "</body></html>")
    nodes = _rdfa(html)
    # hanging typeof Article becomes a top-level item
    art = next(n for n in nodes if n.get("@type") == [SCHEMA + "Article"])
    person = art[SCHEMA + "author"][0]
    assert person["@type"] == [SCHEMA + "Person"]
    assert person[SCHEMA + "name"] == ["Alice"]


def test_about_and_resource_set_subject_id():
    html = ('<html><body vocab="http://schema.org/">'
            '<div about="https://ex.com/#me" typeof="Person">'
            '<a property="url" href="/home">home</a></div>'
            "</body></html>")
    nodes = _rdfa(html)
    person = next(n for n in nodes if n.get("@id") == "https://ex.com/#me")
    assert person[SCHEMA + "url"] == [{"@id": "https://ex.com/home"}]


def test_text_content_literal():
    html = ('<html><body vocab="http://schema.org/" typeof="Book">'
            "<h1 property='name'>  The\n  Title  </h1></body></html>")
    nodes = _rdfa(html)
    book = next(n for n in nodes if n.get("@type") == [SCHEMA + "Book"])
    assert book[SCHEMA + "name"] == ["The Title"]


def test_vocab_scope_restores_on_close():
    html = ('<html><body>'
            '<div vocab="http://schema.org/" typeof="Thing"></div>'
            '<p property="name">ignored — no vocab out here</p>'
            "</body></html>")
    nodes = _rdfa(html)
    # after the div closes, bare 'name' has no vocab → dropped, so the
    # root carries no schema name and only the Thing item exists
    assert all(SCHEMA + "name" not in n for n in nodes)


def test_property_content_beats_text():
    html = ('<html><body vocab="http://schema.org/" typeof="Event">'
            '<span property="name" content="Exact">Displayed</span>'
            "</body></html>")
    nodes = _rdfa(html)
    ev = next(n for n in nodes if n.get("@type") == [SCHEMA + "Event"])
    assert ev[SCHEMA + "name"] == ["Exact"]


def test_rdfa_and_itemprop_share_text_capture():
    """An element carrying BOTH an RDFa text property and a microdata
    itemprop must feed the same captured text to both slots (the
    microdata path used to replace frame.text_parts, orphaning the
    RDFa slot into an empty literal)."""
    html = ('<div itemscope itemtype="https://schema.org/Person">'
            '<span property="schema:name" itemprop="name">Alice</span>'
            '</div>')
    r = parse_html(html, "http://x.test/")
    assert r["rdfa"][0].get("http://schema.org/name") == ["Alice"]
    assert r["microdata"][0]["https://schema.org/name"] == ["Alice"]


def test_vocab_on_void_element_does_not_leak():
    """@vocab on a void element scopes to that element only — a later
    bare-term property must NOT resolve against it."""
    html = ('<input vocab="http://ex.org/">'
            '<span property="title">x</span>')
    r = parse_html(html, "http://x.test/")
    nodes = r.get("rdfa") or []
    assert not any("http://ex.org/title" in n for n in nodes)
