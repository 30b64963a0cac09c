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
