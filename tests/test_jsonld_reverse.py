"""JSON-LD @reverse expansion (keyword and reverse term definitions) —
closes the r3 verdict's expansion-remainder gap. Semantics follow
JSON-LD 1.0 §6.3/§8.1 on the subset the engine consumes."""
from unfurl_spark.functions.jsonld_lite import expand, normalize_jsonld

BASE = "https://page.test/a"


def test_reverse_keyword_expands_properties():
    doc = {
        "@context": {"ex": "http://ex.org/"},
        "@id": "http://ex.org/parent",
        "@reverse": {"ex:childOf": [{"@id": "http://ex.org/kid1"},
                                    {"@id": "http://ex.org/kid2"}]},
    }
    out = expand([doc], BASE)
    assert out is not None and len(out) == 1
    rev = out[0]["@reverse"]
    kids = rev["http://ex.org/childOf"]
    assert [k["@id"] for k in kids] == ["http://ex.org/kid1",
                                       "http://ex.org/kid2"]


def test_reverse_term_definition():
    doc = {
        "@context": {
            "ex": "http://ex.org/",
            "children": {"@reverse": "ex:parentOf"},
        },
        "@id": "http://ex.org/mom",
        "children": {"@id": "http://ex.org/kid"},
    }
    out = expand([doc], BASE)
    assert out is not None and len(out) == 1
    rev = out[0]["@reverse"]
    assert rev["http://ex.org/parentOf"][0]["@id"] == "http://ex.org/kid"
    assert "children" not in out[0]


def test_reverse_value_objects_drop_whole_graph():
    # value/list objects under @reverse are "invalid reverse property
    # value" in jsonld.js; the reference catches the throw and discards
    # the ENTIRE graph (unfurl-html/src/index.ts:185-189) → expand None
    doc = {
        "@context": {"ex": "http://ex.org/"},
        "@id": "http://ex.org/n",
        "@reverse": {"ex:p": "just a string"},
    }
    assert expand([doc], BASE) is None
    # same for a reverse term definition carrying a value object
    doc2 = {
        "@context": {"ex": "http://ex.org/",
                     "kids": {"@reverse": "ex:parentOf"}},
        "@id": "http://ex.org/n",
        "kids": "not a node",
    }
    assert expand([doc2], BASE) is None


def test_reverse_survives_alongside_forward_props():
    doc = {
        "@context": {"ex": "http://ex.org/",
                     "name": "http://schema.org/name"},
        "@id": BASE,
        "name": "Page",
        "@reverse": {"ex:mentions": {"@id": "http://ex.org/other"}},
    }
    out = normalize_jsonld([doc], BASE)
    assert out is not None and len(out) == 1
    node = out[0]
    assert node["http://schema.org/name"][0]["@value"] == "Page"
    assert node["@reverse"]["http://ex.org/mentions"][0]["@id"] \
        == "http://ex.org/other"


def test_nested_named_graph_expands():
    # nested @graph expands recursively; normalize flattens exactly ONE
    # level (matching the reference, unfurl-html/src/index.ts:193-198)
    doc = {
        "@context": {"ex": "http://ex.org/"},
        "@graph": [{
            "@id": BASE,
            "@graph": [{"@id": "http://ex.org/inner",
                        "ex:p": {"@value": 1}}],
        }],
    }
    out = normalize_jsonld([doc], BASE)
    assert out is not None and len(out) == 1
    inner = out[0]["@graph"][0]
    assert inner["@id"] == "http://ex.org/inner"
