"""Unit tests: main-content strip (body_text spans)."""

from unfurl_spark.functions.content import extract_content_blocks

ARTICLE = """
<html><head><title>t</title><style>p{}</style></head><body>
<nav><ul><li><a href="/a">home page link</a></li><li><a href="/b">other
section link</a></li></ul></nav>
<article>
<p>This is the first real paragraph of the article with more than ten
words of actual content for the reader.</p>
<p>a short interlude between paragraphs</p>
<p>The second paragraph also carries plenty of meaningful words so the
densitometric classifier keeps it in the output.</p>
</article>
<footer><a href="/tos">terms</a> <a href="/priv">privacy</a></footer>
<script>var x = "this script text must never appear in output";</script>
</body></html>
"""


def test_content_blocks():
    blocks = extract_content_blocks(ARTICLE)
    assert len(blocks) == 3  # neighbor rule keeps the short interlude
    assert blocks[0].startswith("This is the first real paragraph")
    assert blocks[1] == "a short interlude between paragraphs"
    assert blocks[2].startswith("The second paragraph")
    assert all("script text" not in b for b in blocks)
    assert all("home page link" not in b for b in blocks)


def test_link_dense_block_dropped():
    html = ("<body><p>" + " ".join(
        f'<a href="/{i}">link {i} word</a>' for i in range(10))
        + "</p><p>plain text paragraph with eleven useful words inside "
          "it for testing purposes</p></body>")
    blocks = extract_content_blocks(html)
    assert len(blocks) == 1
    assert blocks[0].startswith("plain text")


def test_malformed_html_safe():
    assert extract_content_blocks("<p unclosed") == []
    assert extract_content_blocks("") == []


def test_whitespace_padded_anchor_keeps_content_block():
    """link_chars must be counted on collapsed text (same units as the
    denominator): a single whitespace-heavy anchor inside a real
    paragraph must not push link_density past the threshold."""
    html = ("<body><p>This long paragraph has plenty of meaningful words "
            'around one link <a href="/d">\n\n\n\n   docs   \n\n\n\n</a> '
            "and keeps going with even more real content after it."
            "</p></body>")
    blocks = extract_content_blocks(html)
    assert len(blocks) == 1
    assert "docs" in blocks[0]
