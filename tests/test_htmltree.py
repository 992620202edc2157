"""HTML → element tree → plaintext, reference-exact semantics
(elements_from_soup html.py:23-71 + as_plaintext elements.py:249-261)."""

from ferenda_ray.htmltree import as_plaintext, doc_lang, doc_title, extract_text, parse_html


def test_basic_extraction():
    html = b"<html><body><p>Hello  world</p><p>Second   para</p></body></html>"
    assert extract_text(html) == "Hello world Second para"


def test_noise_tags_dropped_with_subtree():
    html = (
        b"<html><body><p>keep</p>"
        b"<script>var x = 'dropme';</script>"
        b"<style>p { color: red }</style>"
        b"<font>legacy <b>deepnoise</b></font>"
        b"<center>also dropped</center>"
        b"<blink>unknown tag <i>inner</i></blink>"
        b"<p>tail</p></body></html>"
    )
    assert extract_text(html) == "keep tail"


def test_comments_and_whitespace_dropped():
    html = b"<html><body>\n  <!-- comment -->\n<p>a</p>\n   \n<p>b</p>\n</body></html>"
    assert extract_text(html) == "a b"


def test_inline_elements_space_joined():
    # children of <p>: "see ", <b>bold</b>, " end." →
    # normalize each, join non-empty with single space
    html = b"<html><body><p>see <b>bold</b> end.</p></body></html>"
    assert extract_text(html) == "see bold end."
    html2 = b"<html><body><p>a<b>b</b>c</p></body></html>"
    # no spaces in source → parts "a","b","c" joined with single spaces
    assert extract_text(html2) == "a b c"


def test_pre_preserves_whitespace():
    html = b"<html><body><pre>raw   text\n  indented\n</pre><p>after</p></body></html>"
    assert extract_text(html) == "raw   text\n  indented\n after"


def test_nbsp_normalized():
    html = "<html><body><p>a\xa0b</p></body></html>".encode()
    assert extract_text(html) == "a b"


def test_entities_decoded():
    html = b"<html><body><p>a &amp; b &lt;tag&gt;</p></body></html>"
    assert extract_text(html) == "a & b <tag>"


def test_lang_and_title():
    root = parse_html(b'<html lang="de"><head><title>My  Title</title></head><body></body></html>')
    assert doc_lang(root) == "de"
    assert doc_title(root) == "My Title"
    root2 = parse_html(b"<html><body></body></html>")
    assert doc_lang(root2, default="en") == "en"
    assert doc_title(root2) is None


def test_unbalanced_tags_tolerated():
    html = b"<html><body><p>one<p>two</p><div>three</body></html>"
    # html.parser: <p>one<p>... nests (no implicit close) — we only
    # require all text to survive in order
    txt = extract_text(html)
    assert "one" in txt and "two" in txt and "three" in txt


def test_void_elements():
    html = b"<html><body><p>a<br>b</p><hr><p>c <img src='x.png' alt='pic'> d</p></body></html>"
    assert extract_text(html) == "a b c d"


def test_kept_attributes():
    root = parse_html(b'<html><body><a href="http://x" onclick="evil()" class="c1 c2">t</a></body></html>')
    a = root.find("a")
    assert a.attrs == {"href": "http://x", "class": "c1 c2"}


def test_as_plaintext_nested():
    root = parse_html(
        b"<html><body><div><p>first</p><ul><li>item one</li><li>item two</li></ul></div></body></html>"
    )
    assert as_plaintext(root.find("body")) == "first item one item two"
