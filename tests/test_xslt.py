"""XSLT-subset interpreter (ferenda_ray/xslt.py) — the reference's
Transformer presentation step (transformer.py:25-330). The fixture
stylesheet mirrors the SHAPE of the reference's res/xsl/generic.xsl +
base.xsl: an included base sheet providing named templates, match
templates over xhtml divs keyed on @about, attribute value templates,
substring-after ids, for-each over an annotations parameter,
call-template with-param, choose/when, count(ancestor::*) depth
tests. The Ray stage test drives render_xhtml output through
transform_dataset end to end."""

import textwrap

import pandas as pd
import pytest

import sys

sys.path.insert(0, "/root/repo")

from ferenda_ray.xslt import (  # noqa: E402
    UnsupportedXSLT,
    XSLTTransformer,
)

BASE_XSL = textwrap.dedent("""\
    <?xml version="1.0"?>
    <xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        xmlns:xhtml="http://www.w3.org/1999/xhtml">
      <xsl:template match="/">
        <html>
          <head><title><xsl:call-template name="headtitle"/></title></head>
          <body class="{$bodyclass}">
            <xsl:apply-templates select="//xhtml:body/*"/>
          </body>
        </html>
      </xsl:template>
      <xsl:template name="panel">
        <xsl:param name="title"/>
        <xsl:param name="body"/>
        <aside class="panel">
          <h3><xsl:value-of select="$title"/></h3>
          <xsl:copy-of select="$body"/>
        </aside>
      </xsl:template>
    </xsl:stylesheet>
    """)

GENERIC_XSL = textwrap.dedent("""\
    <?xml version="1.0"?>
    <xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        xmlns:xhtml="http://www.w3.org/1999/xhtml">
      <xsl:include href="base.xsl"/>
      <xsl:param name="sitename" select="'Site'"/>
      <xsl:param name="bodyclass">generic</xsl:param>
      <xsl:template name="headtitle">
        <xsl:value-of select="//xhtml:title"/> | <xsl:value-of
          select="$sitename"/>
      </xsl:template>
      <xsl:template match="xhtml:div[@about]">
        <section id="{substring-after(@about, '#')}">
          <xsl:if test="@content">
            <h2><xsl:value-of select="@content"/></h2>
          </xsl:if>
          <xsl:choose>
            <xsl:when test="count(ancestor::*) &gt; 2">
              <xsl:attribute name="class">nested</xsl:attribute>
            </xsl:when>
            <xsl:otherwise>
              <xsl:attribute name="class">toplevel</xsl:attribute>
            </xsl:otherwise>
          </xsl:choose>
          <xsl:apply-templates/>
        </section>
        <xsl:call-template name="panel">
          <xsl:with-param name="title">Refs</xsl:with-param>
          <xsl:with-param name="body">
            <xsl:for-each select="xhtml:span[@rel]">
              <a href="{@href}"><xsl:value-of select="@rel"/></a>
            </xsl:for-each>
          </xsl:with-param>
        </xsl:call-template>
      </xsl:template>
      <xsl:template match="xhtml:p">
        <p><xsl:value-of select="normalize-space(.)"/></p>
      </xsl:template>
      <xsl:template match="xhtml:span[@rel]"/>
    </xsl:stylesheet>
    """)

DOC = textwrap.dedent("""\
    <html xmlns="http://www.w3.org/1999/xhtml">
      <head><title>Doc 7</title></head>
      <body>
        <div about="http://x/doc7#s1" content="Section One">
          <p>  first   text </p>
          <span rel="cites" href="http://x/doc9"/>
          <div about="http://x/doc7#s1.1" content="Sub">
            <p>inner</p>
          </div>
        </div>
      </body>
    </html>
    """)


@pytest.fixture(scope="module")
def transformer():
    return XSLTTransformer(GENERIC_XSL,
                           resolver={"base.xsl": BASE_XSL},
                           params={"sitename": "Ferenda"})


def test_generic_shape_end_to_end(transformer):
    out = transformer.transform(DOC)
    assert "<title>Doc 7 | Ferenda</title>" in out
    assert 'body class="generic"' in out
    assert '<section id="s1" class="toplevel">' in out
    assert "<h2>Section One</h2>" in out
    # nested div: depth > 2 → class="nested"
    assert '<section id="s1.1" class="nested">' in out
    # normalize-space on the paragraph
    assert "<p>first text</p>" in out
    # the span-matching empty template suppressed inline output, but
    # the panel's for-each picked it up
    assert '<a href="http://x/doc9">cites</a>' in out
    assert "<h3>Refs</h3>" in out


def test_params_override_per_transform(transformer):
    out = transformer.transform(DOC, params={"sitename": "Other"})
    assert "Doc 7 | Other" in out


def test_builtin_rules_and_priority():
    # no matching template → built-ins recurse and emit text
    t = XSLTTransformer(textwrap.dedent("""\
        <xsl:stylesheet version="1.0"
            xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="b">[<xsl:value-of select="."/>]</xsl:template>
          <xsl:template match="b[@x]" priority="1">{<xsl:value-of
            select="@x"/>}</xsl:template>
        </xsl:stylesheet>"""))
    out = t.transform("<a>pre<b>one</b>mid<b x='2'>two</b>post</a>")
    assert out == "pre[one]mid{2}post"


def test_unsupported_construct_raises():
    with pytest.raises(UnsupportedXSLT):
        XSLTTransformer(textwrap.dedent("""\
            <xsl:stylesheet version="1.0"
                xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
              <xsl:namespace-alias stylesheet-prefix="a"
                                   result-prefix="b"/>
            </xsl:stylesheet>"""))
    t = XSLTTransformer(textwrap.dedent("""\
        <xsl:stylesheet version="1.0"
            xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="/"><xsl:value-of
            select="translate(., 'a', 'b')"/></xsl:template>
        </xsl:stylesheet>"""))
    with pytest.raises(UnsupportedXSLT):
        t.transform("<a>x</a>")


def test_xpath_corners():
    t = XSLTTransformer(textwrap.dedent("""\
        <xsl:stylesheet version="1.0"
            xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="/">
            <r>
              <xsl:variable name="items" select="//i"/>
              <xsl:value-of select="count($items)"/>:<xsl:value-of
                select="concat(//i[1]/@k, '-', //i[last()]/@k)"/>:<xsl:value-of
                select="string(//i[@k='b'])"/>:<xsl:for-each
                select="//i[position() &gt; 1]"><xsl:value-of
                select="position()"/>,</xsl:for-each>
            </r>
          </xsl:template>
        </xsl:stylesheet>"""))
    out = t.transform(
        "<d><i k='a'>1</i><x><i k='b'>2</i></x><i k='c'>3</i></d>")
    assert out == "<r>3:a-c:2:1,2,</r>"


def test_transform_dataset_over_rendered_xhtml(ray_session):
    import ray.data as rd

    from ferenda_ray.sources.xhtml import render_xhtml
    from ferenda_ray.xslt import transform_dataset

    sections = rd.from_pandas(pd.DataFrame({
        "url": ["http://x/a", "http://x/a", "http://x/b"],
        "section_uri": ["http://x/a", "http://x/a#s1", "http://x/b"],
        "kind": ["body", "section", "body"],
        "title": ["Doc A", "Part", "Doc B"],
        "text": ["alpha", "beta", "gamma"],
        "lang": ["en", "en", "sv"],
        "position": [0, 1, 0],
        "ordinal": ["", "1", ""],
        "parent_uri": ["", "http://x/a", ""],
        "basefile": ["a", "a", "b"]}))
    xhtml = render_xhtml(sections)
    sheet = textwrap.dedent("""\
        <xsl:stylesheet version="1.0"
            xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
            xmlns:xhtml="http://www.w3.org/1999/xhtml">
          <xsl:param name="sitename" select="'S'"/>
          <xsl:template match="/">
            <article data-site="{$sitename}">
              <xsl:for-each select="//xhtml:body|//xhtml:div[@about]">
                <h2><xsl:value-of select="@about"/></h2>
              </xsl:for-each>
            </article>
          </xsl:template>
        </xsl:stylesheet>""")
    out = (transform_dataset(xhtml, sheet, params={"sitename": "F"},
                             col="xhtml", out_col="html")
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert len(out) == 2
    assert out.loc[0, "html"].startswith('<article data-site="F">')
    assert "http://x/a#s1" in out.loc[0, "html"]
    assert "<h2>http://x/b</h2>" in out.loc[1, "html"]


REF_XSL = "/root/reference/ferenda/res/xsl"


@pytest.mark.skipif(not __import__("os").path.isdir(REF_XSL),
                    reason="reference checkout not present")
def test_reference_generic_xsl_end_to_end():
    """The reference's ACTUAL generic.xsl (which includes base.xsl and
    imports annotations-panel.xsl) loads and transforms an XHTML doc
    into the full branded page — the last re-expression residual
    (transformer.py XSLT depth) exercised against real assets."""
    t = XSLTTransformer(REF_XSL + "/generic.xsl")
    doc = ("<html xmlns='http://www.w3.org/1999/xhtml'"
           " xmlns:dcterms='http://purl.org/dc/terms/'>"
           "<head><title>T7</title></head>"
           "<body about='http://x/doc7'>"
           "<div about='http://x/doc7#s1' content='Part One'>"
           "<span content='1'/><p>hello world</p>"
           "</div></body></html>")
    out = t.transform(doc)
    assert "<title>T7 | " in out          # headtitle template
    assert 'class="generic"' in out       # bodyclass named template
    assert 'id="s1"' in out               # substring-after(@about,'#')
    assert "hello world" in out
    assert "navbar" in out                # base.xsl chrome


@pytest.mark.skipif(not __import__("os").path.isdir(REF_XSL),
                    reason="reference checkout not present")
def test_all_reference_stylesheets_load():
    """Every stylesheet the reference ships (res/xsl/*.xsl, 17 files
    incl. the OOXML simplifier's nested-predicate patterns and
    atom.xsl's namespace wildcards) parses into templates."""
    import os

    loaded = 0
    for fn in sorted(os.listdir(REF_XSL)):
        if fn.endswith(".xsl"):
            t = XSLTTransformer(os.path.join(REF_XSL, fn))
            assert t.templates or t.named, fn
            loaded += 1
    assert loaded == 17


def test_xpath_comparison_semantics():
    """Review-fix regressions: existential != over node-sets, booleans
    compared as booleans (not NaN numerics), {{ }} AVT escapes,
    //text() in document order."""
    t = XSLTTransformer(textwrap.dedent("""\
        <xsl:stylesheet version="1.0"
            xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="/">
            <r a="{{lit}}">
              <xsl:if test="//d/@class != 'main'">NEQ</xsl:if>
              <xsl:text>:</xsl:text>
              <xsl:variable name="f" select="contains('xyz', 'y')"/>
              <xsl:if test="$f = 'true'">BOOL</xsl:if>
              <xsl:text>:</xsl:text>
              <xsl:for-each select="//text()">
                <xsl:value-of select="."/>
              </xsl:for-each>
            </r>
          </xsl:template>
        </xsl:stylesheet>"""))
    out = t.transform(
        "<x><d class='main'/><d class='side'/><p>a<b>c</b>d</p></x>")
    # some node's @class != 'main' → existential true
    assert ">NEQ:" in out
    # boolean = 'true' must hit the boolean branch
    assert ":BOOL:" in out
    # document order a, c, d (not a, d, c)
    assert out.endswith("acd</r>")
    assert 'a="{lit}"' in out


def test_document_function_parents_survive_cache(tmp_path):
    """document() results are cached per engine, but transform()
    resets the parent index — the cached doc's parents must
    re-register on every transform (review fix: row 2+ of an
    actor-pool batch saw empty ancestor axes)."""
    ann = tmp_path / "ann.xml"
    ann.write_text("<graph><resource uri='u1'><t>T</t></resource></graph>")
    t = XSLTTransformer(textwrap.dedent("""\
        <xsl:stylesheet version="1.0"
            xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:param name="annfile"/>
          <xsl:template match="/">
            <o><xsl:value-of
              select="document($annfile)/graph/resource/t/../@uri"/></o>
          </xsl:template>
        </xsl:stylesheet>"""))
    for _ in range(3):  # row 2+ exercises the cached path
        out = t.transform("<x/>", params={"annfile": str(ann)})
        assert out == "<o>u1</o>"
