"""render_with_template — the Transformer surface
(transformer.py:25-330): user-supplied parametrized templates over
section rows, URL-rewriting modes, annotation composition; and
transform_uris unit semantics."""

import pandas as pd
import pytest

from ferenda_ray.sources.xhtml import (
    render_with_template,
    transform_uris,
)


def _sections():
    return pd.DataFrame({
        "url": ["http://x.test/docs/a", "http://x.test/docs/a",
                "http://x.test/docs/b"],
        "section_uri": ["http://x.test/docs/a#S1",
                        "http://x.test/docs/a#S2",
                        "http://x.test/docs/b#S1"],
        "kind": ["section", "section", "section"],
        "title": ["Alpha", "Beta", "Gamma"],
        "text": ["first text", "second text", "third text"],
        "position": [1, 2, 1]})


def _make_template():
    # nested so cloudpickle serializes it by value (the test module is
    # not importable from Ray workers)
    def template(group, params):
        head = "<h1 class=%r>" % params.get("css", "plain")
        rows = "".join(
            '<li><a href="%s">%s</a></li>' % (r["section_uri"],
                                              r["title"])
            for _, r in group.iterrows() if r["kind"] == "section")
        return (head + group["url"].iloc[0] + "</h1><ul>" + rows
                + "</ul>")
    return template


def test_template_renders_per_document(ray_session):
    import ray.data as rd

    out = (render_with_template(rd.from_pandas(_sections()),
                                _make_template(),
                                params={"css": "fancy"})
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert list(out["url"]) == ["http://x.test/docs/a",
                                "http://x.test/docs/b"]
    a = out["xhtml"][0]
    assert a.startswith("<h1 class='fancy'>")
    assert "Alpha" in a and "Beta" in a and "Gamma" not in a
    # position ordering honored
    assert a.index("Alpha") < a.index("Beta")


def test_template_uritransform_relative(ray_session):
    import ray.data as rd

    out = (render_with_template(
        rd.from_pandas(_sections()), _make_template(),
        uritransform="relative",
        url_map={"http://x.test/": "http://cdn.test/"})
        .to_pandas().sort_values("url").reset_index(drop=True))
    a = out["xhtml"][0]
    # prefix map applied first: x.test → cdn.test, which no longer
    # matches the doc host, so links stay absolute on the new host
    assert 'href="http://cdn.test/docs/a#S1"' in a

    out2 = (render_with_template(
        rd.from_pandas(_sections()), _make_template(),
        uritransform="relative")
        .to_pandas().sort_values("url").reset_index(drop=True))
    a2 = out2["xhtml"][0]
    # same-host links relativized against the doc's directory
    assert 'href="a#S1"' in a2 and 'href="a#S2"' in a2


def test_transform_uris_unit():
    m = ('<a href="http://x.test/docs/sub/c#S9">c</a>'
         '<img src="http://other.test/i.png">')
    out = transform_uris(m, "http://x.test/docs/a", mode="relative")
    assert 'href="sub/c#S9"' in out
    assert 'src="http://other.test/i.png"' in out  # cross-host kept
    out2 = transform_uris(m, "http://x.test/docs/a",
                          url_map={"http://other.test/":
                                   "http://mirror.test/"})
    assert 'src="http://mirror.test/i.png"' in out2


def test_annotations_compose(ray_session):
    import ray.data as rd

    ann = pd.DataFrame({
        "target_url": ["http://x.test/docs/a"],
        "citing_url": ["http://x.test/docs/z"],
        "citing_title": ["Zeta cites Alpha"]})

    def tmpl(group, params):
        cites = group[group["kind"] == "_annotation"]
        return "cited-by:%d" % len(cites)

    out = (render_with_template(rd.from_pandas(_sections()), tmpl,
                                annotations_ds=rd.from_pandas(ann))
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert list(out["xhtml"]) == ["cited-by:1", "cited-by:0"]
