"""XHTML+RDFa rendering sink: sections (+ metadata) → one XHTML string
per document.

Reference semantics (shape, not byte-parity): ``render_xhtml``
(documentrepository.py:1456-1681) + ``SectionalElement.as_xhtml``
(elements/elements.py:625-658): the document is a ``<body about=URI>``;
each section renders as ``<div about=FRAGMENT property="dcterms:title"
content=TITLE typeof="bibo:DocumentPart">`` with ``bibo:chapter`` /
``dcterms:isPartOf`` spans — i.e. the RDFa carries exactly the triples
the engine also emits, so re-distilling the rendered XHTML recovers
the metadata graph (the reference's distill step).

Ray shape: ``groupby(url).map_groups`` (one document per group,
sections ordered by position) — a presentation sink, off the hot path.
"""

from __future__ import annotations

import html as _html

import pandas as pd

_HEAD = ('<?xml version="1.0" encoding="utf-8"?>\n'
         '<html xmlns="http://www.w3.org/1999/xhtml"\n'
         '      xmlns:dcterms="http://purl.org/dc/terms/"\n'
         '      xmlns:bibo="http://purl.org/ontology/bibo/"\n'
         '      xmlns:prov="http://www.w3.org/ns/prov#">\n')


def _esc(s) -> str:
    return _html.escape(s or "", quote=True)


def render_document(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("position", kind="mergesort")
    body_rows = g[g["kind"] == "body"]
    if body_rows.empty:
        return pd.DataFrame({"url": [], "xhtml": []})
    body = body_rows.iloc[0]
    url = body["url"]
    out = [_HEAD]
    out.append('<head><title>%s</title></head>\n' % _esc(body["title"]))
    lang = body.get("lang") or ""
    out.append('<body about="%s"%s>\n'
               % (_esc(url), (' xml:lang="%s"' % _esc(lang)) if lang else ""))
    ann = g[g["kind"] == "_annotation"]
    for _, row in g[~g["kind"].isin(("body", "_annotation"))].iterrows():
        uri = row["section_uri"]
        out.append('  <div about="%s" property="dcterms:title" content="%s"'
                   ' typeof="bibo:DocumentPart" class="%s">\n'
                   % (_esc(uri), _esc(row["title"]), _esc(row["kind"])))
        if row["ordinal"]:
            out.append('    <span about="%s" property="bibo:chapter"'
                       ' content="%s"/>\n' % (_esc(uri), _esc(row["ordinal"])))
        if row["parent_uri"]:
            out.append('    <span rel="dcterms:isPartOf" href="%s"/>\n'
                       % _esc(row["parent_uri"]))
        if row["text"]:
            out.append("    <p>%s</p>\n" % _html.escape(row["text"], quote=False))
        out.append("  </div>\n")
    if len(ann):
        # inbound-reference annotations (prep_annotation_file output,
        # documentrepository.py:2633-2688) — rendered as an RDFa aside
        # so distilling recovers the dcterms:isReferencedBy edges
        out.append('  <aside class="annotations">\n')
        for _, row in ann.sort_values("section_uri").iterrows():
            out.append('    <span about="%s" rel="dcterms:isReferencedBy"'
                       ' href="%s" title="%s"/>\n'
                       % (_esc(url), _esc(row["section_uri"]),
                          _esc(row["title"])))
        out.append("  </aside>\n")
    out.append("</body>\n</html>\n")
    return pd.DataFrame({"url": [url], "xhtml": ["".join(out)]})


def _with_annotation_rows(sections_ds, annotations_ds):
    """Union annotation rows (facets.annotations output: target_url,
    citing_url, citing_title) into the sections Dataset as
    ``kind == "_annotation"`` rows with position 2^30 — the
    generate-with-annotations input shape shared by render_xhtml and
    render_with_template."""
    import pyarrow as pa

    def _atype(t):
        # ray Schema types are arrow DataTypes for arrow blocks but
        # numpy dtypes for pandas blocks; object → string
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    schema = sections_ds.schema()
    col_types = {n: _atype(t) for n, t in zip(schema.names, schema.types)}

    def as_section_rows(t: "pa.Table") -> "pa.Table":
        n = t.num_rows
        cols = {}
        for name, typ in col_types.items():
            if name == "url":
                cols[name] = t["target_url"].cast(typ)
            elif name == "section_uri":
                cols[name] = t["citing_url"].cast(typ)
            elif name == "title":
                cols[name] = t["citing_title"].cast(typ)
            elif name == "kind":
                cols[name] = pa.array(["_annotation"] * n, typ)
            elif name == "position":
                cols[name] = pa.array([2 ** 30] * n, typ)
            else:
                cols[name] = pa.nulls(n, typ)
        return pa.table(cols)

    # normalize both sides to arrow blocks before the union —
    # mixed block types break downstream block builders
    return sections_ds.map_batches(
        lambda t: t, batch_format="pyarrow").union(
        annotations_ds.map_batches(as_section_rows, batch_format="pyarrow"))


def render_xhtml(sections_ds, annotations_ds=None):
    """sections → (url, xhtml) Dataset. With ``annotations_ds``
    (facets.annotations output: target_url, citing_url, citing_title),
    each document additionally renders its inbound citations — the
    reference's generate-with-annotations step (transformer.py shape)."""
    if annotations_ds is not None:
        sections_ds = _with_annotation_rows(sections_ds, annotations_ds)

    return _render_grouped(sections_ds, render_document)


def _render_grouped(sections_ds, render_fn, out_col: str = "xhtml"):
    """Shared scaffolding: hash-bucket by url, one Ray group per
    bucket, one ``render_fn(doc_group) -> DataFrame`` call per url
    inside — never one Ray group per document at corpus
    cardinality. ``out_col`` names the rendered column so an empty
    bucket emits the SAME (url, out_col) schema as non-empty ones
    (a mismatched empty block breaks downstream block builders)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df["url"], index=False).values
        df["_bucket"] = (h % 64).astype("int32")
        return df

    def render_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = [render_fn(grp) for _, grp in g.groupby("url", sort=False)]
        if not out:
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 out_col: pd.Series([], dtype=object)})
        return pd.concat(out, ignore_index=True)

    return (sections_ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(render_bucket,
                                           batch_format="pandas"))


_HREF_RE = None  # compiled lazily (regex shared per process)


def transform_uris(markup: str, doc_url: str, mode: str | None = None,
                   url_map: dict | None = None) -> str:
    """URL-rewriting pass over rendered markup — the reference's
    Transformer uritransform modes (transformer.py:25-330:
    ``uritransform`` relativize/absolutize + config-driven url
    remapping). Rewrites every href/src attribute:

    - ``url_map``: longest-prefix remap first (transformlinks
      semantics — devel/static-site relocation);
    - ``mode="relative"``: links sharing the document's scheme+host
      become paths relative to the document's own directory
      (``transformer.py`` relativize for static sites);
    - ``mode="absolute"`` / None: left absolute.
    """
    import posixpath
    import re
    from urllib.parse import urlsplit

    global _HREF_RE
    if _HREF_RE is None:
        _HREF_RE = re.compile(r'\b(href|src)="([^"]*)"')
    prefixes = sorted(url_map or {}, key=len, reverse=True)
    doc = urlsplit(doc_url)
    doc_dir = posixpath.dirname(doc.path) or "/"

    def rewrite(m):
        attr, u = m.group(1), m.group(2)
        for p in prefixes:
            if u.startswith(p):
                u = url_map[p] + u[len(p):]
                break
        if mode == "relative":
            s = urlsplit(u)
            if s.scheme == doc.scheme and s.netloc == doc.netloc:
                rel = posixpath.relpath(s.path or "/", doc_dir)
                if s.fragment:
                    rel += "#" + s.fragment
                u = rel
        return '%s="%s"' % (attr, u)

    return _HREF_RE.sub(rewrite, markup)


def render_with_template(sections_ds, template, params: dict | None = None,
                         annotations_ds=None, uritransform: str | None = None,
                         url_map: dict | None = None,
                         out_col: str = "xhtml"):
    """User-supplied presentation templates — the reference's
    ``Transformer`` surface (transformer.py:25-330: parametrized
    XSLT templates + uritransform modes), Ray-native: ``template`` is
    a callable ``(doc_group: pd.DataFrame, params: dict) -> str``
    rendering ONE document's section rows (sorted by position, the
    ``render_document`` contract) to its output markup. ``params``
    broadcast ONCE via ``ray.put`` (the XSLT <xsl:param> analogue) and
    reach every render call; ``uritransform``/``url_map`` apply the
    url-rewriting pass (``transform_uris``) to the rendered markup.

    The annotations input composes exactly as in ``render_xhtml``
    (generate-with-annotations): annotation rows arrive in the group
    with ``kind == "_annotation"``.
    """
    import ray

    if annotations_ds is not None:
        # reuse render_xhtml's union normalization by delegating the
        # annotation plumbing to it at the Dataset level
        sections_ds = _with_annotation_rows(sections_ds, annotations_ds)
    params_ref = ray.put(dict(params or {}))
    mode, umap = uritransform, dict(url_map or {})

    def render_one(group: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(params_ref)
        group = group.sort_values("position") \
            if "position" in group.columns else group
        url = group["url"].iloc[0]
        markup = template(group, p)
        if mode or umap:
            markup = transform_uris(markup, url, mode=mode,
                                    url_map=umap)
        return pd.DataFrame({"url": [url], out_col: [markup]})

    return _render_grouped(sections_ds, render_one, out_col=out_col)


def distill_rdfa(xhtml: str) -> list[tuple]:
    """Re-extract (subj, pred, obj, is_literal) from rendered RDFa —
    the distill step (decorators.py:203-227) used by the round-trip
    test. Minimal RDFa subset: about/property/content, rel/href,
    typeof."""
    import re

    triples = []
    div_re = re.compile(
        r'<(?:div|span)\s+about="([^"]*)"(?:\s+property="([^"]*)"\s+'
        r'content="([^"]*)")?(?:\s+typeof="([^"]*)")?', re.S)
    rel_re = re.compile(r'<span rel="([^"]*)" href="([^"]*)"/>')
    for m in div_re.finditer(xhtml):
        about, prop, content, typeof = m.groups()
        if prop and content is not None:
            triples.append((about, prop, _html.unescape(content), True))
        if typeof:
            triples.append((about, "rdf:type", typeof, False))
    # rel spans are nested inside their owning div
    block_re = re.compile(r'<div about="([^"]*)".*?</div>', re.S)
    for bm in block_re.finditer(xhtml):
        about = bm.group(1)
        for rm in rel_re.finditer(bm.group(0)):
            triples.append((about, rm.group(1), rm.group(2), False))
    return triples


def validate_rendered(xhtml_ds, max_resources: int = 1000):
    """Per-document sanity check of rendered XHTML, the reference's
    ``render_xhtml_validate`` (documentrepository.py:1684-1698, with
    ``max_resources = 1000`` from documentrepository.py:320): a
    resource (div @about) encountered twice, or more distinct
    resources than ``max_resources``, flags the document. Only divs
    count — spans re-use their owning div's @about to attach extra
    metadata, exactly as in the reference.

    Returns a (url, error) Dataset holding ONLY the failing documents
    (empty = all good); runs map-side, nothing shuffles."""
    import re

    div_about_re = re.compile(r'<div\s+about="([^"]*)"')

    def check(df: pd.DataFrame) -> pd.DataFrame:
        urls, errors = [], []
        for url, xhtml in zip(df["url"], df["xhtml"]):
            seen = set()
            err = None
            for m in div_about_re.finditer(xhtml):
                about = m.group(1)
                if about in seen:
                    err = "Resource %s encountered twice" % about
                    break
                seen.add(about)
            if err is None and max_resources and len(seen) > max_resources:
                err = ("Found over %s resources (%s), that's probably "
                       "not right" % (max_resources, len(seen)))
            if err is not None:
                urls.append(url)
                errors.append(err)
        return pd.DataFrame({"url": pd.Series(urls, dtype="object"),
                             "error": pd.Series(errors, dtype="object")})

    return xhtml_ds.map_batches(check, batch_format="pandas")
