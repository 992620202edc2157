"""Loadable citation-grammar files — the reference's res/ebnf layout
(sources/legal/se/legalref.py:94-186 loads grammar *files* at runtime
and composes them into the parser) for the Ray-native registry:
grammar families are a JSON document of (pattern, URI-space,
binding-spec) records, parsed once per actor init into the same
``CitationGrammar`` tuple ``default_grammars()`` builds in code.

File format (see resources/grammars/default.json for the shipped
RFC + EU-law families)::

    {
      "spaces": {
        "<space>": {"builtin": "rfc"|"eulaw", "base": "..."}
                 | {"base": "...", "slug_transform": "<name>",
                    "templates": [{"name": ..., "bindings": [...],
                                   "pattern": "{base}...",
                                   "transforms": {"b": "<name>"}}]}
      },
      "grammars": [                       # priority order
        {"name": "...", "pattern": "<regex>",
         "space": "<space>", "template": "<template>",
         "bindings": {"<var>": [part, ...]}}
      | {"name": "...", "pattern": "<regex>",
         "literal": true, "strip": ",.)"}
      ]
    }

A binding is the concatenation of parts; each part is
``{"group": N}`` (regex group), ``{"ctx": "key"}`` (scan context,
e.g. the citing doc_url), with optional ``"prefix"`` and
``"optional": true`` (an optional part whose group did not match is
skipped, prefix included — the article "6(1)" → "6.1" shape).
Transforms come from a fixed safe registry — grammar files are DATA
and can never inject code.
"""

from __future__ import annotations

import json

from .uris import URISpace, URITemplate, _strip_dot, _strip_zeros

TRANSFORMS = {
    "strip_zeros": _strip_zeros,
    "strip_dot": _strip_dot,
    "lower": str.lower,
    "upper": str.upper,
}


class GrammarFileError(ValueError):
    """Malformed grammar file (the reference's grammar-load failures
    raise at import, not mid-parse)."""


def _build_space(name: str, spec: dict) -> URISpace:
    from .uris import eulaw_space, rfc_space

    if "builtin" in spec:
        builtin = {"rfc": rfc_space, "eulaw": eulaw_space}.get(
            spec["builtin"])
        if builtin is None:
            raise GrammarFileError(
                "space %r: unknown builtin %r" % (name, spec["builtin"]))
        return builtin(spec["base"])
    templates = []
    for t in spec.get("templates", []):
        transforms = {}
        for b, tr in t.get("transforms", {}).items():
            if tr not in TRANSFORMS:
                raise GrammarFileError(
                    "space %r: unknown transform %r" % (name, tr))
            transforms[b] = TRANSFORMS[tr]
        templates.append(URITemplate(t["name"], tuple(t["bindings"]),
                                     t["pattern"], transforms))
    slug = spec.get("slug_transform")
    if slug is not None and slug not in TRANSFORMS:
        raise GrammarFileError(
            "space %r: unknown slug_transform %r" % (name, slug))
    return URISpace(spec["base"], templates,
                    TRANSFORMS[slug] if slug else None)


def _make_formatter(space: URISpace, template: str, bindings: dict):
    def fmt(m, ctx):
        vals = {}
        for var, parts in bindings.items():
            s = ""
            for p in parts:
                if "group" in p:
                    v = m.group(p["group"])
                else:
                    v = ctx.get(p["ctx"])
                if v is None:
                    if p.get("optional"):
                        continue
                    v = ""
                s += p.get("prefix", "") + str(v)
            vals[var] = s
        return space.mint(vals, template=template)

    return fmt


def _make_literal(strip: str):
    def fmt(m, ctx):
        return m.group(0).rstrip(strip) if strip else m.group(0)

    return fmt


def load_grammars(path_or_dict, base_overrides: dict | None = None):
    """Load a grammar file (path, file-like, or already-parsed dict)
    into a tuple of ``CitationGrammar`` in declared priority order.
    ``base_overrides`` remaps a space's base URI at load time (the
    per-deployment URI-root knob the reference passes through
    config)."""
    from .stages.mentions import CitationGrammar

    if isinstance(path_or_dict, dict):
        spec = path_or_dict
    elif hasattr(path_or_dict, "read"):
        spec = json.load(path_or_dict)
    else:
        with open(path_or_dict, encoding="utf-8") as f:
            spec = json.load(f)

    spaces = {}
    for name, sspec in spec.get("spaces", {}).items():
        sspec = dict(sspec)
        if base_overrides and name in base_overrides:
            sspec["base"] = base_overrides[name]
        spaces[name] = _build_space(name, sspec)

    grammars = []
    for g in spec.get("grammars", []):
        if "pattern" not in g or "name" not in g:
            raise GrammarFileError("grammar needs name+pattern: %r" % g)
        if g.get("literal"):
            formatter = _make_literal(g.get("strip", ""))
        else:
            if g.get("space") not in spaces:
                raise GrammarFileError(
                    "grammar %r: unknown space %r"
                    % (g["name"], g.get("space")))
            formatter = _make_formatter(
                spaces[g["space"]], g.get("template"),
                g.get("bindings", {}))
        grammars.append(CitationGrammar(g["name"], g["pattern"],
                                        formatter))
    if not grammars:
        raise GrammarFileError("no grammars declared")
    return tuple(grammars)
