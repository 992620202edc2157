"""Declarative URI minting — COIN URISpace semantics.

Re-implements the configuration surface of the reference's COIN
implementation (``ferenda/thirdparty/coin.py:57-206``: a URISpace is
a base URI plus an ordered set of templates, each declaring required
bindings, a URI pattern and per-variable slug transforms; minting
picks the FIRST template whose bindings are all present). Round 1
shipped deterministic but hardcoded minting (mentions.py); this makes
the template space data, not code — a user adds a citation family's
URI scheme by declaring a template, exactly as COIN users write an
N3 space description.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class MintError(ValueError):
    """No template's bindings matched the supplied values
    (coin.py raises for uncovered binding sets)."""


@dataclass(frozen=True)
class URITemplate:
    """One COIN template: ``bindings`` must all be present in the
    value dict; ``pattern`` is a str.format template over the bindings
    plus ``{base}``; ``transforms`` maps a binding to a callable
    applied before substitution (the coin SlugTransform analogue)."""
    name: str
    bindings: tuple
    pattern: str
    transforms: dict = field(default_factory=dict)

    def applicable(self, values: dict) -> bool:
        return all(b in values and values[b] is not None
                   for b in self.bindings)

    def mint(self, base: str, values: dict) -> str:
        vals = {}
        for b in self.bindings:
            v = values[b]
            if b in self.transforms:
                v = self.transforms[b](v)
            vals[b] = v
        return self.pattern.format(base=base, **vals)


class URISpace:
    """Ordered template space with a shared base URI and an optional
    space-wide slug transform applied to every binding (coin.py's
    URISpace.transform chain)."""

    def __init__(self, base: str, templates, slug_transform=None):
        self.base = base
        self.templates = list(templates)
        self.slug_transform = slug_transform

    def mint(self, values: dict, template: str | None = None) -> str:
        vals = dict(values)
        if self.slug_transform:
            vals = {k: (self.slug_transform(v) if isinstance(v, str) else v)
                    for k, v in vals.items()}
        for t in self.templates:
            if template is not None and t.name != template:
                continue
            if t.applicable(vals):
                return t.mint(self.base, vals)
        raise MintError("no template in space %r covers bindings %s"
                        % (self.base, sorted(values)))


# --- the engine's default spaces (exact round-1 URI outputs) -----------

def _strip_zeros(n: str) -> str:
    return n.lstrip("0")


def _strip_dot(s: str) -> str:
    return s.rstrip(".")


def rfc_space(base: str) -> URISpace:
    """RFC citation URIs (rfc.py:431-441 rfc_uriformatter semantics):
    'RFC 0822' → <base>822; 'section 2.2 of RFC 2616' →
    <base>2616#S2.2; a section-only citation resolves against the
    citing document."""
    return URISpace(base, [
        URITemplate("rfc_sec", ("num", "sec"), "{base}{num}#S{sec}",
                    {"num": _strip_zeros, "sec": _strip_dot}),
        URITemplate("rfc", ("num",), "{base}{num}", {"num": _strip_zeros}),
        URITemplate("sec_only", ("doc_url", "sec"), "{doc_url}#S{sec}",
                    {"sec": _strip_dot}),
    ])


def eulaw_space(base: str) -> URISpace:
    """EU legislation URIs (uriformats.py:14-45 shape): directives
    keyed year/num/assoc, regulations assoc/num/year, articles as
    fragments on the directive URI."""
    return URISpace(base, [
        URITemplate("eu_article", ("year", "num", "assoc", "art"),
                    "{base}dir/{year}/{num}/{assoc}#A{art}"),
        URITemplate("directive", ("year", "num", "assoc"),
                    "{base}dir/{year}/{num}/{assoc}"),
        URITemplate("regulation", ("assoc", "num", "year"),
                    "{base}reg/{assoc}/{num}/{year}"),
    ])
