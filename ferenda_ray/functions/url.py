"""URL canonicalization for crawl-frontier dedup (the webtext
counterpart of the reference's basefile normalization —
``ferenda/documentstore.py`` basefile<->path mapping keeps one
canonical identity per document; here the identity is the URL itself,
normalized the way crawl dedup does it).

The rule set is deliberately a FIXED ORDERED CHAIN of string
transforms, each expressible both as Python and as DuckDB SQL over
the same patterns, so the oracle replicates byte-exactly (the
pii.PII_PATTERNS discipline):

1. drop the ``#fragment``;
2. lowercase the scheme and authority (never the path/query);
3. strip an explicit default port (``:80`` for http, ``:443`` for
   https);
4. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``),
   preserving the relative order of the survivors; drop the ``?``
   when nothing survives;
5. strip trailing slashes.

All steps are char-level ASCII-safe operations (the corpus' URLs are
ASCII); no percent-decoding or path resolution is attempted — those
are NOT canonicalization-safe without fetching semantics.
"""

from __future__ import annotations

import re

__all__ = ["canonical_url", "TRACKING_PREFIXES"]

TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=")

_AUTHORITY = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*")


def canonical_url(url: str) -> str:
    u = url or ""
    # 1. fragment
    h = u.find("#")
    if h >= 0:
        u = u[:h]
    # 2. lowercase scheme + authority
    m = _AUTHORITY.match(u)
    if m:
        u = m.group(0).lower() + u[m.end():]
    # 3. default ports (capture-the-next-char form, not lookahead —
    # RE2-compatible so the SQL oracle runs the IDENTICAL pattern)
    u = re.sub(r"^(http://[^/:?#]*):80($|[/?])", r"\1\2", u)
    u = re.sub(r"^(https://[^/:?#]*):443($|[/?])", r"\1\2", u)
    # 4. tracking params
    q = u.find("?")
    if q >= 0:
        head, qs = u[:q], u[q + 1:]
        kept = [p for p in qs.split("&")
                if not p.startswith(TRACKING_PREFIXES)]
        u = head + ("?" + "&".join(kept) if kept else "")
    # 5. trailing slashes
    u = u.rstrip("/")
    return u
