"""Mention detection + entity linking (the stateful actor-pool stage).

Reproduces, over section-text rows instead of element trees:

- ``CitationParser.parse_string`` (citationparser.py:65-96): grammars
  applied in **priority order**, each grammar scanning only the text
  segments left unclaimed by earlier grammars (non-overlapping
  re-scan);
- the RFC citation grammar + URI formatter (sources/tech/rfc.py:430-452):
  ``"section 2.2 of [RFC 2616]"`` → ``<rfc_base>2616#S2.2``,
  ``"RFC 822"`` → ``<rfc_base>822`` (leading zeros stripped,
  trailing '.' stripped from section ordinals);
- the generic URL grammar (citationpatterns.py:16-36): http/https/ftp
  URLs, trailing punctuation ``,.)``  excluded;
- ``lookup_resource`` entity linking (documentrepository.py:500-547):
  exact gazetteer match first, then ``difflib.get_close_matches``
  with cutoff 0.8 over candidate spans (capitalized multi-word
  phrases), result cached per actor.

Ray shape: ``ds.map_batches(MentionLinker, concurrency=N,
batch_format="pyarrow")`` — an **actor pool**: the combined surface
regex and the fuzzy-match cache are built once per actor in
``__init__`` (mirrors the reference's per-process instance caches,
manager.py:1287-1291); the gazetteer arrives as a ``ray.put``
broadcast ref, read once per actor, never re-shipped per batch.
"""

from __future__ import annotations

import difflib
import re

import pyarrow as pa

RFC_BASE = "https://rfc.example.org/rfc/"

# priority order mirrors rfc.py:446-448 (+ url last)
RE_SEC_RFC = re.compile(r"(?i:section)\s+(\d[\d.]*)\s+of\s+\[?RFC\s+(\d+)\]?")
RE_SEC = re.compile(r"(?i:section)\s+(\d[\d.]*)")
RE_RFC = re.compile(r"\[?RFC\s+(\d+)\]?")
RE_URL = re.compile(r"(?:http|https|ftp)://[^\s<>\"']+")
# EU-legislation grammar family (citationpatterns.py:42-70 semantics,
# anglicized): "Directive 2007/42/EC", "Regulation (EC) No 45/2001",
# optionally "Article 6(1) of <act>"
RE_EU_DIRECTIVE = re.compile(
    r"(?i:directive)\s+(\d{4})/(\d+)/(EC|EEC|EU)\b")
RE_EU_REGULATION = re.compile(
    r"(?i:regulation)\s+\((EC|EEC|EU)\)\s+No\s+(\d+)/(\d{2,4})\b")
# compound article-of-act grammar (highest EU priority, like the
# reference's ArticleLegalact before Legalact, citationpatterns.py:66-69)
RE_EU_ART_DIR = re.compile(
    r"(?i:article)\s+(\d+)(?:\((\d+)\))?\s+of\s+"
    r"(?i:directive)\s+(\d{4})/(\d+)/(EC|EEC|EU)\b")

EULAW_BASE = "https://eurlex.example.org/"

# candidate spans for fuzzy entity linking: 2+ capitalized words
RE_CAND = re.compile(r"\b[A-Z][a-zA-Z0-9]*(?: [A-Z][a-zA-Z0-9]*)+\b")

MENTION_COLS = ("url", "section_uri", "surface", "start", "end", "kind",
                "linked_uri", "predicate")


def eu_uri(kind: str, *parts) -> str:
    """Back-compat wrapper over the declarative EU URISpace
    (uris.eulaw_space)."""
    from ..uris import eulaw_space

    space = eulaw_space(EULAW_BASE)
    year, num, assoc = parts
    if kind == "directive":
        return space.mint({"year": year, "num": num, "assoc": assoc},
                          template="directive")
    return space.mint({"year": year, "num": num, "assoc": assoc},
                      template="regulation")


def rfc_uri(rfc_base: str, num: str | None, sec: str | None, doc_url: str) -> str:
    """rfc_uriformatter semantics (rfc.py:431-441) via the declarative
    RFC URISpace. A section-only citation has no canonical document
    part in the reference (uri starts at "#S..."); we resolve it
    against the citing document."""
    from ..uris import rfc_space

    space = rfc_space(rfc_base)
    if num and sec:
        return space.mint({"num": num, "sec": sec}, template="rfc_sec")
    if num:
        return space.mint({"num": num}, template="rfc")
    return space.mint({"doc_url": doc_url, "sec": sec}, template="sec_only")


class CitationGrammar:
    """One registered citation family: a name (becomes the mention
    ``kind``), a compiled pattern, and a formatter(match, ctx) → URI
    (typically a URISpace.mint call). The registry replaces round 1's
    hardwired scan list — the LegalRef shape (legalref.py:62-186):
    grammar families are data registered in priority order, not code
    edits."""

    __slots__ = ("name", "pattern", "formatter")

    def __init__(self, name: str, pattern, formatter):
        self.name = name
        self.pattern = re.compile(pattern) if isinstance(pattern, str) else pattern
        self.formatter = formatter


def default_grammars(rfc_base: str = RFC_BASE,
                     eulaw_base: str = EULAW_BASE) -> tuple:
    """The built-in grammar families in reference priority order
    (rfc.py:446-448: section_rfc, section, rfc; then the EU-law family
    — compound article-of-act before plain acts, citationpatterns.py:
    66-69; bare URLs last)."""
    from ..uris import eulaw_space, rfc_space

    rfc = rfc_space(rfc_base)
    eu = eulaw_space(eulaw_base)
    return (
        CitationGrammar(
            "sec_rfc", RE_SEC_RFC,
            lambda m, ctx: rfc.mint({"num": m.group(2), "sec": m.group(1)},
                                    template="rfc_sec")),
        CitationGrammar(
            "sec", RE_SEC,
            lambda m, ctx: rfc.mint({"doc_url": ctx["doc_url"],
                                     "sec": m.group(1)}, template="sec_only")),
        CitationGrammar(
            "rfc", RE_RFC,
            lambda m, ctx: rfc.mint({"num": m.group(1)}, template="rfc")),
        CitationGrammar(
            "eu_article", RE_EU_ART_DIR,
            lambda m, ctx: eu.mint(
                {"year": m.group(3), "num": m.group(4), "assoc": m.group(5),
                 "art": m.group(1) + ("." + m.group(2) if m.group(2) else "")},
                template="eu_article")),
        CitationGrammar(
            "eu_directive", RE_EU_DIRECTIVE,
            lambda m, ctx: eu.mint(
                {"year": m.group(1), "num": m.group(2), "assoc": m.group(3)},
                template="directive")),
        CitationGrammar(
            "eu_regulation", RE_EU_REGULATION,
            lambda m, ctx: eu.mint(
                {"year": m.group(3), "num": m.group(2), "assoc": m.group(1)},
                template="regulation")),
        CitationGrammar("url", RE_URL,
                        lambda m, ctx: m.group(0).rstrip(",.)")),
    )


def scan_citations(text: str, doc_url: str, rfc_base: str = RFC_BASE,
                   grammars=None):
    """Priority-ordered, non-overlapping citation scan over the
    registered grammar families (CitationParser.parse_string,
    citationparser.py:65-96: each grammar scans only the text segments
    left unclaimed by earlier grammars).

    Returns (matches, segments): matches = list of
    (start, end, surface, kind, linked_uri); segments = the unclaimed
    (start, end) text ranges left for the entity pass.
    """
    if grammars is None:
        grammars = default_grammars(rfc_base)
    ctx = {"doc_url": doc_url}
    segments = [(0, len(text))]
    matches = []

    for g in grammars:
        new_segments = []
        for s, e in segments:
            pos = s
            for m in g.pattern.finditer(text, s, e):
                ms, me = m.start(), m.end()
                matches.append((ms, me, text[ms:me], g.name,
                                g.formatter(m, ctx)))
                if ms > pos:
                    new_segments.append((pos, ms))
                pos = me
            if pos < e:
                new_segments.append((pos, e))
        segments = new_segments
    matches.sort()
    return matches, segments


class MentionLinker:
    """Actor-pool stage: sections batch → mentions batch.

    ``gazetteer``: dict surface → entity URI, or a ``ray.ObjectRef``
    to one (broadcast once with ``ray.put``; each actor reads it a
    single time in ``__init__``).
    """

    def __init__(self, gazetteer, rfc_base: str = RFC_BASE,
                 fuzzy_cutoff: float = 0.8, scan_kinds=None,
                 grammars=None, embed_entities=None,
                 embed_threshold: float = 0.55, embed_dim: int = 64):
        import ray

        if isinstance(gazetteer, ray.ObjectRef):
            gazetteer = ray.get(gazetteer)
        if isinstance(embed_entities, ray.ObjectRef):
            embed_entities = ray.get(embed_entities)
        # grammar registry built ONCE per actor (patterns compile here,
        # never per batch); custom families slot in via the kwarg — a
        # STRING is a grammar-file path loaded at actor init (the
        # legalref.py:94-186 res/ebnf file-loading analogue,
        # grammarfile.load_grammars)
        if isinstance(grammars, str):
            from ..grammarfile import load_grammars

            self.grammars = load_grammars(grammars)
        else:
            self.grammars = (tuple(grammars) if grammars is not None
                             else default_grammars(rfc_base))
        self.gazetteer: dict[str, str] = dict(gazetteer or {})
        # longest-first alternation so multi-word surfaces win
        if self.gazetteer:
            alts = sorted(self.gazetteer, key=len, reverse=True)
            self._exact = re.compile(
                r"\b(?:%s)\b" % "|".join(re.escape(s) for s in alts))
        else:
            self._exact = None
        self._labels = list(self.gazetteer)
        self.rfc_base = rfc_base
        self.cutoff = fuzzy_cutoff
        self._fuzzy_cache: dict[str, str | None] = {}
        # optional embedding-linker fallback (north star: actor pools
        # holding gazetteer tries AND embedding linkers): candidates
        # the fuzzy pass misses are batch-embedded (one matmul per
        # batch) against an entity matrix built once per actor. Off by
        # default — the flagship outputs stay byte-identical.
        self._embed_mat = None
        if embed_entities:
            from .embed_link import trigram_embed

            self._embed_labels = list(embed_entities)
            self._embed_uris = [embed_entities[l]
                                for l in self._embed_labels]
            self._embed_mat = trigram_embed(self._embed_labels, embed_dim)
            self._embed_dim = embed_dim
            self._embed_threshold = embed_threshold
            self._embed_cache: dict[str, str | None] = {}
        # body rows carry the full document text (duplicating section
        # text) — scan only leaf/section rows by default
        self.scan_kinds = scan_kinds or (
            "preamble", "section", "subsection", "subsubsection")

    def _fuzzy(self, surface: str):
        if surface in self._fuzzy_cache:
            return self._fuzzy_cache[surface]
        hit = difflib.get_close_matches(surface, self._labels, 1, self.cutoff)
        uri = self.gazetteer[hit[0]] if hit else None
        self._fuzzy_cache[surface] = uri
        return uri

    def _scan_entities(self, text, segments, out, pending=None):
        claimed = []
        if self._exact is not None:
            for s, e in segments:
                for m in self._exact.finditer(text, s, e):
                    out.append((m.start(), m.end(), m.group(0), "entity",
                                self.gazetteer[m.group(0)]))
                    claimed.append((m.start(), m.end()))
        for s, e in segments:
            for m in RE_CAND.finditer(text, s, e):
                if any(m.start() < ce and m.end() > cs for cs, ce in claimed):
                    continue
                uri = self._fuzzy(m.group(0))
                if uri is not None:
                    out.append((m.start(), m.end(), m.group(0),
                                "entity_fuzzy", uri))
                elif pending is not None:
                    pending.append((m.start(), m.end(), m.group(0)))

    def _embed_resolve(self, surfaces):
        """Batch-resolve surfaces the fuzzy pass missed: ONE
        vectorized embed + ONE matmul per unique-surface set (results
        cached per actor). Returns {surface: uri_or_None}."""
        import numpy as np

        from .embed_link import trigram_embed

        todo = [s for s in set(surfaces) if s not in self._embed_cache]
        if todo:
            q = trigram_embed(todo, self._embed_dim)
            sims = q @ self._embed_mat.T
            best = sims.argmax(axis=1)
            score = sims[np.arange(len(todo)), best]
            for s, b, sc in zip(todo, best, score):
                self._embed_cache[s] = (self._embed_uris[int(b)]
                                        if sc >= self._embed_threshold
                                        else None)
        return {s: self._embed_cache[s] for s in surfaces}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {c: [] for c in MENTION_COLS}
        kinds = batch["kind"].to_pylist()
        urls = batch["url"].to_pylist()
        uris = batch["section_uri"].to_pylist()
        texts = batch["text"].to_pylist()
        deferred = []  # (url, sec_uri, start, end, surface)
        for kind, url, sec_uri, text in zip(kinds, urls, uris, texts):
            if kind not in self.scan_kinds or not text:
                continue
            matches, segments = scan_citations(text, url, self.rfc_base,
                                               grammars=self.grammars)
            pending = [] if self._embed_mat is not None else None
            self._scan_entities(text, segments, matches, pending)
            if pending:
                deferred.extend((url, sec_uri, ms, me, sf)
                                for ms, me, sf in pending)
            matches.sort()
            for ms, me, surface, mkind, linked in matches:
                cols["url"].append(url)
                cols["section_uri"].append(sec_uri)
                cols["surface"].append(surface)
                cols["start"].append(ms)
                cols["end"].append(me)
                cols["kind"].append(mkind)
                cols["linked_uri"].append(linked)
                cols["predicate"].append(
                    "dcterms:subject" if mkind.startswith("entity")
                    else "dcterms:references")
        if deferred:
            resolved = self._embed_resolve([d[4] for d in deferred])
            for url, sec_uri, ms, me, surface in deferred:
                uri = resolved[surface]
                if uri is None:
                    continue
                cols["url"].append(url)
                cols["section_uri"].append(sec_uri)
                cols["surface"].append(surface)
                cols["start"].append(ms)
                cols["end"].append(me)
                cols["kind"].append("entity_embed")
                cols["linked_uri"].append(uri)
                cols["predicate"].append("dcterms:subject")
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "section_uri": pa.array(cols["section_uri"], pa.string()),
            "surface": pa.array(cols["surface"], pa.string()),
            "start": pa.array(cols["start"], pa.int32()),
            "end": pa.array(cols["end"], pa.int32()),
            "kind": pa.array(cols["kind"], pa.string()),
            "linked_uri": pa.array(cols["linked_uri"], pa.string()),
            "predicate": pa.array(cols["predicate"], pa.string()),
        })


def mention_triples(batch: pa.Table) -> pa.Table:
    """mentions batch → reference/subject triples."""
    return pa.table({
        "subj": batch["section_uri"],
        "pred": batch["predicate"],
        "obj": batch["linked_uri"],
        "obj_is_literal": pa.array([False] * batch.num_rows, pa.bool_()),
        "obj_lang": pa.array([""] * batch.num_rows, pa.string()),
        "obj_datatype": pa.array([""] * batch.num_rows, pa.string()),
        "source_url": batch["url"],
    })
