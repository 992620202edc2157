"""Property-based tests (hypothesis) for the invariant-bearing pure
functions: text normalization idempotence, citation-scan
non-overlap, N-Triples escaping round-trip, natural-sort total order,
HTML extraction robustness on arbitrary bytes."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_ray.functions import normalize_space, split_numalpha, title_sortkey
from ferenda_ray.htmltree import extract_text
from ferenda_ray.sources.nt import _escape_literal, format_triple
from ferenda_ray.stages.mentions import scan_citations

TEXT = st.text(max_size=300)


@given(TEXT)
def test_normalize_space_idempotent(s):
    once = normalize_space(s)
    assert normalize_space(once) == once
    assert "  " not in once
    assert once == once.strip()


@given(TEXT)
def test_title_sortkey_stable(s):
    k = title_sortkey(s)
    assert title_sortkey(k) == k or k == ""  # key of a key is itself
    assert re.fullmatch(r"[^\W]*", k, re.UNICODE)


@given(st.text(alphabet="0123456789 a§b.", max_size=30))
def test_split_numalpha_structure(s):
    parts = split_numalpha(s)
    # alternation invariant: odd indices are ints, even are strs
    # (the reference pads a leading '' for this, util.py:240-242)
    for i, p in enumerate(parts):
        assert isinstance(p, int) == (i % 2 == 1)
    # reassembly reproduces the input modulo leading zeros on numeric
    # segments (int conversion is the reference's own behavior)
    rebuilt = "".join(str(p) for p in parts)
    assert re.sub(r"0+(\d)", r"\1", rebuilt) == re.sub(r"0+(\d)", r"\1", s)


@given(st.integers(0, 10 ** 6), st.integers(0, 10 ** 6))
def test_natsort_orders_numbers_numerically(a, b):
    ka, kb = split_numalpha(str(a)), split_numalpha(str(b))
    assert (ka < kb) == (a < b)


@given(TEXT)
@settings(max_examples=200)
def test_scan_citations_never_overlaps(s):
    matches, segments = scan_citations(s, "http://d/x")
    spans = sorted((m[0], m[1]) for m in matches)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2, "overlapping citation matches"
    # segments + matches tile the string without overlap
    covered = sorted(spans + list(segments))
    pos = 0
    for a, b in covered:
        assert a >= pos
        pos = b


@given(TEXT, st.sampled_from(["", "en", "de"]))
def test_nt_literal_roundtrip(s, lang):
    line = format_triple("http://s", "dcterms:title", s, True, lang)
    assert line.endswith(" .")
    # escaped literal contains no raw newline/quote breakage
    esc = _escape_literal(s)
    assert "\n" not in esc and "\r" not in esc
    # unescape inverts escape (single left-to-right pass, no sentinel)
    inv = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}
    un = re.sub(r"\\(.)", lambda m: inv[m.group(1)], esc)
    assert un == s


@given(st.binary(max_size=400))
@settings(max_examples=150)
def test_extract_text_never_raises(b):
    # arbitrary bytes through the HTML extractor: any outcome but an
    # exception (the error-row contract depends on this per-row
    # robustness only for well-formed dispatch; the extractor itself
    # must be total)
    out = extract_text(b"<html><body>" + b + b"</body></html>")
    assert isinstance(out, str)


# --- dedup / CC primitives (pure functions, no Ray) -------------------

WORD = st.sampled_from(["alpha", "beta", "gamma", "delta-4", "ε", "rfc"])


@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                max_size=50))
@settings(deadline=None)
def test_union_find_representative_is_component_min(pairs):
    from ferenda_ray.stages.canonicalize import union_find

    edges = [("n%02d" % a, "n%02d" % b) for a, b in pairs]
    canon = union_find(edges)
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for n in adj:
        seen, stack = {n}, [n]
        while stack:
            for y in adj[stack.pop()]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        assert canon[n] == min(seen)


@given(st.lists(WORD, max_size=25), st.randoms(use_true_random=False))
@settings(deadline=None)
def test_simhash_word_permutation_invariant_and_int64(words, rnd):
    from ferenda_ray.stages.dedup import simhash63

    h = simhash63(" ".join(words))
    assert 0 <= h < 2 ** 63  # fits signed int64 (Arrow round-trip)
    shuffled = list(words)
    rnd.shuffle(shuffled)
    assert simhash63(" ".join(shuffled)) == h


@given(st.lists(WORD, max_size=30), st.lists(WORD, max_size=30))
@settings(deadline=None)
def test_minhash_signature_of_union_is_elementwise_min(wa, wb):
    # the defining MinHash property: sig(A ∪ B) == min(sig(A), sig(B))
    # elementwise — banding/LSH correctness rests on exactly this
    import numpy as np

    from ferenda_ray.stages.dedup import minhash_signature, shingle_hashes

    sa = shingle_hashes(" ".join(wa))
    sb = shingle_hashes(" ".join(wb))
    union = np.union1d(sa, sb).astype(np.uint64)
    expect = np.minimum(minhash_signature(sa), minhash_signature(sb))
    assert (minhash_signature(union) == expect).all()


@given(TEXT)
@settings(deadline=None)
def test_sectionize_text_total_and_faithful(s):
    # the RFC-text FSM instance is total: never raises, every section
    # row carries the document url, and all emitted section text is
    # made of lines present in the input (no invented content)
    from ferenda_ray.stages.textparse import sectionize_text

    rows = sectionize_text(s, "https://t.example.org/d")
    # paragraph reflow joins lines and C0 control chars become
    # spaces, so faithfulness is token-level: every output token
    # exists verbatim in the (sanitized) input
    tokens = set(re.sub(r"[\x00-\x1f\x7f]", " ", s).split())
    tokens |= set(s.split())
    for r in rows:
        assert r["url"] == "https://t.example.org/d"
        for tok in str(r.get("text") or "").split():
            assert tok in tokens
