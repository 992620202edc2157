"""Small per-batch transforms: patches, link rewriting, sampling,
skew salting.

- ``apply_patches``: per-document text overrides applied before/after
  parse — the reference's ``patch_if_needed``
  (documentrepository.py:1352-1401) as a broadcast overrides map
  (url → [(find, replace), ...]) instead of unified-diff files.
- ``patch_if_needed`` / ``parse_unified_diff`` /
  ``apply_unified_diff``: REAL unified-diff semantics
  (documentrepository.py:1352-1401 + thirdparty/patchit.py): patches
  parse once on the driver, broadcast, apply map-side with context
  verification and nearby-offset adjustment (the reference's
  ``adjust``); a context mismatch raises ``PatchError`` (the
  reference's PatchConflictError), and the hunk's leading comment —
  or a ``.desc`` sidecar — becomes the patch description column.
- ``transform_links``: rewrite URLs in a column by prefix map — the
  reference's ``transformlinks`` (documentrepository.py:2749-2793)
  for static-site / devel-url relocation.
- ``salted_counts``: explicit hot-key salting for skewed groupbys —
  phase 1 groups on (key, salt) so a hot key spreads over ``salt_n``
  reducers, phase 2 merges the per-salt partials (SURVEY §4/§7:
  the north rule's skew requirement, beyond the per-batch combiner).
- ``sample_corpus``: deterministic sampling
  (devel.samplerepo semantics, devel.py:1224-1418).
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def strip_schema_metadata(ds):
    """Drop schema-level metadata (pandas index blobs etc.) from every
    block — zero-copy. Parquet written by pandas carries a metadata
    dict that makes ``hash(schema)`` raise in pyarrow 16, which
    defeats Ray's schema-deduplication fast path and forces a full
    ``unify_schemas`` on every block concat (transform_pyarrow.py
    "Failed to hash the schemas" warning). Applied at every read
    entry point."""
    return ds.map_batches(_strip_meta, batch_format="pyarrow")


def apply_patches(ds, patches: dict, col: str = "text"):
    """patches: {url: [(find, replace), ...]} — broadcast once via
    ray.put, applied map-side to rows whose url matches."""
    import ray

    ref = ray.put(patches)

    def patch(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(ref)
        if not p:
            return df
        df = df.copy()
        hits = df["url"].isin(p.keys())
        for idx in df.index[hits]:
            val = df.at[idx, col]
            for find, replace in p[df.at[idx, "url"]]:
                val = val.replace(find, replace)
            df.at[idx, col] = val
        return df

    return ds.map_batches(patch, batch_format="pandas")


class PatchError(Exception):
    """Unified-diff parse or apply failure (the reference's
    errors.PatchError over PatchSyntaxError / PatchConflictError,
    documentrepository.py:1384,1401)."""


def parse_unified_diff(text: str):
    """Parse ONE file's unified diff into (hunks, description).

    A hunk is ``(src_start, src_len, lines)`` with ``lines`` a list
    of ``(tag, text)`` where tag ∈ {" ", "-", "+"}. Lines before the
    ``---`` header (or ``#``-prefixed comment lines) become the
    description — the reference takes the first hunk's comment as the
    patch description (documentrepository.py:1389-1394). Raises
    ``PatchError`` on malformed hunk headers (PatchSyntaxError
    semantics)."""
    import re

    hunks = []
    desc_lines = []
    lines = text.split("\n")
    i = 0
    header_re = re.compile(
        r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("@@"):
            m = header_re.match(ln)
            if not m:
                raise PatchError("malformed hunk header: %r" % ln)
            src_start = int(m.group(1))
            src_len = int(m.group(2)) if m.group(2) is not None else 1
            dst_len = int(m.group(4)) if m.group(4) is not None else 1
            i += 1
            body = []
            n_src = n_dst = 0
            while i < len(lines) and (n_src < src_len
                                      or n_dst < dst_len):
                bl = lines[i]
                if bl.startswith(" ") or bl == "":
                    body.append((" ", bl[1:]))
                    n_src += 1
                    n_dst += 1
                elif bl.startswith("-"):
                    body.append(("-", bl[1:]))
                    n_src += 1
                elif bl.startswith("+"):
                    body.append(("+", bl[1:]))
                    n_dst += 1
                elif bl.startswith("\\"):
                    pass  # "\ No newline at end of file"
                else:
                    raise PatchError("unexpected hunk line: %r" % bl)
                i += 1
            if n_src != src_len or n_dst != dst_len:
                raise PatchError(
                    "hunk shorter than its header claims (%d/%d src,"
                    " %d/%d dst)" % (n_src, src_len, n_dst, dst_len))
            hunks.append((src_start, src_len, body))
        else:
            if (ln.startswith(("---", "+++", "diff ", "index "))
                    or not hunks and ln.strip()):
                if not ln.startswith(("---", "+++", "diff ", "index ")):
                    desc_lines.append(ln.lstrip("# ").rstrip())
            i += 1
    if not hunks:
        raise PatchError("no hunks found")
    return hunks, "\n".join(d for d in desc_lines if d) or None


def apply_unified_diff(text: str, hunks, max_offset: int = 200) -> str:
    """Apply parsed hunks to ``text`` with context verification.

    Each hunk's source lines (context + deletions) must match the
    document at the header position adjusted by the running offset;
    if not, nearby offsets up to ``max_offset`` lines away are tried
    (the reference's ``Patch.adjust``). No match anywhere raises
    ``PatchError`` (PatchConflictError semantics) — a silent
    mispatch is worse than a loud one."""
    doc = text.split("\n")
    out = []
    consumed = 0  # lines of doc already emitted/skipped
    offset = 0    # cumulative drift between header positions and doc
    for src_start, src_len, body in hunks:
        src_lines = [t for tag, t in body if tag in (" ", "-")]

        def matches_at(pos: int) -> bool:
            if pos < 0 or pos + len(src_lines) > len(doc):
                return False
            return doc[pos:pos + len(src_lines)] == src_lines

        base = src_start - 1 + offset
        pos = None
        if matches_at(base):
            pos = base
        else:
            for d in range(1, max_offset + 1):
                if matches_at(base + d):
                    pos = base + d
                    break
                if matches_at(base - d):
                    pos = base - d
                    break
        if pos is None or pos < consumed:
            raise PatchError(
                "hunk @@ -%d,%d does not apply (context mismatch)"
                % (src_start, src_len))
        out.extend(doc[consumed:pos])
        for tag, t in body:
            if tag == " ":
                out.append(t)
            elif tag == "+":
                out.append(t)
        consumed = pos + len(src_lines)
        offset = pos - (src_start - 1)
    out.extend(doc[consumed:])
    return "\n".join(out)


def load_patchdir(patchdir: str, encoding: str = "utf-8") -> dict:
    """Load a directory of ``<key>.patch`` files (with optional
    ``<key>.desc`` sidecars) into ``{key: (patch_text, desc)}`` —
    the patchstore layout of documentrepository.py:1369-1375, flat.
    Keys are the file stems, percent-decoded so URL-keyed corpora can
    store one patch per url."""
    import os
    from urllib.parse import unquote

    out = {}
    if not os.path.isdir(patchdir):
        return out
    for fn in sorted(os.listdir(patchdir)):
        if not fn.endswith(".patch"):
            continue
        key = unquote(fn[:-len(".patch")])
        with open(os.path.join(patchdir, fn), encoding=encoding) as f:
            ptext = f.read()
        desc = None
        descpath = os.path.join(patchdir, fn[:-len(".patch")] + ".desc")
        if os.path.exists(descpath):
            with open(descpath, encoding=encoding) as f:
                desc = f.read().strip()
        out[key] = (ptext, desc)
    return out


def patch_if_needed(ds, patches, col: str = "text",
                    url_col: str = "url",
                    desc_col: str | None = "patch_desc",
                    ignorepatch: bool = False,
                    encoding: str = "utf-8"):
    """Unified-diff ``patch_if_needed`` over a Dataset.

    ``patches``: ``{key: patch_text}`` or ``{key: (patch_text,
    desc)}`` — e.g. from ``load_patchdir``. Patches parse ONCE on
    the driver (a syntax error fails fast, before any task runs),
    the parsed hunks broadcast via ``ray.put`` and apply map-side to
    rows whose ``url_col`` matches; other rows stream through
    untouched. ``desc_col`` (if not None) is added: the patch
    description for patched rows, null elsewhere — the reference's
    (patchedtext, patchdescription) return. ``ignorepatch=True``
    streams everything through unchanged but still adds the null
    ``desc_col`` (config.ignorepatch semantics,
    documentrepository.py:1366-1367)."""
    import ray

    parsed = {}
    for key, val in patches.items():
        ptext, desc = val if isinstance(val, tuple) else (val, None)
        hunks, inline_desc = parse_unified_diff(ptext)
        # Reference precedence (documentrepository.py:1389-1394):
        # inline hunk comment first, .desc sidecar as fallback.
        parsed[key] = (hunks, inline_desc or desc
                       or "(No patch description available)")

    ref = ray.put(parsed if not ignorepatch else {})

    def patch(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(ref)
        df = df.copy()
        descs = pd.Series([None] * len(df), index=df.index,
                          dtype=object)
        if p:
            hits = df[url_col].isin(p.keys())
            for idx in df.index[hits]:
                hunks, desc = p[df.at[idx, url_col]]
                val = df.at[idx, col]
                was_bytes = isinstance(val, (bytes, bytearray))
                if was_bytes:
                    val = bytes(val).decode(encoding)
                val = apply_unified_diff(val, hunks)
                df.at[idx, col] = (val.encode(encoding)
                                   if was_bytes else val)
                descs.at[idx] = desc
        if desc_col is not None:
            df[desc_col] = descs
        return df

    return ds.map_batches(patch, batch_format="pandas")


def transform_links(ds, url_map: dict, cols=("url",)):
    """Prefix-rewrite URLs: the longest matching prefix in ``url_map``
    is replaced by its target (transformlinks semantics)."""
    import ray

    prefixes = sorted(url_map, key=len, reverse=True)
    ref = ray.put((prefixes, dict(url_map)))

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        pfx, mapping = ray.get(ref)
        df = df.copy()
        for c in cols:
            def rw(u):
                if u is None:
                    return u
                for p in pfx:
                    if u.startswith(p):
                        return mapping[p] + u[len(p):]
                return u
            df[c] = df[c].map(rw)
        return df

    return ds.map_batches(rewrite, batch_format="pandas")


def salted_counts(ds, key_col: str, salt_n: int = 8):
    """Two-phase skew-safe groupby-count.

    Phase 1 keys on (key, salt) where salt = row-content hash mod
    ``salt_n`` — a hot key's rows spread over ``salt_n`` reducers
    instead of melting one. Phase 2 is a groupby over at most
    ``salt_n`` partials per key. Returns (key, n)."""

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        idx = pd.RangeIndex(len(df))
        salts = [(zlib.crc32(("%s|%d" % (k, i)).encode()) % salt_n)
                 for k, i in zip(df[key_col], idx)]
        out = pd.DataFrame({key_col: df[key_col], "_salt": salts})
        return out.groupby([key_col, "_salt"], as_index=False).size().rename(
            columns={"size": "partial"})

    return (
        ds.map_batches(add_salt, batch_format="pandas")
        .groupby([key_col, "_salt"]).sum("partial")
        .map_batches(
            lambda df: df.rename(columns={"sum(partial)": "partial"}),
            batch_format="pandas")
        .groupby(key_col).sum("partial")
        .map_batches(lambda df: df.rename(columns={"sum(partial)": "n"}),
                     batch_format="pandas")
    )


def heavy_hitters(keys_ds, key_col: str, cap: int):
    """EXACT φ-heavy hitters (φ = 1/cap): every key whose global count
    satisfies cnt·cap > N, without ever shuffling the full key space
    (Misra–Gries '82 pigeonhole, in the mergeable-summaries form of
    Agarwal et al. PODS'12).

    Phase 1 — the only touch of the raw keys: per-block partial counts
    (key, cnt, n_batch), materialized (NARROW rows, spillable);
    N = Σcnt needs no second scan. Candidates = keys with
    cnt·cap > n_batch in ≥1 block. Pigeonhole guarantee: a key with
    global cnt·cap > N must exceed the per-block threshold somewhere
    (summing the per-block inequalities otherwise contradicts the
    global one), so the candidate set is COMPLETE; each block emits
    < cap of them, and the pruning bites once block rows ≫ cap
    (batch_size=None → one batch per block). The candidate pull to
    the driver is bounded by min(vocab, blocks·cap) — the same driver
    contract as kmeans_int's k·d centroid pull.

    Phase 2 — exact counts restricted to the broadcast candidate set:
    the exchange carries |candidates| rows, never the key space; the
    final exact filter cnt·cap > N removes every false positive. The
    result is bit-identical to the full groupby (a SQL HAVING clause),
    at a fraction of its shuffle volume."""
    import numpy as np
    import ray

    def part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[key_col].value_counts()
        out = pd.DataFrame({key_col: vc.index.astype(str),
                            "cnt": vc.to_numpy().astype("int64")})
        out["n_batch"] = np.int64(len(df))
        return out

    partials = keys_ds.map_batches(
        part, batch_format="pandas", batch_size=None).materialize()
    n_total = int(partials.sum("cnt") or 0)

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        hit = df[df["cnt"] * cap > df["n_batch"]]
        return hit[[key_col]].drop_duplicates()

    cand_rows = partials.map_batches(cand, batch_format="pandas").take_all()
    ref = ray.put({r[key_col] for r in cand_rows})

    def exact(df: pd.DataFrame) -> pd.DataFrame:
        keep = ray.get(ref)
        hit = df[df[key_col].isin(keep)]
        return hit.groupby(key_col, as_index=False)["cnt"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, as_index=False)["cnt"].sum()
        g["cnt"] = g["cnt"].astype("int64")
        g = g[g["cnt"] * cap > n_total]
        return g.sort_values(["cnt", key_col],
                             ascending=[False, True]).reset_index(drop=True)

    return (partials.map_batches(exact, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sample_corpus(ds, frac: float, seed: int = 42):
    """Deterministic fractional sample."""
    return ds.random_sample(frac, seed=seed)


def limit_corpus(ds, n: int):
    """downloadmax semantics (decorators.py:353-369)."""
    return ds.limit(n)


def serialize_sections_json(sections_ds, num_buckets: int = 64):
    """Round-trippable per-document JSON of the section tree
    (elements.serialize analogue, elements/elements.py:53-93):
    one row (url, body_json) per document; ``deserialize_sections``
    inverts it exactly. Shuffle key = int hash bucket of url (never
    one Ray group per document at corpus cardinality)."""
    import json

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df["url"], index=False).values
        df["_bucket"] = (h % num_buckets).astype("int32")
        return df

    def to_json(g: pd.DataFrame) -> pd.DataFrame:
        urls, bodies = [], []
        for url, grp in g.groupby("url", sort=False):
            grp = grp.sort_values("position", kind="mergesort")
            doc = [
                {k: (None if pd.isna(r[k]) else r[k])
                 for k in ("section_uri", "kind", "ordinal", "title",
                           "parent_uri", "text", "position")}
                for r in grp.to_dict("records")
            ]
            urls.append(url)
            bodies.append(json.dumps(doc, sort_keys=True))
        return pd.DataFrame({"url": urls, "body_json": bodies})

    return (sections_ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(to_json, batch_format="pandas"))


def deserialize_sections(json_ds):
    """Inverse of serialize_sections_json."""
    import json

    def from_json(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for url, body in zip(df["url"], df["body_json"]):
            for r in json.loads(body):
                r["url"] = url
                out.append(r)
        cols = ("url", "section_uri", "kind", "ordinal", "title",
                "parent_uri", "text", "position")
        return pd.DataFrame({c: [r.get(c) for r in out] for c in cols})

    return json_ds.map_batches(from_json, batch_format="pandas")


def hash_split(ds, key_col: str = "doc_id",
               bounds=(("train", 80), ("val", 90), ("test", 100))):
    """Deterministic train/val/test assignment: md5(key) -> bucket in
    [0, 100); the first bound whose threshold exceeds the bucket wins.
    Pure map (no shuffle, no seed state) — membership is a property of
    the key alone, so re-runs, resumes and late-arriving shards all
    agree. Hash = first 15 md5 hex chars as an integer, the same
    avalanche recipe the HLL/CM sketches pin bit-exactly against SQL
    (CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT))."""
    import hashlib

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        def split_of(k):
            b = int(hashlib.md5(str(int(k)).encode())
                    .hexdigest()[:15], 16) % 100
            for name, hi in bounds:
                if b < hi:
                    return name
            return bounds[-1][0]

        df = df.copy()
        df["split"] = df[key_col].map(split_of)
        return df

    return ds.map_batches(assign, batch_format="pandas")
