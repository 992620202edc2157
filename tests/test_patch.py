"""Unified-diff patch_if_needed (documentrepository.py:1352-1401 +
thirdparty/patchit semantics): parse, context-verified apply with
offset adjustment, conflict errors, patchdir loading, and the golden
pipeline case — one synthetic page patched pre-parse changes ONLY
that document's extracted output, every other golden stays
byte-identical."""

import difflib
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ferenda_ray.stages.transform import (
    PatchError,
    apply_unified_diff,
    load_patchdir,
    parse_unified_diff,
    patch_if_needed,
)


def _diff(a: str, b: str, desc: str | None = None) -> str:
    lines = list(difflib.unified_diff(
        a.split("\n"), b.split("\n"), lineterm="", n=2))
    head = ["# %s" % desc] if desc else []
    return "\n".join(head + lines)


ORIG = "\n".join("line %d" % i for i in range(30))


def test_roundtrip_difflib_output():
    new = ORIG.replace("line 7", "LINE SEVEN").replace(
        "line 22", "LINE TWENTY-TWO\nextra line")
    hunks, desc = parse_unified_diff(_diff(ORIG, new, "fix seven"))
    assert desc == "fix seven"
    assert apply_unified_diff(ORIG, hunks) == new


def test_offset_adjustment():
    """Hunk positions drift when the document gained lines upstream of
    the hunk — the reference's Patch.adjust must find the context."""
    new = ORIG.replace("line 20", "PATCHED TWENTY")
    patch = _diff(ORIG, new)
    drifted = "inserted A\ninserted B\ninserted C\n" + ORIG
    hunks, _ = parse_unified_diff(patch)
    got = apply_unified_diff(drifted, hunks)
    assert "PATCHED TWENTY" in got
    assert got.startswith("inserted A")
    assert "line 20" not in got


def test_conflict_raises():
    new = ORIG.replace("line 20", "PATCHED TWENTY")
    hunks, _ = parse_unified_diff(_diff(ORIG, new))
    mangled = ORIG.replace("line 19", "context destroyed")
    with pytest.raises(PatchError):
        apply_unified_diff(mangled, hunks)


def test_malformed_patch_raises():
    with pytest.raises(PatchError):
        parse_unified_diff("not a patch at all")
    with pytest.raises(PatchError):
        parse_unified_diff("@@ -1,5 +1,5 @@\n line 0\n")  # truncated


def test_load_patchdir(tmp_path):
    d = tmp_path / "patches"
    d.mkdir()
    new = ORIG.replace("line 3", "three")
    (d / "https%3A%2F%2Fx.test%2Fdoc%2F1.patch").write_text(
        _diff(ORIG, new))
    (d / "https%3A%2F%2Fx.test%2Fdoc%2F1.desc").write_text(
        "fix digit")
    loaded = load_patchdir(str(d))
    assert list(loaded) == ["https://x.test/doc/1"]
    ptext, desc = loaded["https://x.test/doc/1"]
    assert desc == "fix digit"
    hunks, _ = parse_unified_diff(ptext)
    assert apply_unified_diff(ORIG, hunks) == new
    assert load_patchdir(str(tmp_path / "missing")) == {}


def test_patch_if_needed_dataset(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "text": [ORIG, ORIG, "other doc\nbody"]})
    new = ORIG.replace("line 11", "eleven")
    out = (patch_if_needed(
        rd.from_pandas(docs), {"u2": (_diff(ORIG, new), "fix 11")})
        .to_pandas().sort_values("url").reset_index(drop=True))
    assert out.loc[0, "text"] == ORIG            # u1 untouched
    assert out.loc[1, "text"] == new             # u2 patched
    assert out.loc[2, "text"] == "other doc\nbody"
    assert out.loc[1, "patch_desc"] == "fix 11"
    assert out.loc[0, "patch_desc"] is None

    # ignorepatch short-circuits (config.ignorepatch semantics)
    out2 = (patch_if_needed(
        rd.from_pandas(docs), {"u2": _diff(ORIG, new)},
        ignorepatch=True).to_pandas())
    assert sorted(out2["text"]) == sorted(docs["text"])


def test_patch_desc_precedence_inline_over_sidecar(ray_session):
    """Reference (documentrepository.py:1389-1394) prefers the inline
    hunk comment; the .desc sidecar is only the fallback."""
    import ray.data as rd

    docs = pd.DataFrame({"url": ["u1"], "text": [ORIG]})
    new = ORIG.replace("line 5", "five")
    both = patch_if_needed(
        rd.from_pandas(docs),
        {"u1": (_diff(ORIG, new, "inline says"), "sidecar says")},
    ).to_pandas()
    assert both.loc[0, "patch_desc"] == "inline says"
    only_sidecar = patch_if_needed(
        rd.from_pandas(docs),
        {"u1": (_diff(ORIG, new), "sidecar says")}).to_pandas()
    assert only_sidecar.loc[0, "patch_desc"] == "sidecar says"


def test_golden_pipeline_patch(ray_session, sf_smoke):
    """Patch ONE synthesized page's html pre-parse: its extracted text
    changes exactly as the diff says; every other url's extracted
    text stays byte-identical to the unpatched golden."""
    import ray.data as rd

    from ferenda_ray.htmltree import extract_text
    from ferenda_ray.pipelines import corpus

    documents = pq.read_table(sf_smoke + "/documents.parquet")
    pages = corpus.synthesize_batch(documents.slice(0, 40))
    df = pages.select(["url", "html"]).to_pandas()
    df["row_id"] = range(len(df))
    # pick a url with exactly ONE version (no recrawl twin — the
    # patch must apply to every row of its url)
    singles = df["url"].value_counts()
    target = sorted(singles[singles == 1].index)[5]
    orig_html = df.loc[df["url"] == target, "html"].iloc[0]
    if isinstance(orig_html, (bytes, bytearray)):
        orig_html = bytes(orig_html).decode("utf-8")
    # a real content fix: change the first <p> body's text
    lines = orig_html.split("\n")
    idx = next(i for i, ln in enumerate(lines) if "<p>" in ln)
    new_lines = list(lines)
    new_lines[idx] = lines[idx].replace("<p>", "<p>PATCHFIX ", 1)
    patch = _diff(orig_html, "\n".join(new_lines), "editorial fix")

    patched = (patch_if_needed(
        rd.from_pandas(df), {target: patch}, col="html")
        .to_pandas())
    golden_by_id = dict(zip(df["row_id"], df["html"]))
    for _, row in patched.iterrows():
        got = extract_text(row["html"])
        golden = extract_text(golden_by_id[row["row_id"]])
        if row["url"] == target:
            assert "PATCHFIX" in got
            assert got != golden
        else:
            assert got == golden  # byte-identical golden preserved


def test_profile_patchdir_changes_flagship_output(ray_session,
                                                  sf_smoke, tmp_path):
    """RepoProfile(patchdir=...) applies unified-diff patches to the
    html column pre-parse: the patched document's section text
    changes as the diff says; an unpatched profile reproduces the
    default output (and an env var can point at the patchdir with
    zero code edits — config layering integration)."""
    from urllib.parse import quote

    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.config import profile_with_config
    from ferenda_ray.pipelines import corpus
    from ferenda_ray.pipelines.profile import (RepoProfile,
                                               kg_pipeline_profiled)

    documents = pq.read_table(sf_smoke + "/documents.parquet")
    pages_tbl = corpus.synthesize_batch(documents.slice(0, 30))
    df = pages_tbl.to_pandas()
    singles = df["url"].value_counts()
    target = sorted(singles[singles == 1].index)[3]
    orig_html = bytes(
        df.loc[df["url"] == target, "html"].iloc[0]).decode("utf-8")
    lines = orig_html.split("\n")
    idx = next(i for i, ln in enumerate(lines) if "<p>" in ln)
    new_lines = list(lines)
    new_lines[idx] = lines[idx].replace("<p>", "<p>PATCHED-BY-DIFF ",
                                        1)
    patch = _diff(orig_html, "\n".join(new_lines), "profile patch")

    d = tmp_path / "patches"
    d.mkdir()
    (d / (quote(target, safe="") + ".patch")).write_text(patch)

    def pages_ds():
        return rd.from_arrow(pages_tbl)

    base = kg_pipeline_profiled(pages_ds(), RepoProfile())
    base_secs = base["sections"].to_pandas()
    prof = profile_with_config(
        RepoProfile(),
        env={"FERENDA_RAY_PATCHDIR": str(d)})
    assert prof.patchdir == str(d)
    patched = kg_pipeline_profiled(pages_ds(), prof)
    pat_secs = patched["sections"].to_pandas()

    tgt_base = base_secs[base_secs["url"] == target]
    tgt_pat = pat_secs[pat_secs["url"] == target]
    assert any("PATCHED-BY-DIFF" in (t or "")
               for t in tgt_pat["text"])
    assert not any("PATCHED-BY-DIFF" in (t or "")
                   for t in tgt_base["text"])
    # every other document identical
    rest_base = (base_secs[base_secs["url"] != target]
                 .sort_values(["url", "section_uri", "kind"])
                 .reset_index(drop=True))
    rest_pat = (pat_secs[pat_secs["url"] != target]
                .sort_values(["url", "section_uri", "kind"])
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(rest_base, rest_pat)
