"""Resume/lineage: run pipeline with checkpoints, verify manifest,
delete a later stage, re-run → earlier stages skipped (not
recomputed), outputs byte-identical (FIXTURES.md §6)."""

import os
import shutil

import pytest

from ferenda_ray.pipelines.corpus import pages_dataset
from ferenda_ray.pipelines.kg import sections_dataset
from ferenda_ray.state import manifest as mf


@pytest.fixture()
def ckpt(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_checkpoint_and_resume(ray_session, sf_smoke, ckpt):
    pages = pages_dataset(sf_smoke)
    s1 = sections_dataset(pages, checkpoint_dir=ckpt)
    n1 = s1.count()
    assert mf.stage_complete(ckpt, "parse")
    rows = mf.read_manifest(ckpt)
    assert rows and all(r["stage"] == "parse" for r in rows)
    assert sum(r["rows_out"] for r in rows) == n1
    assert all(r["status"] == "ok" for r in rows)
    assert all(r["errors"] == 0 for r in rows)
    # url range lineage present
    assert rows[0]["url_min"] is not None

    # capture file mtimes, then "re-run" — must skip, not recompute
    stage_dir = os.path.join(ckpt, "parse")
    before = {f: os.path.getmtime(os.path.join(stage_dir, f))
              for f in os.listdir(stage_dir)}
    pages2 = pages_dataset(sf_smoke)
    s2 = sections_dataset(pages2, checkpoint_dir=ckpt)
    assert s2.count() == n1
    after = {f: os.path.getmtime(os.path.join(stage_dir, f))
             for f in os.listdir(stage_dir)}
    assert before == after  # untouched → skipped

    # delete the stage → re-run recomputes with identical content
    import pandas as pd

    df1 = s1.to_pandas().sort_values(
        ["url", "position"], kind="mergesort").reset_index(drop=True)
    shutil.rmtree(stage_dir)
    s3 = sections_dataset(pages_dataset(sf_smoke), checkpoint_dir=ckpt)
    df3 = s3.to_pandas().sort_values(
        ["url", "position"], kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(df1, df3)


def test_manifest_stats(ray_session, sf_smoke, ckpt):
    pages = pages_dataset(sf_smoke)
    sections_dataset(pages, checkpoint_dir=ckpt).count()
    stats = mf.manifest_stats(ckpt)
    assert list(stats["stage"]) == ["parse"]
    assert int(stats["rows_out"].iloc[0]) > 0
    assert int(stats["errors"].iloc[0]) == 0


def test_full_pipeline_mid_resume(ray_session, sf_smoke, ckpt):
    """Kill-between-stages semantics: run all three stages, delete the
    LAST stage's checkpoint, re-run → earlier stages untouched
    (skipped), final triples byte-identical."""
    import pandas as pd

    from ferenda_ray.pipelines.kg import kg_pipeline_resumable

    res1 = kg_pipeline_resumable(sf_smoke, ckpt)
    t1 = res1["triples"].to_pandas().sort_values(
        ["subj", "pred", "obj"], kind="mergesort").reset_index(drop=True)
    for stage in ("parse", "mentions", "triples"):
        assert mf.stage_complete(ckpt, stage)
    stats = mf.manifest_stats(ckpt)
    assert set(stats["stage"]) == {"parse", "mentions", "triples"}

    parse_dir = os.path.join(ckpt, "parse")
    mentions_dir = os.path.join(ckpt, "mentions")
    before = {d: sorted(os.listdir(d)) for d in (parse_dir, mentions_dir)}
    mtimes = {f: os.path.getmtime(os.path.join(parse_dir, f))
              for f in os.listdir(parse_dir)}

    shutil.rmtree(os.path.join(ckpt, "triples"))
    res2 = kg_pipeline_resumable(sf_smoke, ckpt)
    t2 = res2["triples"].to_pandas().sort_values(
        ["subj", "pred", "obj"], kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(t1, t2)
    # parse/mentions were skipped, not recomputed
    assert {d: sorted(os.listdir(d)) for d in (parse_dir, mentions_dir)} == before
    assert {f: os.path.getmtime(os.path.join(parse_dir, f))
            for f in os.listdir(parse_dir)} == mtimes


def test_upstream_rewrite_invalidates_descendants(ray_session, sf_smoke, ckpt):
    """Deleting + regenerating an EARLY stage must re-run descendants
    even though their _SUCCESS markers are intact: markers record the
    upstream fingerprints they were built from (ADVICE r01 item 1)."""
    from ferenda_ray.pipelines.kg import kg_pipeline_resumable

    kg_pipeline_resumable(sf_smoke, ckpt)["triples"].count()
    fp_mentions_1 = mf.stage_fingerprint(ckpt, "mentions")
    fp_triples_1 = mf.stage_fingerprint(ckpt, "triples")

    # regenerate the parse stage → descendants' recorded upstream
    # fingerprints are now stale, so they must be recomputed
    shutil.rmtree(os.path.join(ckpt, "parse"))
    assert not mf.stage_complete(ckpt, "mentions", upstream=("parse",))
    kg_pipeline_resumable(sf_smoke, ckpt)["triples"].count()
    assert mf.stage_fingerprint(ckpt, "mentions") != fp_mentions_1
    assert mf.stage_fingerprint(ckpt, "triples") != fp_triples_1
    assert mf.stage_complete(ckpt, "mentions", upstream=("parse",))
    assert mf.stage_complete(ckpt, "triples",
                             upstream=("parse", "mentions"))


def test_interrupted_write_invisible(ray_session, sf_smoke, ckpt):
    """A .tmp dir left by a crashed run must not be treated as done."""
    os.makedirs(os.path.join(ckpt, "parse.tmp"), exist_ok=True)
    assert not mf.stage_complete(ckpt, "parse")
    s = sections_dataset(pages_dataset(sf_smoke), checkpoint_dir=ckpt)
    assert s.count() > 0
    assert mf.stage_complete(ckpt, "parse")
    assert not os.path.exists(os.path.join(ckpt, "parse.tmp"))
