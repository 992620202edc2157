"""The ray-job-submit CLI entry point (ferenda_ray.job) end to end:
plain, streaming and checkpointed/resume modes all write the same
partitioned triple set."""

import json
import shutil

import ray.data as rd


def _run(capsys, tmp_path, *extra):
    from ferenda_ray.job import main

    out = tmp_path / ("out%d" % len(list(tmp_path.iterdir())))
    rc = main(["--sf-dir", "/root/testdata/sf0.001",
               "--out", str(out)] + list(extra))
    assert rc == 0
    counters = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    return out, counters


def test_job_modes_agree(ray_session, tmp_path, capsys):
    out_plain, c_plain = _run(capsys, tmp_path)
    out_stream, c_stream = _run(capsys, tmp_path, "--streaming")
    ckpt = tmp_path / "ckpt"
    out_ck, c_ck = _run(capsys, tmp_path,
                        "--checkpoint-dir", str(ckpt))
    assert c_plain["triples"] == c_stream["triples"] == c_ck["triples"] > 0
    assert set(c_ck["stages"]) == {"parse", "mentions", "triples"}

    def triple_set(out):
        df = rd.read_parquet(str(out) + "/triples").to_pandas()
        cols = [c for c in df.columns if c != "bucket"]
        return set(map(tuple, df[cols].astype(str).values))

    assert triple_set(out_plain) == triple_set(out_stream) == triple_set(out_ck)

    # resume: markers intact -> stages skipped, same output
    out_rs, c_rs = _run(capsys, tmp_path, "--checkpoint-dir", str(ckpt))
    assert c_rs["triples"] == c_ck["triples"]
    assert triple_set(out_rs) == triple_set(out_ck)
    shutil.rmtree(ckpt)
