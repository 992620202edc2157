"""Multi-node smoke test (VERDICT r4 #6): run the flagship pipeline
on a 2-virtual-node Ray cluster (ray.cluster_utils.Cluster, 4 CPUs
each) — catches object-locality and actor-placement assumptions a
single-node session can't (blocks born on node A consumed by actors
pinned to node B; broadcast refs resolved cross-node).

This test owns its own Ray session (the cluster), so it must NOT run
inside the shared session fixture: it runs in a SUBPROCESS, keeping
the module safe to collect in the main suite. Skips (with the reason
recorded) if the sandbox forbids multi-node bootstrap."""

import json
import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent("""
    import json, sys

    try:
        from ray.cluster_utils import Cluster
        import ray
    except Exception as exc:  # pragma: no cover
        print(json.dumps({"skip": "import failed: %s" % exc}))
        sys.exit(0)

    try:
        cluster = Cluster(initialize_head=True,
                          head_node_args={"num_cpus": 4})
        cluster.add_node(num_cpus=4)
        ray.init(address=cluster.address,
                 include_dashboard=False, logging_level="ERROR")
    except Exception as exc:
        print(json.dumps({"skip": "cluster bootstrap failed: %s" % exc}))
        sys.exit(0)

    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    nodes = [n for n in ray.nodes() if n["Alive"]]
    from ferenda_ray.pipelines.kg import kg_pipeline

    res = kg_pipeline(sf_dir="/root/testdata/sf0.001")
    n_triples = res["triples"].count()
    n_sections = res["sections"].count()
    errs = res["sections"].filter(
        lambda r: r["error"] is not None and r["kind"] == "body"
    ).count()
    print(json.dumps({"nodes": len(nodes), "triples": int(n_triples),
                      "sections": int(n_sections),
                      "body_errors": int(errs)}))
    ray.shutdown()
    cluster.shutdown()
""")


def test_multinode_flagship(tmp_path):
    import pytest

    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True,
        text=True, timeout=600, cwd="/root/repo")
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, "no JSON output; stderr:\n%s" % proc.stderr[-2000:]
    out = json.loads(lines[-1])
    if "skip" in out:
        pytest.skip(out["skip"])
    assert out["nodes"] == 2, out
    assert out["triples"] > 0 and out["sections"] > 0, out
    assert out["body_errors"] == 0, out
