"""Fault-injection: a worker process DIES mid-pipeline (os._exit —
a real process loss, not a Python exception) and Ray's task-lineage
re-execution must finish the job with output identical to a clean
run. This is the engine property the 100-TB design leans on: node
loss re-runs only the lost tasks, it never poisons the result.

The crash fires exactly once, gated by a filesystem sentinel shared
across worker processes (workers are separate PIDs — an in-memory
flag would re-crash every retry).
"""

import os

import pyarrow as pa
import pyarrow.compute as pc


def _documents(sf="/root/testdata/sf0.001"):
    import ray.data as rd

    return rd.read_parquet("%s/documents.parquet" % sf,
                           columns=["doc_id", "n_chars"],
                           override_num_blocks=8)


def test_worker_death_is_transparent(ray_session, tmp_path):
    sentinel = str(tmp_path / "died_once")

    def lethal(t: pa.Table) -> pa.Table:
        # the batch holding doc_id 0 kills its worker — once
        if pc.min(t["doc_id"]).as_py() == 0 and \
                not os.path.exists(sentinel):
            with open(sentinel, "w") as fh:
                fh.write(str(os.getpid()))
            os._exit(1)  # hard process death, not an exception
        return pa.table({
            "doc_id": t["doc_id"],
            "double_chars": pc.multiply(t["n_chars"],
                                        pa.scalar(2, pa.int64()))})

    out = (_documents().map_batches(lethal, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # the crash really happened...
    assert os.path.exists(sentinel)
    # ...and the result is byte-equal to a clean run
    clean = (_documents()
             .map_batches(lambda t: pa.table(
                 {"doc_id": t["doc_id"],
                  "double_chars": pc.multiply(
                      t["n_chars"], pa.scalar(2, pa.int64()))}),
                 batch_format="pyarrow")
             .to_pandas().sort_values("doc_id")
             .reset_index(drop=True))
    assert out.equals(clean)
    # the dead worker's PID is not the one that completed the batch
    assert int(open(sentinel).read()) != os.getpid()


def test_streams_through_tiny_object_store(tmp_path):
    """Backpressure/spill: a dataset ~10× the object store must
    stream end-to-end (Ray spills / applies backpressure rather than
    OOM-ing) — the property that lets 100 TB flow through fixed
    memory. Runs in a subprocess so it owns its own small-store Ray
    session (the shared fixture keeps the normal store)."""
    import subprocess
    import sys
    import textwrap

    out = str(tmp_path / "spill_out")
    code = textwrap.dedent("""
        import numpy as np
        import pyarrow as pa
        import ray
        import ray.data as rd

        ray.init(address="local", num_cpus=4,
                 include_dashboard=False, logging_level="ERROR",
                 object_store_memory=200 * 1024 * 1024)

        def inflate(t):
            ids = t["id"].to_pylist()
            blob = [np.random.default_rng(int(i)).bytes(1 << 20)
                    for i in ids]
            return pa.table({"id": pa.array(ids, pa.int64()),
                             "blob": pa.array(blob, pa.binary())})

        # ~2 GB of 1 MiB rows through a 200 MiB store
        ds = (rd.range(2048, override_num_blocks=64)
              .map_batches(inflate, batch_size=32,
                           batch_format="pyarrow"))
        ds.write_parquet(%r)
        back = rd.read_parquet(%r)
        assert back.count() == 2048, back.count()
        print("SPILL_OK")
        ray.shutdown()
    """ % (out, out))
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=420)
    assert "SPILL_OK" in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
