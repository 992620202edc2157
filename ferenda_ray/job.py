"""Cluster job entry point — the ``ray job submit`` surface the
north rule names:

    ray job submit --working-dir . -- \\
        python -m ferenda_ray.job --sf-dir /data/sf1 --out /out/kg

Runs the flagship KG pipeline over the Parquet page corpus and
materializes resumable outputs:

- ``<out>/triples/bucket=N/`` — hash(subj)-partitioned triple parquet
  (a re-run rewrites only missing buckets);
- with ``--checkpoint-dir``, every stage boundary checkpoints through
  ``state/manifest`` (per-partition lineage + counters; a killed job
  resumes mid-pipeline and skips completed stages);
- one JSON line of counters on stdout.

This module is a CLI ENTRY POINT and therefore owns the Ray session
(the driver contract in ``__ray_entry__`` never does): inside a
``ray job`` the guarded init attaches to the running cluster; run
standalone it starts a local one.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m ferenda_ray.job")
    p.add_argument("--sf-dir", required=True,
                   help="directory with the input parquet tables")
    p.add_argument("--out", required=True,
                   help="output directory (partitioned triples)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="enable stage checkpoints + lineage manifest")
    p.add_argument("--streaming", action="store_true",
                   help="fused single-execution path (throughput mode; "
                        "no intermediate datasets)")
    p.add_argument("--num-buckets", type=int, default=16,
                   help="triple sink hash(subj) partitions")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(ignore_reinit_error=True)

    from .pipelines import corpus
    from .pipelines.kg import (kg_pipeline, kg_pipeline_resumable,
                               kg_triples_streaming)
    from .sources.nt import write_triples_partitioned

    t0 = time.time()
    pages = corpus.pages_dataset(args.sf_dir)
    slim = corpus.pages_slim_dataset(args.sf_dir)

    if args.checkpoint_dir:
        res = kg_pipeline_resumable(args.sf_dir, args.checkpoint_dir,
                                    pages=pages, pages_slim=slim)
        triples = res["triples"]
    elif args.streaming:
        triples = kg_triples_streaming(pages, pages_slim=slim)
    else:
        triples = kg_pipeline(pages=pages, pages_slim=slim)["triples"]

    write_triples_partitioned(triples, args.out + "/triples",
                              num_buckets=args.num_buckets)

    import ray.data as rd

    n = rd.read_parquet(args.out + "/triples").count()
    counters = {
        "metric": "kg_job",
        "triples": int(n),
        "elapsed_s": round(time.time() - t0, 2),
        "out": args.out,
        "checkpointed": bool(args.checkpoint_dir),
    }
    if args.checkpoint_dir:
        from .state.manifest import manifest_stats

        stats = manifest_stats(args.checkpoint_dir)
        counters["stages"] = {
            r["stage"]: int(r["rows_out"])
            for r in stats.to_dict("records")
        }
    print(json.dumps(counters))
    if owns_session:  # never tear down a caller's session
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
