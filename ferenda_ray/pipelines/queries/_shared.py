"""Shared helpers for the query registry package: pruned reads, exchange sizing,
partial-merge coalescing, the flagship-output cache, and the handful of
constants referenced across family modules."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ...functions import firstletter
from ...stages import text_analysis
from ...stages.dedup import (
    embedding_neardup_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from ...stages.similarity import knn_brute_force
from ...stages.canonicalize import connected_components_distributed
from ...stages import joins
from .. import corpus, facets
from ..kg import kg_pipeline

# ---------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------

def _read(sf_dir: str, table: str, columns=None, num_blocks: int | None = None):
    """Pruned parquet read with explicit block fan-out.

    Ray's implicit path for a small single file is one read task
    feeding SplitBlocks(2×CPUs), which dribbles blocks out of a lone
    task (measured: 2-4 s for a 20 MB read that takes 0.35 s via
    pyarrow; 8 explicit read tasks do it in 0.4 s). Per-block fixed
    cost is ~10-15 ms, so fan-out follows input size — ~1 MB/block,
    clamped to [8, 64] — instead of CPU count. CPU-heavy consumers
    (shingling, per-doc token loops) pass ``num_blocks`` to buy more
    parallelism explicitly; at 100 TB the file count dominates and the
    override is a no-op relative to Ray's own file-based planning."""
    import os

    import ray.data as rd

    from ...stages.transform import strip_schema_metadata

    path = "%s/%s.parquet" % (sf_dir.rstrip("/"), table)
    if num_blocks is None:
        try:
            num_blocks = min(64, max(8, os.path.getsize(path) >> 20))
        except OSError:
            num_blocks = 8
    return strip_schema_metadata(
        rd.read_parquet(path, columns=columns,
                        override_num_blocks=num_blocks))


def _exchange_buckets(sf_dir: str, table: str = "documents") -> int:
    """Adaptive exchange width for bucketed-shuffle operators driven by
    one input table — the same judgment as ``_read``'s fan-out and
    ``graph._adapt_buckets``: bucket count is a pure work-partitioning
    knob (every bucketed op unions over groups, so ANY value yields
    identical rows), and each groupby exchange pays ~10-15 ms of fixed
    scheduling cost per output partition. Sizing by input bytes keeps
    small inputs at 8 partitions (measured: doc_decontaminate's two
    64-wide exchanges spent ~4 s of wall on a 0.6 MB table) while
    web-scale inputs ride the 64 cap — at 100 TB callers pass an
    explicit width instead."""
    import os

    path = "%s/%s.parquet" % (sf_dir.rstrip("/"), table)
    try:
        return min(64, max(8, os.path.getsize(path) >> 20))
    except OSError:
        return 64


def _merge_partials(partials_ds, merge_fn):
    """Final merge for BOUNDED-cardinality partial aggregates.

    Partial rows number O(input_blocks × distinct_keys). When the key
    space is small (Q1's 6 flag×status cells, 25 nations, a few
    thousand time windows), a key-partitioned sort exchange costs far
    more in scheduling than the merge computes: measured on q1_pricing
    at 32 CPUs, the 64-partition sort of 384 six-row partial blocks
    spends ~5 s wall for <1 ms of aggregate work. Coalescing the
    partials into ONE block and merging vectorized removes the sort
    entirely; the single merge block holds blocks×keys rows, which for
    these key spaces stays KBs even at 100 TB inputs. Unbounded key
    spaces (per-user, per-domain, per-fingerprint) must keep the
    hash-bucketed groupby pattern instead."""
    return partials_ds.repartition(1).map_batches(
        merge_fn, batch_format="pandas", batch_size=None)


_KG_CACHE: dict[str, dict] = {}


def _kg(sf_dir: str) -> dict:
    """Run the flagship pipeline once per sf_dir; cache materialized
    outputs for the other kg_* queries in the same harness run."""
    if sf_dir not in _KG_CACHE:
        res = kg_pipeline(sf_dir=sf_dir)
        res["triples"] = res["triples"].materialize()
        res["sections"] = res["sections"].materialize()
        # mentions feed kg_mentions (and are small next to pages) —
        # without this every access re-runs the actor-pool linker
        res["mentions"] = res["mentions"].materialize()
        _KG_CACHE[sf_dir] = res
    return _KG_CACHE[sf_dir]


def _tag_bucket(p: pd.DataFrame, buckets: int, side: int,
                cols: list, key: str = "okey") -> pd.DataFrame:
    """Shared prep for the tagged two-sided fact exchange (the
    q3/q5 family): key-hash bucket + side tag + fixed projection so
    both sides union into one uniform block schema."""
    h = pd.util.hash_pandas_object(p[key], index=False).values
    p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
    p["_side"] = np.int8(side)
    return p[cols]


# ---------------------------------------------------------------------
# near-dup sketches — SQL-oracled where brute force / planted clones
# make the expected output exactly recomputable
# ---------------------------------------------------------------------

CLONE_OFFSET = 10_000_000
RADIX_SHIFT = 12  # pass-1 buckets = cents >> 12 (bounded, ≤ 2^14 here)


EVENT_TYPE_BITS = {"click": 1, "error": 2, "purchase": 4,
                   "signup": 8, "view": 16}
