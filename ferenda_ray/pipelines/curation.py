"""End-to-end training-data curation DAG: the pipeline a user of this
engine runs over a raw 100-TB text drop before training.

    read -> PII-redact -> quality gate -> exact dedup ->
    MinHash near-dup removal -> deterministic split -> partitioned out

Every stage is one of the individually-oracled operators (stages/pii,
stages/text_analysis, stages/dedup, stages/joins, stages/transform)
composed as a single lazy Dataset graph:

* redact + gate fuse with the read (stateless Arrow maps, no shuffle);
* exact dedup is the md5 hash-bucket exchange (never one Ray group per
  distinct text);
* near-dup removal reuses minhash_dedup (banding -> bucketed LSH ->
  hash-partitioned exact-Jaccard verify -> union-find below the driver
  threshold, distributed hash-to-min CC above it) and drops every
  cluster member except the min-key representative via the
  Bloom-capable anti join (stages/joins.membership_join);
* the split is a pure md5 function of the key — resumable and
  shard-order independent.

The whole composition is SQL-recomputable (the curation_pipeline query
oracle chains the per-stage oracles: redaction regexp chain -> C4
gate -> min-per-text -> recursive trigram-Jaccard closure -> split
CASE), so the END-TO-END output, not just each stage, is
correctness-gated.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def curate(docs_ds, threshold: float = 0.5, min_tokens: int = 5,
           min_mean_token_len: float = 2.0,
           max_mean_token_len: float = 12.0,
           out_dir: str | None = None,
           driver_threshold: int | None = None):
    """documents(doc_id, text, ...) -> Dataset/DataFrame of
    (doc_id, split) for every surviving document. With ``out_dir``,
    also writes one parquet directory per split (resumable: a rerun
    overwrites per-split dirs independently)."""
    import ray.data as rd

    from ..stages.dedup import exact_dedup, minhash_dedup
    from ..stages.joins import membership_join
    from ..stages.pii import pii_scan
    from ..stages.text_analysis import quality_filter, quality_metrics
    from ..stages.transform import hash_split

    def redact(t: pa.Table) -> pa.Table:
        df = pii_scan(t, redact=True)
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "text": pa.array(df["clean"], pa.string())})

    def gate(t: pa.Table) -> pa.Table:
        t = quality_metrics(t)
        t = quality_filter(t, min_tokens=min_tokens,
                           min_mean_token_len=min_mean_token_len,
                           max_mean_token_len=max_mean_token_len)
        return t.select(["doc_id", "text"])

    q = (docs_ds.map_batches(redact, batch_format="pyarrow")
         .map_batches(gate, batch_format="pyarrow"))

    # ex is consumed THREE times (minhash bands, jaccard verify, the
    # survivor anti-join); materialize executes the redact→gate→dedup
    # chain once instead of per consumer (measured 7.7→4.9 s at
    # sf0.1/32cpu). At 100 TB swap this for a parquet checkpoint via
    # state/manifest.checkpointed_stage — same single-execution
    # semantics, plus resume.
    ex = exact_dedup(q, text_col="text", key_col="doc_id").materialize()

    labels = minhash_dedup(ex, text_col="text", key_col="doc_id",
                           threshold=threshold,
                           driver_threshold=driver_threshold)
    if isinstance(labels, pd.DataFrame):
        rem = labels.loc[labels["key"] != labels["canonical_key"],
                         ["key"]]
        rem_ds = rd.from_pandas(rem) if len(rem) else None
    else:
        rem_ds = labels.map_batches(
            lambda df: df.loc[df["key"] != df["canonical_key"], ["key"]],
            batch_format="pandas")

    # only the key survives past near-dup removal — never ship text
    # through the anti-join exchange
    ids = ex.select_columns(["doc_id"])
    kept = ids if rem_ds is None else membership_join(
        ids, "doc_id", rem_ds, "key", mode="anti")

    out = hash_split(kept, key_col="doc_id").map_batches(
        lambda df: df[["doc_id", "split"]], batch_format="pandas")

    if out_dir:
        import os
        import shutil

        import pyarrow.compute as pc

        out = out.materialize()
        base = out_dir.rstrip("/")
        for split in ("train", "val", "test"):
            part = out.map_batches(
                lambda t, s=split: t.filter(pc.equal(t["split"], s)),
                batch_format="pyarrow")
            # Ray's write_parquet only ever appends files; tmp-dir +
            # swap makes a rerun overwrite the split atomically (the
            # same pattern state/manifest.py uses for checkpoints).
            tmp = "%s/.tmp.split=%s" % (base, split)
            final = "%s/split=%s" % (base, split)
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp, exist_ok=True)  # 0-row split still swaps
            part.write_parquet(tmp)
            shutil.rmtree(final, ignore_errors=True)
            os.replace(tmp, final)
    return out
