"""Multimodal decode queries (image/audio/video features) over synthesized
binary payloads — real stdlib decode paths, driver-checked against SQL."""

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
from ._shared import _merge_partials, _read


# ---------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------

# --- multimodal: REAL decode paths driver-checked against SQL ---------
# No media table exists in testdata, so payloads are synthesized as a
# PURE doc_id-arithmetic function (the corpus convention), decoded by
# the zero-dependency parsers in stages/multimodal under strict=True
# (any parse failure raises — no silent fake fallback), and the
# recovered features compared to the same arithmetic in SQL. The
# perceptual hashes are exercised (decode must fully parse pixels) but
# asserted in unit tests — bit-level ahash is not SQL-expressible.

def _media_pool() -> tuple:
    """Autoscaling actor-pool bounds for the decode stages, capped at
    ncpu-2 like the linker pool (kg.py): a pool holding EVERY cpu
    starves the downstream task stage — deadlock at small test
    clusters, throughput cap at big ones."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return (2, max(2, ncpu - 2))


def _media_table(ids, media_type: str, payloads) -> pa.Table:
    from ...stages.multimodal import MEDIA_SCHEMA

    return pa.table({
        "media_id": pa.array([int(i) for i in ids], pa.int64()),
        "url": pa.array(["%s://%d" % (media_type, i) for i in ids],
                        pa.string()),
        "media_type": pa.array([media_type] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_json": pa.array(["{}"] * len(ids), pa.string()),
    }, schema=MEDIA_SCHEMA)


def media_image_features(sf_dir):
    """P6 PPM payloads (w=8+id%5, h=8+id%3, deterministic pixels) →
    DecodeImage actor pool (small batches, pyarrow end to end) →
    recovered dimensions vs the synthesis arithmetic in SQL."""
    from ...stages.multimodal import DecodeImage, decode_stage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            w, h = 8 + i % 5, 8 + i % 3
            px = ((np.arange(w * h * 3) * 31 + i) % 256).astype(np.uint8)
            payloads.append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
        return _media_table(ids, "image", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))
    decoded = decode_stage(media, DecodeImage, concurrency=_media_pool(),
                           batch_size=256, strict=True)
    return decoded.map_batches(
        lambda t: t.select(["media_id", "width", "height", "decoded"]),
        batch_format="pyarrow")


MEDIA_IMAGE_SQL = """
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 5 AS INTEGER) AS width,
       CAST(8 + doc_id % 3 AS INTEGER) AS height,
       TRUE AS decoded
FROM documents
"""


MEDIA_DUP_PATTERNS = 25


def media_phash_dupes(sf_dir):
    """Image dedup by PERCEPTUAL hash over really-decoded pixels — the
    multimodal counterpart of exact text dedup: payloads are planted
    as doc_id %% 25 pattern clones, decoded by the DecodeImage actor
    pool (strict=True: the zero-dependency P6 decoder, no fakes),
    average-hashed, and grouped by the hash; each duplicate group
    keeps its min media_id. The oracle derives the groups purely from
    the planting arithmetic, so the pipeline matches ONLY if the real
    decode → downsample → average-hash round-trip is deterministic
    and collision-free across the 25 planted patterns. Group counts
    are bounded (≤ 25 phash keys), merged in one block."""
    from ...stages.multimodal import DecodeImage, decode_stage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            p = i % MEDIA_DUP_PATTERNS
            w, h = 8 + p % 5, 8 + p % 3
            # per-pattern stride (spatial frequency) + phase keeps the
            # 25 thresholded 8×8 structures phash-distinct
            px = ((np.arange(w * h * 3) * (17 + 13 * p) + p)
                  % 256).astype(np.uint8)
            payloads.append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
        return _media_table(ids, "image", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))
    decoded = decode_stage(media, DecodeImage, concurrency=_media_pool(),
                           batch_size=256, strict=True)

    def part(t: pa.Table) -> pd.DataFrame:
        df = t.select(["media_id", "phash"]).to_pandas()
        g = df.groupby("phash", as_index=False).agg(
            rep_media_id=("media_id", "min"),
            n_copies=("media_id", "size"))
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("phash", as_index=False).agg(
            rep_media_id=("rep_media_id", "min"),
            n_copies=("n_copies", "sum"))
        out = g[["rep_media_id", "n_copies"]].copy()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        decoded.map_batches(part, batch_format="pyarrow"), merge)


MEDIA_PHASH_SQL = """
SELECT min(doc_id) AS rep_media_id, count(*) AS n_copies
FROM documents GROUP BY doc_id %% 25
""".replace("%%", "%")


def media_audio_features(sf_dir):
    """PCM WAV payloads (16 kHz mono int16, n=1600+(id%7)*160 frames)
    → ExtractAudioFeatures actor pool → recovered frame counts vs the
    synthesis arithmetic in SQL."""
    import io
    import wave

    from ...stages.multimodal import ExtractAudioFeatures, decode_stage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            n = 1600 + (i % 7) * 160
            samples = ((np.arange(n) * (3 + i % 11)) % 65536 - 32768) \
                .astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(samples.tobytes())
            payloads.append(buf.getvalue())
        return _media_table(ids, "audio", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))
    decoded = decode_stage(media, ExtractAudioFeatures,
                           concurrency=_media_pool(),
                           batch_size=256, strict=True)
    return decoded.map_batches(
        lambda t: t.select(["media_id", "n_samples", "decoded"]),
        batch_format="pyarrow")


MEDIA_AUDIO_SQL = """
SELECT doc_id AS media_id,
       CAST(1600 + (doc_id % 7) * 160 AS BIGINT) AS n_samples,
       TRUE AS decoded
FROM documents
"""


def media_video_frames(sf_dir):
    """Concatenated-PPM video streams (1+id%4 frames of 8×8) →
    SampleVideoFrames actor pool sampling every 2nd frame → sampled
    frame indices vs generate_series arithmetic in SQL (flat-map
    output: one row per sampled frame)."""
    from ...stages.multimodal import SampleVideoFrames, decode_stage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            frames = []
            for f in range(1 + i % 4):
                px = ((np.arange(8 * 8 * 3) * 7 + i + f) % 256) \
                    .astype(np.uint8)
                frames.append(b"P6\n8 8\n255\n" + px.tobytes())
            payloads.append(b"".join(frames))
        return _media_table(ids, "video", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))
    decoded = decode_stage(media, SampleVideoFrames,
                           concurrency=_media_pool(),
                           batch_size=128, every_n=2, strict=True)
    return decoded.map_batches(
        lambda t: t.select(["media_id", "frame_idx"]),
        batch_format="pyarrow")


MEDIA_VIDEO_SQL = """
SELECT doc_id AS media_id,
       CAST(unnest(generate_series(0, doc_id % 4, 2)) AS INTEGER)
           AS frame_idx
FROM documents
"""


LUM_BINS = 16


def media_image_histogram(sf_dir):
    """Global luminance histogram over the decoded image corpus —
    the exposure/contrast census an ingest pipeline runs before
    training-time augmentation decisions: every payload decodes
    through the REAL PPM pixel path (``parse_pnm_pixels``), per-pixel
    integer luminance (r+g+b)//3 buckets into 16 bins (lum//16), and
    the bounded 16-cell census (bin → n_pixels, share_permille) is a
    lossless per-batch combiner. The synthetic pixels are pure
    doc_id arithmetic, so SQL replays every pixel's bin.

    Stateless decode (no model/codec state) → task pool by design;
    the stateful-decoder convention (DecodeImage actors) applies to
    codec-library paths, not the stdlib parser."""
    from ...stages.multimodal import parse_pnm_pixels

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            w, h = 8 + i % 5, 8 + i % 3
            px = ((np.arange(w * h * 3) * 31 + i) % 256).astype(np.uint8)
            payloads.append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
        return _media_table(ids, "image", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))

    def hist(t: pa.Table) -> pd.DataFrame:
        counts = np.zeros(LUM_BINS, dtype=np.int64)
        for payload in t["payload"].to_pylist():
            out = parse_pnm_pixels(payload)
            if out is None:
                raise NotImplementedError("payload is not PPM")
            px, _ = out
            lum = px.astype(np.int64).sum(axis=2) // px.shape[2]
            counts += np.bincount((lum // LUM_BINS).ravel(),
                                  minlength=LUM_BINS)[:LUM_BINS]
        return pd.DataFrame({"bin": np.arange(LUM_BINS, dtype=np.int64),
                             "n_pixels": counts})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("bin", as_index=False)["n_pixels"].sum()
             .sort_values("bin").reset_index(drop=True))
        g = g[g["n_pixels"] > 0].reset_index(drop=True)  # SQL GROUP
        total = int(g["n_pixels"].sum())
        g["share_permille"] = 1000 * g["n_pixels"] // max(total, 1)
        return g.astype("int64")

    return _merge_partials(
        media.map_batches(hist, batch_format="pyarrow"), final)


MEDIA_HIST_SQL = """
WITH px AS (
  SELECT d.doc_id,
         unnest(generate_series(0,
           (8 + d.doc_id %% 5) * (8 + d.doc_id %% 3) - 1)) AS k
  FROM documents d),
lum AS (
  SELECT ((31 * (3 * k) + doc_id) %% 256
          + (31 * (3 * k + 1) + doc_id) %% 256
          + (31 * (3 * k + 2) + doc_id) %% 256) // 3 AS l
  FROM px),
h AS (SELECT l // %d AS bin, CAST(count(*) AS BIGINT) AS n_pixels
      FROM lum GROUP BY 1),
t AS (SELECT CAST(sum(n_pixels) AS BIGINT) AS total FROM h)
SELECT CAST(h.bin AS BIGINT) AS bin, h.n_pixels,
       CAST(1000 * h.n_pixels // greatest(t.total, 1) AS BIGINT)
         AS share_permille
FROM h, t ORDER BY h.bin
""" % LUM_BINS
