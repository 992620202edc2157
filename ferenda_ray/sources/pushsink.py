"""External-index push sink — the actor-held-client bulk-push stage.

Mirrors the data-engine semantics of the reference's ElasticSearch
backend (ferenda/fulltextindex.py:685-1178: ``ElasticSearchIndex``):
documents stream to a remote store as BULK requests of keyed UPSERT
actions (``_update_payload`` builds one ``{"index": {"_id": relurl}}``
action per document; ``commit`` PUTs the buffered bulk body, raises
``IndexingError`` on HTTP errors AND on the response-level
``errors: true`` flag even under HTTP 200). Ray-native re-expression:

- the CLIENT lives in the map actor's ``__init__`` (once per actor,
  the stateful-stage contract) — never per batch;
- each batch becomes one idempotent bulk request: every action is
  keyed by the document id, so the store semantics are upsert and a
  replayed batch converges to the same state (exactly the property
  that makes kill/resume safe — the LSM discipline of
  ``ftindex.merge_index_delta``);
- response-level errors retry with exponential backoff; exhausted
  retries raise :class:`IndexingError` (failing the task so Ray's
  task retry / the caller's resume takes over);
- the sink RETURNS a manifest Dataset — one row per pushed batch
  (batch_id, n_docs, n_pushed, attempts, status, doc_ids) — the
  audit/resume artifact; a resumed run passes the previous
  manifest's acked DOCUMENT ids (``acked_ids``) to skip
  already-durable docs without re-serializing them, independent of
  how Ray re-batches the input on the second run.

No network exists in this environment, so the shipped client is the
file-backed :class:`FileBulkClient` (atomic per-doc JSON files —
itself a usable local sink and the test fake); a production user
supplies ``client_factory=lambda: MyESClient(hosts)`` returning any
object with ``bulk(actions) -> {"errors": bool, "items": [...]}``.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from urllib.parse import quote

import pyarrow as pa


class IndexingError(RuntimeError):
    """Bulk push failed after retries (fulltextindex.py commit
    semantics: HTTP failure or response-level errors flag)."""


class FileBulkClient:
    """File-backed bulk client: each action upserts
    ``store_dir/<quoted id>.json`` atomically (tmp + rename), so a
    replayed bulk converges — byte-identical store — exactly like a
    keyed ES index. ``fail_first`` injects response-level errors for
    the first N bulk calls (per client instance) to exercise the
    retry path; ``fail_marker`` makes the injection durable across
    actor restarts (a file counts attempts), for kill/resume tests."""

    def __init__(self, store_dir: str, fail_first: int = 0,
                 fail_marker: str | None = None):
        self.store_dir = store_dir
        self.fail_first = fail_first
        self.fail_marker = fail_marker
        self._calls = 0
        os.makedirs(store_dir, exist_ok=True)

    def _should_fail(self) -> bool:
        if self.fail_marker is not None:
            n = 0
            if os.path.exists(self.fail_marker):
                with open(self.fail_marker) as f:
                    n = int(f.read() or 0)
            if n < self.fail_first:
                with open(self.fail_marker, "w") as f:
                    f.write(str(n + 1))
                return True
            return False
        self._calls += 1
        return self._calls <= self.fail_first

    def bulk(self, actions) -> dict:
        if self._should_fail():
            return {"errors": True,
                    "items": [{"index": {"status": 503,
                                         "error": "injected"}}]}
        for act in actions:
            path = os.path.join(self.store_dir, act["_id"] + ".json")
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(act["doc"], f, sort_keys=True)
            os.replace(tmp, path)  # atomic upsert
        return {"errors": False, "items": [{"index": {"status": 200}}
                                           for _ in actions]}


def doc_action(doc: dict, id_col: str) -> dict:
    """One keyed upsert action: the reference's ``_update_payload``
    id discipline (relurl = quote(basefile) is the ES ``_id``,
    fulltextindex.py:774-780) with the full row as payload."""
    return {"_id": quote(str(doc[id_col]), safe=""), "doc": doc}


class BulkPusher:
    """Actor-pool sink stage: client built ONCE in ``__init__`` from
    the caller's factory; ``__call__`` pushes one batch as one bulk
    request with retry/backoff and emits its manifest row."""

    def __init__(self, client_factory, id_col: str = "url",
                 max_retries: int = 3, backoff_s: float = 0.05,
                 acked=None):
        import ray

        self.client = client_factory()
        self.id_col = id_col
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        acked = ray.get(acked) if isinstance(acked, ray.ObjectRef) \
            else acked
        self.acked = frozenset(acked or ())

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.to_pylist()
        qids = [quote(str(d[self.id_col]), safe="") for d in docs]
        batch_id = hashlib.md5(
            "\n".join(sorted(qids)).encode()).hexdigest()
        # acked is keyed on DOCUMENT ids, not batch hashes, so resume
        # skips already-durable docs even when Ray produces different
        # batch boundaries on the second run (ADVICE r4)
        fresh = [(d, q) for d, q in zip(docs, qids)
                 if q not in self.acked]
        if not fresh:
            status, attempts = "skipped", 0
        else:
            actions = [doc_action(d, self.id_col) for d, _ in fresh]
            attempts = 0
            while True:
                attempts += 1
                resp = self.client.bulk(actions)
                if not resp.get("errors"):
                    break
                if attempts > self.max_retries:
                    bad = [i for i in resp.get("items", ())
                           if i.get("index", {}).get("status", 200)
                           >= 300]
                    raise IndexingError(
                        "%d errors when committing, first was %r"
                        % (len(bad), bad[0] if bad else None))
                time.sleep(self.backoff_s * (2 ** (attempts - 1)))
            status = "pushed"
        return pa.table({
            "batch_id": pa.array([batch_id], pa.string()),
            "n_docs": pa.array([len(docs)], pa.int64()),
            "n_pushed": pa.array([len(fresh)], pa.int64()),
            "attempts": pa.array([attempts], pa.int64()),
            "status": pa.array([status], pa.string()),
            "doc_ids": pa.array([qids], pa.list_(pa.string()))})


def push_bulk(ds, client_factory, id_col: str = "url",
              batch_size: int = 512, concurrency=None,
              max_retries: int = 3, backoff_s: float = 0.05,
              acked=None):
    """Push every row of ``ds`` to the external store; returns the
    manifest Dataset (batch_id, n_docs, n_pushed, attempts, status,
    doc_ids). ``acked``: an iterable (or ``ray.put`` ref) of quoted
    DOCUMENT ids already durable from a previous run's manifest
    (``acked_ids``) — those docs are skipped without re-serializing,
    independent of how Ray re-batches the input on the resumed run.
    Replays of non-skipped docs are harmless by construction (keyed
    upserts), so resume needs no coordination beyond optionally
    passing the old manifest."""
    return ds.map_batches(
        BulkPusher,
        fn_constructor_kwargs={"client_factory": client_factory,
                               "id_col": id_col,
                               "max_retries": max_retries,
                               "backoff_s": backoff_s,
                               "acked": acked},
        batch_size=batch_size,
        batch_format="pyarrow",
        # autoscaling pool: a FIXED pool equal to the CPU count can
        # reserve every core and starve upstream read tasks (deadlock
        # on small clusters) — min 1 actor always makes progress
        concurrency=concurrency or (1, 4))


def acked_ids(manifest_ds) -> frozenset:
    """Quoted doc ids a previous run durably pushed (every id in a
    manifest row with status pushed/skipped is durable: the fresh
    subset was just pushed, the rest was acked before) — feed to
    ``push_bulk(acked=...)`` on resume."""
    out = set()
    for r in manifest_ds.take_all():
        if r["status"] in ("pushed", "skipped"):
            out.update(r["doc_ids"])
    return frozenset(out)
