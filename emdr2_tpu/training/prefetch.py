"""Host-side input prefetching for the e2e train loop.

The host work per step — retrieval id lookup + token postprocess
(``data/postprocess.py``, the reference's ``emdr2_model.py:250-376``) — runs
synchronously between device steps in the plain loop. ``BatchPrefetcher``
builds the next ``depth`` device batches on a background thread while the
current step runs on device.

Semantics note: the prefetched batch's top-K *selection* uses query-encoder
weights up to ``depth`` steps stale (the scores in the grad step are always
fresh — they're recomputed inside the jitted step). Given the index itself
is ``index_reload_interval`` (500) steps stale by design, this is a strictly
smaller approximation; it is still opt-in (``engine.train(prefetch_depth=N)``).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


class BatchPrefetcher:
    _DONE = object()

    def __init__(self, task, batches: Iterator, depth: int = 2):
        self.task = task
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(batches,), daemon=True)
        self._thread.start()

    def _worker(self, batches) -> None:
        try:
            for batch in batches:
                self._q.put(self.task.build_device_batch(batch))
            self._q.put(self._DONE)
        except BaseException as e:
            self.error = e
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self.error is not None:
                raise RuntimeError("prefetch worker failed") from self.error
            raise StopIteration
        return item


class MainDispatchPrefetcher:
    """Multi-controller-safe prefetch (VERDICT r3 item 3).

    ``BatchPrefetcher``'s worker thread dispatches jitted collectives (query
    embed + index search) concurrently with the main thread's train step; on
    a multi-host pod two controllers can enqueue those two programs in
    opposite orders -> cross-host collective deadlock. Here ALL device
    dispatch happens on the caller's (main) thread: ``__next__`` first
    enqueues stage A for upcoming batches via ``task.dispatch_retrieve``
    (deterministically ordered against the step dispatches, since one thread
    issues both), then hands the un-synced handles to a worker that only
    BLOCKS on results and runs the host postprocess — blocking on a device
    value is not an enqueue, so the worker is collective-free.

    Staleness semantics match ``BatchPrefetcher``: selection uses the
    query-tower snapshot up to ``depth+1`` steps stale; in-step scores are
    always recomputed from live params."""

    _DONE = object()

    def __init__(self, task, batches: Iterator, depth: int = 1):
        self.task = task
        self._batches = batches
        self._exhausted = False
        self._in_flight = 0
        self.depth = depth
        self._work: "queue.Queue" = queue.Queue()
        self._out: "queue.Queue" = queue.Queue()
        self.error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _dispatch_upto(self, target: int) -> None:
        while self._in_flight < target and not self._exhausted:
            try:
                batch = next(self._batches)
            except StopIteration:
                self._exhausted = True
                self._work.put(self._DONE)   # exactly once, at transition
                return
            handles = self.task.dispatch_retrieve(batch.query_bert_ids)
            self._work.put((batch, handles))
            self._in_flight += 1

    def _worker(self) -> None:
        while True:
            item = self._work.get()
            if item is self._DONE:
                self._out.put(self._DONE)
                return
            batch, handles = item
            try:
                self._out.put(self.task.build_device_batch(
                    batch, retrieved=handles))
            except BaseException as e:   # surface on the consumer thread
                self.error = e
                self._out.put(self._DONE)
                return

    def __iter__(self):
        return self

    def __next__(self):
        # keep up to depth+1 batches in flight (this enqueues stage A for
        # the NEXT batches right after the caller's last step dispatch)
        self._dispatch_upto(self.depth + 1)
        item = self._out.get()
        if item is self._DONE:
            if self.error is not None:
                raise RuntimeError("prefetch worker failed") from self.error
            self._out.put(self._DONE)    # keep raising on repeated next()
            raise StopIteration
        self._in_flight -= 1
        return item
